#!/bin/bash
# Round-5 queue, part 2 (chained after runs/r5_tpu_queue.sh exits).
# VERDICT priority order: finish BASELINE config 4 end-to-end with the
# 10M-item serve demo (#1), then the ML-20M loss sweep (#2), then the
# ts-corpus flagship seed family (#6) — seeds launch adaptively so the
# chip is free before the round closes (bench.py needs it).
set -u
cd /root/repo

# Relay-health gate: the axon relay went silent at ~09:15 (remote side
# stopped responding; stdin pump starved, no serve threads). Every TPU
# process hangs at first device contact until it heals — so probe with
# a bounded tiny op and only start the queue once the chip answers.
echo "=== relay probe loop  $(date +%H:%M:%S)"
until timeout 120 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; do
  echo "relay still down  $(date +%H:%M:%S)"
  sleep 120
done
echo "=== relay healthy  $(date +%H:%M:%S)"

stage () {  # name cmd...
  local name="$1"; shift
  local log="runs/$name.log"
  if [ -f "runs/.done-$name" ]; then echo "skip $name"; return; fi
  echo "=== stage $name  $(date +%H:%M:%S)"
  "$@" >"$log" 2>&1
  local rc=$?
  echo "=== stage $name done rc=$rc  $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && touch "runs/.done-$name"
}

# retry pass for any items10m run that deadlocked in part 1 (the relay
# client wedged mid-run on bloom-s1: CPU frozen, all threads in futex
# wait, socket silent — same signature as the multi-GB checkpoint
# deadlock, this time with checkpointing off); idempotent skip-by-metrics
bash runs/scale10m_campaign.sh >> runs/scale10m.log 2>&1

stage items10m_serve  timeout 3600 python runs/items10m_serve.py
stage scale20m_real   bash runs/scale20m_campaign.sh

# ts-family seeds, one at a time, no new launches after the deadline
TS_DEADLINE="${TS_DEADLINE:-16:30}"
deadline_s=$(date -d "today $TS_DEADLINE" +%s)
BASE="--model.user_tower history --model.max_history 16 \
 --model.train_loss InfomationNoiseContrastiveEstimationLoss \
 --data.data_dir data/ml1m-ts --trainer.max_epochs 4 \
 --trainer.early_stopping_patience 5"
for seed in 0 1 2 3 4; do
  name="ml1m-ts-flagship-s$seed"
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; continue; fi
  if [ "$(date +%s)" -ge "$deadline_s" ]; then
    echo "deadline $TS_DEADLINE reached; stopping before $name"; break
  fi
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 2700 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" --trainer.seed "$seed" \
    > "runs/$name.launch.log" 2>&1
  echo "=== $name done rc=$?  $(date +%H:%M:%S)"
done
echo "extras done $(date +%H:%M:%S)"
