#!/bin/bash
# Round-5 leg 3 extras queue: the VERDICT items the leg-1 relay outage
# took out, in priority order — ML-20M loss table (#2: CCL/DirectAU/
# MAWU + InfoNCE control, budget-matched 40 min each) then the ts-corpus
# flagship family (#6a, seeds 0..4). Rewrite of runs/r5_extras.sh
# without its leg-1 same-day deadline guards (stale: they would skip
# every stage after 16:55 local).
#
# Chained: waits for the r5b queue (bloom-s2 + items10m_serve) pid, then
# for the corpora regen pid. One TPU process at a time; idempotent
# (skip-by-metrics); relay-probe-gated per stage so a dead-relay window
# costs minutes, not per-run timeouts.
set -u
cd /root/repo

for pidfile in /tmp/r5c_queue.pid /tmp/regen_extras.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat "$pidfile")" 2>/dev/null; do sleep 30; done
  fi
done

probe_gate () {
  until timeout 240 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; do
    echo "relay still down  $(date +%H:%M:%S)"; sleep 120
  done
}

ml20m_run () {  # name extra-flags...
  local name="$1"; shift
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  [ -f data/ml20m/ml-1m/users.parquet ] || { echo "no ml20m data; skip $name"; return; }
  probe_gate
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 4500 python -m xfmr_rec_tpu.training.cli fit \
    --model.hidden_size 128 --model.intermediate_size 128 \
    --model.num_attention_heads 4 --model.learning_rate 5e-4 \
    --data.data_dir data/ml20m --data.batch_size 1024 \
    --trainer.max_epochs 1 --trainer.val_check_interval 0.25 \
    --trainer.max_time_s 2400 --trainer.checkpointing false \
    --trainer.early_stopping_patience 8 --trainer.log_every_steps 200 \
    --trainer.run_name "$name" --trainer.seed 0 "$@" \
    > "runs/$name.launch.log" 2>&1
  echo "=== $name done rc=$?  $(date +%H:%M:%S)"
}

ts_seed () {  # seed
  local seed="$1" name="ml1m-ts-flagship-s$1"
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  [ -f data/ml1m-ts/ml-1m/users.parquet ] || { echo "no ml1m-ts data; skip $name"; return; }
  probe_gate
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 2700 python -m xfmr_rec_tpu.training.cli fit \
    --model.user_tower history --model.max_history 16 \
    --model.train_loss InfomationNoiseContrastiveEstimationLoss \
    --data.data_dir data/ml1m-ts --trainer.max_epochs 4 \
    --trainer.early_stopping_patience 5 \
    --trainer.run_name "$name" --trainer.seed "$seed" \
    > "runs/$name.launch.log" 2>&1
  echo "=== $name done rc=$?  $(date +%H:%M:%S)"
}

# Two passes: pass 2 only re-runs stages a relay wedge killed mid-run.
for pass in 1 2; do
  echo "=== pass $pass  $(date +%H:%M:%S)"
  ml20m_run ml20m-ccl      --model.train_loss AlignmentContrastiveLoss --model.margin 0.6
  ml20m_run ml20m-directau --model.train_loss DirectAULoss --model.gamma 1.0
  ml20m_run ml20m-mawu     --model.train_loss MAWULoss --model.margin 0.2 --model.gamma 1.0
  ts_seed 0
  ts_seed 1
  ts_seed 2
  ml20m_run ml20m-infonce  --model.train_loss InfomationNoiseContrastiveEstimationLoss
  ts_seed 3
  ts_seed 4
done
echo "r5c extras done $(date +%H:%M:%S)"
