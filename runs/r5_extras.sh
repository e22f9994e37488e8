#!/bin/bash
# Round-5 queue, part 2 (rewritten during the 09:15+ relay outage).
# Interleaved by VERDICT done-criteria so a late relay return still
# lands every headline claim: bloom n>=3 seeds (#1), serve-at-10M
# (#1 end-to-end), ML-20M CCL/DirectAU/MAWU table (#2), ts-family
# first 3 seeds (#6), then the n=5 / control extras by deadline.
set -u
cd /root/repo

probe_gate () {
  echo "=== relay probe loop  $(date +%H:%M:%S)"
  until timeout 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; do
    echo "relay still down  $(date +%H:%M:%S)"
    sleep 120
  done
  echo "=== relay healthy  $(date +%H:%M:%S)"
}

stage () {  # name cmd...
  local name="$1"; shift
  local log="runs/$name.log"
  if [ -f "runs/.done-$name" ]; then echo "skip $name"; return; fi
  probe_gate
  echo "=== stage $name  $(date +%H:%M:%S)"
  "$@" >"$log" 2>&1
  local rc=$?
  echo "=== stage $name done rc=$rc  $(date +%H:%M:%S)"
  [ $rc -eq 0 ] && touch "runs/.done-$name"
}

TS_BASE="--model.user_tower history --model.max_history 16 \
 --model.train_loss InfomationNoiseContrastiveEstimationLoss \
 --data.data_dir data/ml1m-ts --trainer.max_epochs 4 \
 --trainer.early_stopping_patience 5"
ts_seed () {  # seed [deadline HH:MM]
  local seed="$1" name="ml1m-ts-flagship-s$1"
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  if [ $# -gt 1 ] && [ "$(date +%s)" -ge "$(date -d "today $2" +%s)" ]; then
    echo "deadline $2 reached; skipping $name"; return
  fi
  probe_gate
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 2700 python -m xfmr_rec_tpu.training.cli fit $TS_BASE \
    --trainer.run_name "$name" --trainer.seed "$seed" \
    > "runs/$name.launch.log" 2>&1
  echo "=== $name done rc=$?  $(date +%H:%M:%S)"
}
ml20m_run () {  # name flags... (respects runs/ml20m deadline via $ML20M_DEADLINE)
  local name="$1"; shift
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  if [ "$(date +%s)" -ge "$(date -d "today ${ML20M_DEADLINE:-16:55}" +%s)" ]; then
    echo "deadline reached; skipping $name"; return
  fi
  probe_gate
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 7200 python -m xfmr_rec_tpu.training.cli fit \
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

# Two passes: everything is idempotent (skip-by-metrics / .done marker),
# so pass 2 only re-runs stages that a relay wedge + watchdog kill took
# out mid-run; deadline guards keep pass 2 from launching late work.
for pass in 1 2; do
  echo "=== pass $pass  $(date +%H:%M:%S)"

  # --- #1: bloom seed family (n>=3) + serve-at-10M end-to-end
  probe_gate
  bash runs/scale10m_campaign.sh >> runs/scale10m.log 2>&1
  stage items10m_serve  timeout 3600 python runs/items10m_serve.py

  # --- #2: ML-20M loss table (CCL/DirectAU/MAWU; margins per BENCH_NOTES)
  ml20m_run ml20m-ccl      --model.train_loss AlignmentContrastiveLoss --model.margin 0.6
  ml20m_run ml20m-directau --model.train_loss DirectAULoss --model.gamma 1.0
  ml20m_run ml20m-mawu     --model.train_loss MAWULoss --model.margin 0.2 --model.gamma 1.0

  # --- #6: ts-corpus flagship family, first 3 seeds
  ts_seed 0
  ts_seed 1
  ts_seed 2

  # --- extras by deadline: n=5 seeds + the InfoNCE ml20m control
  ts_seed 3 16:30
  ts_seed 4 16:30
  ML20M_DEADLINE=16:30 ml20m_run ml20m-infonce \
    --model.train_loss InfomationNoiseContrastiveEstimationLoss
done
echo "extras done $(date +%H:%M:%S)"
