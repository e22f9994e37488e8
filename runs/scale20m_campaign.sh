#!/bin/bash
# BASELINE config 3: ML-20M-shape training campaign (round 5).
# Corpus: data/ml20m — synthetic, 138k users x 27k movies x 20M ratings
# (runs/make_ml20m.py). Model: 128-dim encoder (h128 L1, the "128-dim"
# axis of BASELINE configs[2]); loss sweep CCL/DirectAU/MAWU (+ InfoNCE
# control) with mixed negative sampling (cycled corpus negatives,
# num_negatives=4 mining). B=1024 with sqrt-scaled LR (reference trains
# 1e-4 at B=32). Idempotent: skips runs whose metrics.jsonl exists.
set -e
cd /root/repo
BASE="--model.hidden_size 128 --model.intermediate_size 128 \
 --model.num_attention_heads 4 \
 --model.learning_rate 5e-4 \
 --data.data_dir data/ml20m --data.batch_size 1024 \
 --trainer.max_epochs 1 --trainer.val_check_interval 0.25 \
 --trainer.max_time_s 2400 --trainer.checkpointing false \
 --trainer.early_stopping_patience 8 --trainer.log_every_steps 200"
# max_time_s 2400: a uniform 40-min budget per loss keeps the 4-loss
# sweep inside the round's chip window; the comparison is budget-matched
# across losses (quality at best val within the window). checkpointing
# off: the report reads metrics.jsonl only.

run () {  # name extra-flags...
  local name="$1"; shift
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 7200 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" --trainer.seed 0 "$@" 2>&1 | tail -3
}

# CCL (SimpleX) = alignment + margin-contrastive: the reference's
# AlignmentContrastiveLoss. Bare ContrastiveLoss is negative-only and
# degenerate as a training objective (zero loss/grad at init on this
# corpus — measured, see BENCH_NOTES r5). margin 0.6 = punish negatives
# with cos > 0.4 (SimpleX's practical margin band).
run ml20m-ccl       --model.train_loss AlignmentContrastiveLoss --model.margin 0.6
run ml20m-directau  --model.train_loss DirectAULoss --model.gamma 1.0
run ml20m-mawu      --model.train_loss MAWULoss --model.margin 0.2 --model.gamma 1.0
run ml20m-infonce   --model.train_loss InfomationNoiseContrastiveEstimationLoss
echo "campaign done $(date +%H:%M:%S)"
