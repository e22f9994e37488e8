#!/bin/bash
# Round-4 headline family: the flagship (history tower H=16, InfoNCE,
# reference defaults, 4 epochs) at n=5 seeds WITH checkpoints, so the
# non-learned CF channel (models/cf.py) can be composed and calibrated
# post-hoc (the channel affects retrieval scoring only, never the
# training loss — one training run per seed serves every weight choice).
set -e
cd /root/repo
BASE="--model.user_tower history --model.max_history 16 \
 --model.train_loss InfomationNoiseContrastiveEstimationLoss \
 --data.data_dir data/ml1m --trainer.max_epochs 4 \
 --trainer.early_stopping_patience 5"
for seed in 0 1 2 3 4; do
  name="ml1m-r4-flagship-s$seed"
  if [ -f "runs/$name/metrics.jsonl" ]; then echo "skip $name"; continue; fi
  echo "=== $name"
  timeout 2700 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" --trainer.seed "$seed" 2>&1 | tail -2
done
