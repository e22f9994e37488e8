#!/bin/bash
# Round-4 quality family: item identity channels on the flagship
# (InfoNCE, history tower H=16, reference defaults, 4 epochs).
set -e
cd /root/repo
BASE="--model.user_tower history --model.max_history 16 \
 --model.train_loss InfomationNoiseContrastiveEstimationLoss \
 --data.data_dir data/ml1m --trainer.max_epochs 4 \
 --trainer.early_stopping_patience 5"
run() {
  name=$1; shift
  if [ -f "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  echo "=== $name"
  timeout 2400 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" "$@" 2>&1 | tail -2
}
run ml1m-r4-id-bag-bias-s0 \
  --model.item_id_embedding bloom --model.item_id_buckets 8192 \
  --model.item_bias true --model.max_bag 256
run ml1m-r4-id-bag-s0 \
  --model.item_id_embedding bloom --model.item_id_buckets 8192 \
  --model.max_bag 256
run ml1m-r4-id-bias-s0 \
  --model.item_id_embedding bloom --model.item_id_buckets 8192 \
  --model.item_bias true
run ml1m-r4-dense-bag-bias-s0 \
  --model.item_id_embedding dense --model.item_id_buckets 4096 \
  --model.item_bias true --model.max_bag 256
