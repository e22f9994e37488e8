#!/bin/bash
# BASELINE config 4: hash/Bloom compressed ID tables over the 10M-item
# corpus (data/items10m, runs/make_items10m.py), end-to-end.
#
# Three ID-table variants on the SAME corpus/seed: dense (full 10M-row
# table, 1.28 GB params + 2.56 GB adam moments), hash (2^18 buckets,
# 32 MB), bloom (2^18 buckets x 2 hashes, 32 MB) — plus n=3 seeds for
# the bloom headline cell (VERDICT r4 #1). h32 text encoder, 1 epoch,
# B=1024; quality at 2 ratings/item is expected to be tiny in absolute
# terms — the claim under test is memory/throughput/quality RETENTION
# of compressed tables vs the full table at a vocab where compression
# matters. runs/report_items10m.py turns the runs into the table.
set -e
cd /root/repo
BASE="--model.learning_rate 1e-3 \
 --model.max_length 24 --data.max_length 24 \
 --data.data_dir data/items10m --data.batch_size 1024 \
 --trainer.max_epochs 1 --trainer.val_check_interval 0.5 \
 --trainer.encode_batch_size 4096 \
 --trainer.checkpointing false \
 --trainer.log_every_steps 500"
# checkpointing off: the report reads metrics.jsonl only, and saving the
# dense 10M-row table + Adam moments (~7 GB state) through the relay
# costs ~8 min per save and deadlocked on the 2nd back-to-back save.

run () {
  local name="$1"; shift
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; return; fi
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 7200 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" "$@" 2>&1 | tail -3
}

run items10m-dense-s0 --trainer.seed 0 \
  --model.item_id_embedding dense --model.item_id_buckets 10000001
run items10m-hash-s0 --trainer.seed 0 \
  --model.item_id_embedding hash --model.item_id_buckets 262144
run items10m-bloom-s0 --trainer.seed 0 \
  --model.item_id_embedding bloom --model.item_id_buckets 262144
run items10m-bloom-s1 --trainer.seed 1 \
  --model.item_id_embedding bloom --model.item_id_buckets 262144
run items10m-bloom-s2 --trainer.seed 2 \
  --model.item_id_embedding bloom --model.item_id_buckets 262144
echo "campaign done $(date +%H:%M:%S)"
