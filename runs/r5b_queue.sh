#!/bin/bash
# Round-5 leg 2 (fresh checkout after the leg-1 relay outage): close the
# BASELINE-config-4 done-criteria that the outage took out —
#   1. items10m-bloom-s2 (bloom headline cell n=3)
#   2. items10m_serve end-to-end (artifact + golden checks + 10M QPS)
# Waits for runs/make_items10m.py (data regen) to finish first; one TPU
# process at a time; everything idempotent (skip-by-metrics).
set -u
cd /root/repo

# wait for the corpus regen (pid file written by the builder session)
if [ -f /tmp/make10m.pid ]; then
  while kill -0 "$(cat /tmp/make10m.pid)" 2>/dev/null; do sleep 20; done
fi
if [ ! -f data/items10m/ml-1m/users.parquet ]; then
  echo "data regen failed; abort" >&2; exit 1
fi
echo "=== data ready  $(date +%H:%M:%S)"

probe_gate () {
  until timeout 240 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; do
    echo "relay still down  $(date +%H:%M:%S)"; sleep 120
  done
}

name=items10m-bloom-s2
if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; else
  probe_gate
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 3600 python -m xfmr_rec_tpu.training.cli fit \
    --model.learning_rate 1e-3 \
    --model.max_length 24 --data.max_length 24 \
    --data.data_dir data/items10m --data.batch_size 1024 \
    --trainer.max_epochs 1 --trainer.val_check_interval 0.5 \
    --trainer.encode_batch_size 4096 \
    --trainer.checkpointing false \
    --trainer.log_every_steps 500 \
    --trainer.run_name "$name" --trainer.seed 2 \
    --model.item_id_embedding bloom --model.item_id_buckets 262144 \
    2>&1 | tail -3
  echo "=== $name done  $(date +%H:%M:%S)"
fi

probe_gate
echo "=== items10m_serve  $(date +%H:%M:%S)"
timeout 3600 python runs/items10m_serve.py > runs/items10m_serve.log 2>&1
echo "=== items10m_serve done rc=$?  $(date +%H:%M:%S)"
echo "queue done $(date +%H:%M:%S)"
