#!/bin/bash
# Round-5 TPU queue: one chip, one process at a time, idempotent stages.
# Order = VERDICT r4 priority: quick benches (#4 shard model, #5 SLO),
# then BASELINE config 4 (10M-item hash/Bloom), quality ceiling (#6),
# BASELINE config 3 (ML-20M loss sweep).
set -u
cd /root/repo

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

stage shard_model  timeout 1200 python runs/bench_shard_model.py
stage serving_slo  timeout 1200 python runs/bench_serving_slo.py
stage scale10m     bash runs/scale10m_campaign.sh
stage ts_family    bash runs/quality_ts_family.sh
stage scale20m     bash runs/scale20m_campaign.sh
echo "queue done $(date +%H:%M:%S)"
