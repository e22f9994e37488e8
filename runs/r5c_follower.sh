#!/bin/bash
# Round-5 leg 3 milestone follower: polls the chained TPU queues and
# self-lands each result into BENCH_NOTES.md + git as it completes, so
# the ledger stays current even if the builder session ends mid-queue.
# One-shot per milestone (runs/.landed-* markers). CPU-heavy landing
# (ts-family cf-report) runs at nice 19 to stay out of the TPU runs'
# host path. Bounded: exits after ~12 h.
set -u
cd /root/repo

landed () { [ -f "runs/.landed-$1" ]; }
mark () { touch "runs/.landed-$1"; }

land_serve () {
  grep -q guaranteed_qps_10m runs/items10m-serve/metrics.jsonl 2>/dev/null || return
  PALLAS_AXON_POOL_IPS= python - << 'EOF'
import json, pathlib
m = json.loads(pathlib.Path("runs/items10m-serve/metrics.jsonl").read_text().splitlines()[-1])
proj = 30.7e3
sec = f"""
## Serve-at-10M end-to-end (BASELINE config 4 closer, leg 3)

runs/items10m_serve.py: short bloom-table train ({1500} steps), full
artifact package (all 10M item embeddings), RecommenderEngine +
RecService over it, golden endpoint checks, then measured load.

| metric | value |
|---|---|
| artifact size | {m['artifact_mb']:.0f} MB |
| train (1500 steps) | {m.get('train_s', float('nan')):.0f} s |
| 10M-item corpus embed + write | {m.get('save_embed_s', float('nan')):.0f} s |
| engine load | {m['engine_load_s']:.1f} s |
| golden endpoint checks | {'pass' if m.get('golden_checks') else 'FAIL'} |
| recommend_with_user_id p50 (relay-inclusive, n=20) | {m['recommend_p50_ms']:.0f} ms |
| guaranteed-exact QPS, 10M x k=100, B=4096 | {m['guaranteed_qps_10m']:.0f} |
| same, int8 corpus | {m['guaranteed_qps_10m_int8']:.0f} |

The shard-model projection for one chip at 10M x k=100 was ~{proj/1e3:.1f}k
QPS (12.55 ns/row + 7.92 ms dispatch); measured {m['guaranteed_qps_10m']/1e3:.1f}k is
{m['guaranteed_qps_10m']/proj:.0%} of projection — {'within' if abs(m['guaranteed_qps_10m']/proj-1)<0.15 else 'OUTSIDE'} the model's ~10-15%
band. Graded against the 100k north-star: one chip at 10M items serves
{m['guaranteed_qps_10m']/1e3:.0f}k guaranteed-exact; the sharded-index model (see
"Shard-model link-payload correction") gives the multi-chip path.
"""
p = pathlib.Path("BENCH_NOTES.md"); p.write_text(p.read_text() + sec)
print("serve section landed")
EOF
  git add BENCH_NOTES.md runs/items10m-serve runs/r5c_queue.log runs/items10m_serve.log 2>/dev/null
  git commit -q -m "Serve-at-10M lands: artifact + goldens + measured guaranteed-exact QPS vs projection" || true
  mark serve
}

ml20m_done_count () {
  local n=0
  for l in ccl directau mawu; do
    grep -q "=== ml20m-$l done" runs/r5c_extras.log 2>/dev/null \
      && [ -s "runs/ml20m-$l/metrics.jsonl" ] && n=$((n+1))
  done
  echo $n
}

land_ml20m () {
  [ "$(ml20m_done_count)" -eq 3 ] || return
  PALLAS_AXON_POOL_IPS= python runs/report_ml20m.py > runs/ml20m_report.txt 2>&1 || return
  PALLAS_AXON_POOL_IPS= python - << 'EOF'
import pathlib
rep = pathlib.Path("runs/ml20m_report.txt").read_text()
table = rep[rep.index("|"):] if "|" in rep else rep
sec = f"""
## BASELINE config 3: ML-20M-shape loss sweep (VERDICT r4 #2, leg 3)

Corpus data/ml20m (synthetic, 138k users x 27k movies x 20M ratings,
runs/make_ml20m.py, seed 0). 128-dim encoder (h128 L1), B=1024,
lr 5e-4, mixed negative sampling, budget-matched 40 min/loss
(max_time_s 2400), checkpointing off. Graded-NDCG convention (trainer
metric), val split, synthetic corpus. runs/report_ml20m.py prints this
table + per-run JSON:

{table}
"""
p = pathlib.Path("BENCH_NOTES.md"); p.write_text(p.read_text() + sec)
print("ml20m section landed")
EOF
  git add BENCH_NOTES.md runs/ml20m_report.txt runs/ml20m-ccl runs/ml20m-directau runs/ml20m-mawu runs/r5c_extras.log 2>/dev/null
  git commit -q -m "ML-20M-shape loss sweep lands: CCL/DirectAU/MAWU at 20M ratings (BASELINE config 3)" || true
  mark ml20m
}

land_ts () {
  local n=0
  for s in 0 1 2; do
    grep -q "=== ml1m-ts-flagship-s$s done" runs/r5c_extras.log 2>/dev/null \
      && [ -s "runs/ml1m-ts-flagship-s$s/metrics.jsonl" ] && n=$((n+1))
  done
  [ "$n" -eq 3 ] || return
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu nice -n 19 \
    python runs/quality_cf_report.py runs/ml1m-ts-flagship-s0 \
    runs/ml1m-ts-flagship-s1 runs/ml1m-ts-flagship-s2 \
    > runs/ts_family_report.txt 2>&1 || return
  PALLAS_AXON_POOL_IPS= python - << 'EOF'
import pathlib
rep = pathlib.Path("runs/ts_family_report.txt").read_text()
fam = rep[rep.index("=== family"):] if "=== family" in rep else rep
sec = f"""
## Text-signal corpus flagship family (VERDICT r4 #6a, leg 3, n=3)

data/ml1m-ts (text_signal=True: user profile text generated to predict
archetype preferences). Flagship = history tower H=16 + InfoNCE,
4 epochs, seeds 0-2; composed = + frozen CF channel (w_cf=1, w_pop=2,
calibrated round 4, never re-tuned). Non-learned ceilings on this
corpus (runs/corpus_signal_probes.py, binary val NDCG@20): popularity
0.0210, genre-CF skyline 0.0632, itemCF 0.0660. Full per-seed numbers
in runs/ts_family_report.txt; family summary (mean ± std):

```
{fam.strip()}
```
"""
p = pathlib.Path("BENCH_NOTES.md"); p.write_text(p.read_text() + sec)
print("ts section landed")
EOF
  git add BENCH_NOTES.md runs/ts_family_report.txt runs/ml1m-ts-flagship-s0 runs/ml1m-ts-flagship-s1 runs/ml1m-ts-flagship-s2 runs/r5c_extras.log 2>/dev/null
  git commit -q -m "Text-signal flagship family lands: n=3 seeds vs non-learned ceilings" || true
  mark ts
}

for _ in $(seq 1 360); do
  landed serve || land_serve
  landed ml20m || land_ml20m
  landed ts    || land_ts
  landed serve && landed ml20m && landed ts && break
  sleep 120
done
echo "follower exit $(date +%H:%M:%S)"
