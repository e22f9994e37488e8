#!/bin/bash
# Round-5 quality-ceiling campaign (VERDICT r4 weak #4 / next #6, option a):
# the flagship (history tower H=16, InfoNCE, 4 epochs) at n=5 seeds on the
# TEXT-SIGNAL corpus data/ml1m-ts (data/synthetic.py text_signal=True:
# user profile text — occupation/age/zipcode — is generated to PREDICT the
# user's archetype preferences, giving the text towers real signal; the
# original corpus keyed preferences off a latent id-only factor, which put
# the non-learned itemCF+pop composition at the information ceiling).
# Non-learned ceilings on ml1m-ts (runs/corpus_signal_probes.py, val):
# popularity 0.0210, genre-CF skyline 0.0632, itemCF 0.0660 binary NDCG@20.
# Checkpoints saved so the CF channel can be composed post-hoc
# (runs/quality_cf_report.py with these run dirs).
set -e
cd /root/repo
# Priority order (VERDICT r4: ml20m campaign is #2, quality ceiling #6):
# run the ML-20M loss sweep BEFORE the seed family. Idempotent — the
# queue's own scale20m stage then skips everything.
bash runs/scale20m_campaign.sh
BASE="--model.user_tower history --model.max_history 16 \
 --model.train_loss InfomationNoiseContrastiveEstimationLoss \
 --data.data_dir data/ml1m-ts --trainer.max_epochs 4 \
 --trainer.early_stopping_patience 5"
for seed in 0 1 2 3 4; do
  name="ml1m-ts-flagship-s$seed"
  if [ -s "runs/$name/metrics.jsonl" ]; then echo "skip $name"; continue; fi
  echo "=== $name  $(date +%H:%M:%S)"
  timeout 2700 python -m xfmr_rec_tpu.training.cli fit $BASE \
    --trainer.run_name "$name" --trainer.seed "$seed" 2>&1 | tail -2
done
echo "ts family done $(date +%H:%M:%S)"
