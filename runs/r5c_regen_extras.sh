#!/bin/bash
# Round-5 leg 3: regenerate the gitignored extras corpora lost with the
# fresh checkout, so runs/r5_extras.sh (ML-20M sweep + ts-family) can
# start the moment the relay returns. Single core: strictly sequential,
# smallest first. Idempotent (each make script / generator skips
# existing outputs).
set -u
cd /root/repo

if [ ! -f data/ml1m-ts/ml-1m/users.parquet ]; then
  python -m xfmr_rec_tpu.data.synthetic --data_dir data/ml1m-ts --text_signal
  python -c "
from xfmr_rec_tpu.data.prepare import prepare_movielens
prepare_movielens('data/ml1m-ts', overwrite=False)
print('ml1m-ts prepare done')
"
else
  echo "ml1m-ts: skipped"
fi

python runs/make_ml20m.py
echo "regen extras done $(date +%H:%M:%S)"
