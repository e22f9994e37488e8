"""Generate + ETL the ML-20M-shape synthetic corpus (BASELINE config 3).

Shape mirrors the real MovieLens-20M release (~138k users, ~27k movies,
20M ratings; reference data card) at the repo's synthetic-provenance
standard: data/ml20m/ml-1m/*.dat + full prepare_movielens ETL.
Idempotent: skips stages whose outputs exist.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from xfmr_rec_tpu.data.prepare import prepare_movielens  # noqa: E402
from xfmr_rec_tpu.data.synthetic import generate_movielens  # noqa: E402

DATA_DIR = pathlib.Path("data/ml20m")


def main() -> None:
    raw = DATA_DIR / "ml-1m" / "ratings.dat"
    if not raw.exists():
        t0 = time.time()
        generate_movielens(
            DATA_DIR,
            num_users=138_000,
            num_movies=27_000,
            num_ratings=20_000_000,
            seed=0,
        )
        print(f"generate: {time.time() - t0:.1f}s", flush=True)
    else:
        print("generate: skipped (ratings.dat exists)", flush=True)

    parquet = DATA_DIR / "ml-1m" / "users.parquet"
    if not parquet.exists():
        t0 = time.time()
        prepare_movielens(str(DATA_DIR), overwrite=False)
        print(f"prepare: {time.time() - t0:.1f}s", flush=True)
    else:
        print("prepare: skipped (users.parquet exists)", flush=True)


if __name__ == "__main__":
    main()
