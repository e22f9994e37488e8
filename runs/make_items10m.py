"""Generate + ETL the 10M-item synthetic corpus (BASELINE config 4).

200k users x 10,000,000 movies x 20M ratings under data/items10m — the
regime hash/Bloom compressed ID tables exist for (a dense 10M x 32 f32
table is 1.28 GB + 2.56 GB adam moments; a 2^18-bucket bloom table is
32 MB). Short max_length (24) keeps the 10M-row token matrix ~1 GB.
Idempotent: skips stages whose outputs exist.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from xfmr_rec_tpu.data.prepare import prepare_movielens  # noqa: E402
from xfmr_rec_tpu.data.synthetic import generate_movielens  # noqa: E402

DATA_DIR = pathlib.Path("data/items10m")


def main() -> None:
    raw = DATA_DIR / "ml-1m" / "ratings.dat"
    if not raw.exists():
        t0 = time.time()
        generate_movielens(
            DATA_DIR,
            num_users=200_000,
            num_movies=10_000_000,
            num_ratings=20_000_000,
            num_archetypes=8,
            seed=0,
        )
        print(f"generate: {time.time() - t0:.1f}s", flush=True)
    else:
        print("generate: skipped", flush=True)

    parquet = DATA_DIR / "ml-1m" / "users.parquet"
    if not parquet.exists():
        t0 = time.time()
        prepare_movielens(str(DATA_DIR), overwrite=False)
        print(f"prepare: {time.time() - t0:.1f}s", flush=True)
    else:
        print("prepare: skipped", flush=True)


if __name__ == "__main__":
    main()
