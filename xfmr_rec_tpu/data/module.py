"""Fixed-shape batch pipeline + data module facade.

Replaces the reference's datapipe/DataLoader stack
(/root/reference/xfmr_rec/data/lightning.py:79-471 and data/load.py):
processors assembling parquet -> cycle -> shuffle -> batch -> collate
streams with multiprocess workers. On TPU the idiomatic pipeline is
different: **tokenize every unique text once at setup**, keep token
matrices as host numpy arrays, and emit fixed-shape integer batches that
gather rows by index — no per-step tokenization, no ragged collation, no
worker processes (the reference's pad-to-512-per-step hot spot disappears).

Parity notes:
- Training stream = interactions filtered is_train, reshuffled each epoch,
  zipped with an infinitely cycled, reshuffled item stream providing one
  uniform corpus negative per positive — the reference's mixed negative
  sampling (data/lightning.py:344-354).
- `pos_idx` per row = the user's *train-half* positive item row-numbers
  (the reference joins the per-(user, is_train) target list onto every
  rating row — prepare.py:236-241 — so during training the mask covers all
  of the user's train positives). 0-padded, width `max_positives`.
- Eval batches are per-user: exclusion set = the user's train history
  (lightning.py:89-90), targets = the holdout with graded ratings.
- LogQ extension: per-batch candidate sampling log-probabilities
  (frequency-based for in-batch positives, uniform for sampled corpus
  negatives) for the sampled-softmax bias correction.
"""

from __future__ import annotations

import logging
import pathlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pydantic

from xfmr_rec_tpu.data import prepare as prepare_mod
from xfmr_rec_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig
from xfmr_rec_tpu.params import BATCH_SIZE, DATA_DIR

logger = logging.getLogger(__name__)


class DataConfig(pydantic.BaseModel):
    data_dir: str = DATA_DIR
    batch_size: int = BATCH_SIZE
    eval_batch_size: int = 256
    max_length: int = 64
    vocab_size: int = 30522
    # "hashing" = stateless feature hashing (no vocab file, supports
    # num_hashes>1 Bloom ids); "vocab" = corpus-frequency vocab built at
    # setup (the reference's learned-WordPiece capability, models.py:23,
    # without the blocked download) with FNV-hashed OOV buckets.
    tokenizer: str = "hashing"
    oov_buckets: int = 2048
    # pos_idx / target padding widths. None (default) = corpus-derived at
    # setup(): the max per-user count, so NO user's accidental-hit mask or
    # recall denominator is ever truncated (the reference masks the user's
    # entire train-positive list — data/lightning.py:274-280, losses.py:92-110
    # — and torchmetrics sees every holdout target, lightning.py:289-306).
    # An explicit int is honored as a hard cap (memory control for huge
    # corpora) — with truncation, logged loudly.
    max_positives: int | None = None
    max_targets: int | None = None
    # History-tower inputs (models/history.py): 0 = off. When > 0, every
    # train/eval batch additionally carries the user's most recent
    # `max_history` PRIOR train interactions (item positions / tokens,
    # ratings, mask), most-recent-first. Train rows see a strictly causal
    # prefix (interactions before the row's own timestamp — the current
    # positive can never appear in its own history); eval/serving rows see
    # the user's full train history, which IS the causal prefix at holdout
    # time. The reference computes a rolling 4-week history feature
    # (prepare.py:229-243) but never feeds it to the model; prefix
    # semantics are used here so the training-time input distribution
    # matches the serving-time one exactly.
    max_history: int = 0
    # CF-bag inputs (models/history.py _bag_vec): 0 = off. When > 0,
    # every train/eval batch carries the user's full train history (up
    # to max_bag items, most-recent-first) as movie_rn + rating arrays
    # for the ID-table bag slot. Train rows mask the row's OWN positive
    # out of its bag (FISM/SVD++ convention: the bag is otherwise the
    # full train set, which is exactly the serving-time input — holdout
    # items can never appear in a train bag under the temporal split).
    max_bag: int = 0
    seed: int = 0
    # offline fallback: generate a synthetic corpus when raw data is absent
    synthetic_if_missing: bool = True
    synthetic_users: int = 120
    synthetic_movies: int = 200
    synthetic_ratings: int = 4000


class NegativeItemSampler:
    """Infinite shuffled cycle over item positions (mixed negative sampling).

    Equivalent to the reference's `.cycle(count=0).shuffle()` item datapipe
    zipped with the interaction stream (data/lightning.py:344-354): each
    pass visits every item once in a fresh random order.
    """

    def __init__(self, num_items: int, seed: int = 0) -> None:
        self.num_items = num_items
        self.rng = np.random.default_rng(seed)
        self._order = self.rng.permutation(num_items)
        self._cursor = 0

    def draw(self, count: int) -> np.ndarray:
        out = np.empty(count, dtype=np.int64)
        filled = 0
        while filled < count:
            take = min(count - filled, self.num_items - self._cursor)
            out[filled : filled + take] = self._order[
                self._cursor : self._cursor + take
            ]
            filled += take
            self._cursor += take
            if self._cursor >= self.num_items:
                self._order = self.rng.permutation(self.num_items)
                self._cursor = 0
        return out


def _pad_rows(rows: list[np.ndarray], width: int, fill: int) -> np.ndarray:
    out = np.full((len(rows), width), fill, dtype=np.int64)
    for i, row in enumerate(rows):
        n = min(len(row), width)
        out[i, :n] = row[:n]
    return out


class RecDataModule:
    """Owns ETL, tokenization, and batch iterators for train/val/test."""

    def __init__(self, config: DataConfig | None = None, **kwargs) -> None:
        if config is None:
            config = DataConfig(**kwargs)
        self.config = DataConfig.model_validate(config)
        if self.config.tokenizer not in ("hashing", "vocab"):
            msg = f"unknown tokenizer {self.config.tokenizer!r}"
            raise ValueError(msg)
        # the vocab tokenizer needs the corpus texts: built in setup()
        self.tokenizer = (
            HashingTokenizer(
                TokenizerConfig(
                    vocab_size=self.config.vocab_size,
                    max_length=self.config.max_length,
                )
            )
            if self.config.tokenizer == "hashing"
            else None
        )
        self._ready = False
        self.provenance: dict | None = None

    # ------------------------------------------------------------------
    def prepare_data(self, *, overwrite: bool = False) -> None:
        """ETL to parquet (downloads or synthesizes raw data if absent).

        Guarded by a FileLock like the reference prepare_data
        (data/lightning.py:404-412) so concurrent trainers / HPO trials
        don't race on the dataset directory.
        """
        from filelock import FileLock

        cfg = self.config
        with FileLock(f"{cfg.data_dir}.lock"):
            self._prepare_data_locked(overwrite=overwrite)

    def _prepare_data_locked(self, *, overwrite: bool = False) -> None:
        cfg = self.config
        raw_dir = pathlib.Path(cfg.data_dir, "ml-1m")
        source = "preexisting"
        if not (raw_dir / "ratings.dat").exists():
            try:
                prepare_mod.download_unpack_data(dest_dir=cfg.data_dir)
                source = "downloaded"
            except RuntimeError:
                if not cfg.synthetic_if_missing:
                    raise
                from xfmr_rec_tpu.data.synthetic import generate_movielens

                logger.warning(
                    "raw data unavailable; generating synthetic corpus"
                )
                generate_movielens(
                    cfg.data_dir,
                    num_users=cfg.synthetic_users,
                    num_movies=cfg.synthetic_movies,
                    num_ratings=cfg.synthetic_ratings,
                    seed=cfg.seed,
                )
                source = "synthetic"
        # verify real-vs-synthetic by fingerprint and record it alongside
        # the raw data, so every run config carries honest dataset labeling
        self.provenance = prepare_mod.record_provenance(
            cfg.data_dir, source=source
        )
        prepare_mod.prepare_movielens(cfg.data_dir, overwrite=overwrite)

    # ------------------------------------------------------------------
    def setup(self) -> None:
        """Load parquet, tokenize all texts once, build index arrays."""
        if self._ready:
            return
        cfg = self.config
        base = pathlib.Path(cfg.data_dir, "ml-1m")
        if self.provenance is None:
            self.provenance = prepare_mod.load_provenance(cfg.data_dir)
        movies = pd.read_parquet(base / "movies.parquet")
        users = pd.read_parquet(base / "users.parquet")
        ratings = pd.read_parquet(base / "ratings.parquet")

        if self.tokenizer is None:  # tokenizer="vocab": corpus-built
            self.tokenizer = self._build_vocab_tokenizer(
                base,
                movies["movie_text"].tolist() + users["user_text"].tolist(),
            )

        # items: position p corresponds to movie_rn p+1 (row-number order)
        movies = movies.sort_values("movie_rn").reset_index(drop=True)
        self.item_ids = movies["movie_id"].to_numpy()
        self.item_rns = movies["movie_rn"].to_numpy()
        # the whole pipeline derives movie_rn as position+1 (item_idx,
        # hist_rns, bag_rns) while the corpus stores this column — a
        # non-contiguous or non-1-based movie_rn would silently desync
        # train-time ID embeddings from the corpus/serving ones, so the
        # correspondence is enforced here instead of assumed
        if not np.array_equal(
            self.item_rns, np.arange(1, len(movies) + 1)
        ):
            raise ValueError(
                "movies.parquet movie_rn must be the contiguous 1-based "
                "row number (position+1); got a non-contiguous column — "
                "re-run data preparation (data/prepare.py assigns rns)"
            )
        self.item_texts = movies["movie_text"].tolist()
        self.item_tokens = self.tokenizer.encode_batch(self.item_texts)
        self.num_items = len(movies)

        users = users.sort_values("user_rn").reset_index(drop=True)
        self.user_ids = users["user_id"].to_numpy()
        self.user_rns = users["user_rn"].to_numpy()
        self.user_texts = users["user_text"].tolist()
        self.user_tokens = self.tokenizer.encode_batch(self.user_texts)
        self.users_frame = users
        self.num_users = len(users)

        user_pos_of_id = {int(u): p for p, u in enumerate(self.user_ids)}
        item_pos_of_id = {int(m): p for p, m in enumerate(self.item_ids)}

        # interaction arrays
        self.train_user_pos = np.array(
            [user_pos_of_id[u] for u in ratings.loc[ratings["is_train"], "user_id"]],
            dtype=np.int64,
        )
        self.train_item_pos = np.array(
            [item_pos_of_id[m] for m in ratings.loc[ratings["is_train"], "movie_id"]],
            dtype=np.int64,
        )
        self.train_rating = ratings.loc[
            ratings["is_train"], "rating"
        ].to_numpy(dtype=np.float32)

        # holdout interaction arrays per subset, for val/test loss logging
        # (the reference runs compute_losses at every val/test step —
        # lightning.py:194-206)
        self._holdout_interactions: dict[str, tuple] = {}
        for subset in ("val", "test"):
            mask = ratings[f"is_{subset}"] & ~ratings["is_train"]
            rows = ratings.loc[mask]
            self._holdout_interactions[subset] = (
                np.array(
                    [user_pos_of_id[u] for u in rows["user_id"]],
                    dtype=np.int64,
                ),
                np.array(
                    [item_pos_of_id[m] for m in rows["movie_id"]],
                    dtype=np.int64,
                ),
                rows["rating"].to_numpy(dtype=np.float32),
            )

        # per-user train positives (item row-numbers, for pos_idx) and
        # train item positions (for eval exclusion)
        train_items_by_user: dict[int, list[int]] = {}
        for upos, ipos in zip(self.train_user_pos, self.train_item_pos):
            train_items_by_user.setdefault(int(upos), []).append(int(ipos))
        self._train_items_by_user = train_items_by_user

        if cfg.max_history > 0:
            self._build_history_arrays()
        if cfg.max_bag > 0:
            self._build_bag_arrays()

        pos_rows = [
            np.asarray(train_items_by_user.get(u, []), dtype=np.int64) + 1
            for u in range(self.num_users)
        ]  # +1: positions -> movie_rn
        corpus_max_pos = max((len(r) for r in pos_rows), default=1) or 1
        self.max_positives = (
            cfg.max_positives if cfg.max_positives is not None else corpus_max_pos
        )
        if self.max_positives < corpus_max_pos:
            logger.warning(
                "max_positives=%d truncates the accidental-hit mask for "
                "users with up to %d train positives — true positives may "
                "be mined as negatives",
                self.max_positives,
                corpus_max_pos,
            )
        self.user_pos_idx = _pad_rows(pos_rows, self.max_positives, 0)

        # holdout targets per user, sorted by rating desc (cap-safe idcg)
        holdout = ratings.loc[~ratings["is_train"]]
        target_ids: list[np.ndarray] = [
            np.zeros(0, dtype=np.int64) for _ in range(self.num_users)
        ]
        target_ratings: list[np.ndarray] = [
            np.zeros(0, dtype=np.float64) for _ in range(self.num_users)
        ]
        holdout_pos_rows = [
            np.zeros(0, dtype=np.int64) for _ in range(self.num_users)
        ]
        for user_id, group in holdout.groupby("user_id"):
            upos = user_pos_of_id[int(user_id)]
            order = np.argsort(-group["rating"].to_numpy(), kind="stable")
            target_ids[upos] = group["movie_id"].to_numpy()[order]
            target_ratings[upos] = group["rating"].to_numpy()[order]
            holdout_pos_rows[upos] = (
                np.array(
                    [item_pos_of_id[m] for m in group["movie_id"]],
                    dtype=np.int64,
                )
                + 1  # positions -> movie_rn
            )
        # accidental-hit mask rows for holdout loss batches: the reference
        # joins the (user, is_train=False) target list onto holdout rows
        # (prepare.py:236-241), so val/test losses mask the user's HOLDOUT
        # positives, not the train ones
        holdout_width = max(
            (len(r) for r in holdout_pos_rows), default=1
        ) or 1
        self.user_holdout_pos_idx = _pad_rows(
            holdout_pos_rows, holdout_width, 0
        )
        self._target_ids = target_ids
        self._target_ratings = target_ratings
        self.target_counts = np.array(
            [len(t) for t in target_ids], dtype=np.int64
        )
        corpus_max_targets = max(int(self.target_counts.max()), 1)
        self.max_targets = (
            cfg.max_targets if cfg.max_targets is not None else corpus_max_targets
        )
        if self.max_targets < corpus_max_targets:
            logger.warning(
                "max_targets=%d truncates holdout targets (corpus max %d) — "
                "recall denominators shrink vs torchmetrics semantics",
                self.max_targets,
                corpus_max_targets,
            )

        # subset membership per user
        self.user_subsets = {
            name: users[name].to_numpy()
            for name in ("is_train", "is_val", "is_test", "is_predict")
        }

        # item sampling log-probabilities for LogQ correction
        counts = np.bincount(self.train_item_pos, minlength=self.num_items)
        freq = (counts + 1.0) / (counts.sum() + self.num_items)
        self.item_log_q_inbatch = np.log(freq).astype(np.float32)
        self.item_log_q_uniform = np.full(
            self.num_items, -np.log(self.num_items), dtype=np.float32
        )

        self._neg_sampler = NegativeItemSampler(self.num_items, cfg.seed)
        self._ready = True
        logger.info(
            "data ready: %d users, %d items, %d train interactions",
            self.num_users,
            self.num_items,
            len(self.train_user_pos),
        )

    def _build_history_arrays(self) -> None:
        """Causal history tables for the history user tower.

        Train rows: `train_hist_pos[t, j]` = the item position of the
        (j+1)-th most recent train interaction of row t's user STRICTLY
        BEFORE row t (the ratings frame is written sorted by
        (user_id, timestamp) — prepare.py process_ratings — so a user's
        train rows are contiguous and time-ascending, and a row's causal
        prefix is simply the rows above it in its block). -1 = no such
        event. The current positive can never appear in its own history
        (strictly-prior events; (user, movie) pairs are unique).

        Users: `user_hist_pos[u]` = the user's most recent max_history
        train interactions, most-recent-first — the serving-time input,
        and exactly the causal prefix at the holdout boundary.
        """
        hist_len = self.config.max_history
        num_rows = len(self.train_user_pos)
        self.train_hist_pos = np.full((num_rows, hist_len), -1, np.int64)
        self.train_hist_rating = np.zeros((num_rows, hist_len), np.int32)
        self.user_hist_pos = np.full((self.num_users, hist_len), -1, np.int64)
        self.user_hist_rating = np.zeros(
            (self.num_users, hist_len), np.int32
        )
        if num_rows == 0:
            return
        boundaries = np.flatnonzero(np.diff(self.train_user_pos) != 0) + 1
        for block in np.split(np.arange(num_rows), boundaries):
            items = self.train_item_pos[block]
            ratings = self.train_rating[block].astype(np.int32)
            rows = len(block)
            for back in range(min(hist_len, rows)):
                src = np.arange(rows) - (back + 1)
                valid = src >= 0
                self.train_hist_pos[block[valid], back] = items[src[valid]]
                self.train_hist_rating[block[valid], back] = ratings[
                    src[valid]
                ]
            upos = int(self.train_user_pos[block[0]])
            take = min(hist_len, rows)
            self.user_hist_pos[upos, :take] = items[::-1][:take]
            self.user_hist_rating[upos, :take] = ratings[::-1][:take]

    def _build_bag_arrays(self) -> None:
        """Per-user CF-bag tables: the user's most recent `max_bag` train
        interactions (item positions + integer ratings), most-recent-
        first, -1/-0 padded — the FISM/SVD++ user-factor input. One
        user-level table serves train AND eval rows: train assembly
        masks the row's own positive out (`_assemble_loss_batch`), and
        the full bag IS the causal input at holdout time."""
        width = self.config.max_bag
        self.user_bag_pos = np.full((self.num_users, width), -1, np.int64)
        self.user_bag_rating = np.zeros((self.num_users, width), np.int32)
        num_rows = len(self.train_user_pos)
        if num_rows == 0:
            return
        boundaries = np.flatnonzero(np.diff(self.train_user_pos) != 0) + 1
        for block in np.split(np.arange(num_rows), boundaries):
            upos = int(self.train_user_pos[block[0]])
            items = self.train_item_pos[block][::-1][:width]
            ratings = self.train_rating[block].astype(np.int32)[::-1][
                :width
            ]
            self.user_bag_pos[upos, : len(items)] = items
            self.user_bag_rating[upos, : len(ratings)] = ratings

    def train_history_item_ids(self, user_pos: int) -> list[int]:
        """Item IDS of one user's train-half interactions (the
        recommend-time exclusion set — reference lightning.py:89-90).
        Public accessor: CLI/serving must not reach into the private
        position map."""
        return [
            int(self.item_ids[p])
            for p in self._train_items_by_user.get(int(user_pos), [])
        ]

    def _build_vocab_tokenizer(self, base: pathlib.Path, texts: list[str]):
        """Build (or reload) the corpus-frequency vocab tokenizer.

        The vocab is cached next to the parquet files keyed by its
        shape parameters, so repeated setups (HPO trials, serving
        artifact rebuilds) don't re-count the corpus.
        """
        from xfmr_rec_tpu.models.tokenizer import (
            VocabTokenizer,
            build_vocab,
        )

        cfg = self.config
        cache = base / (
            f"vocab-{cfg.vocab_size}-{cfg.oov_buckets}-{cfg.max_length}.json"
        )
        if cache.exists():
            return VocabTokenizer.load(cache)
        vocab = build_vocab(
            texts, vocab_size=cfg.vocab_size, oov_buckets=cfg.oov_buckets
        )
        tokenizer = VocabTokenizer(
            vocab,
            TokenizerConfig(
                vocab_size=cfg.vocab_size, max_length=cfg.max_length
            ),
        )
        tokenizer.save(cache)
        logger.info(
            "built corpus vocab: %d tokens + %d OOV buckets (cached %s)",
            len(vocab),
            tokenizer.oov_buckets,
            cache.name,
        )
        return tokenizer

    # ------------------------------------------------------------------
    @property
    def steps_per_epoch(self) -> int:
        return len(self.train_user_pos) // self.config.batch_size

    def _assemble_loss_batch(
        self,
        upos: np.ndarray,
        ipos: np.ndarray,
        target: np.ndarray,
        pos_table: np.ndarray,
        sampler: NegativeItemSampler,
        hist: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> dict[str, np.ndarray]:
        """One loss-step batch (train and eval share this schema — keep
        them byte-identical so val losses measure the same quantity)."""
        neg_pos = sampler.draw(len(upos))
        item_idx = np.concatenate([ipos, neg_pos]) + 1  # movie_rn
        log_q = np.concatenate(
            [
                self.item_log_q_inbatch[ipos],
                self.item_log_q_uniform[neg_pos],
            ]
        )
        batch = {
            "user_tokens": self.user_tokens[upos],
            "item_tokens": self.item_tokens[ipos],
            "neg_item_tokens": self.item_tokens[neg_pos],
            "target": target,
            "item_idx": item_idx.astype(np.int64),
            "pos_idx": pos_table[upos],
            "log_q": log_q,
        }
        if hist is not None:
            hist_pos, hist_rating = hist
            mask = hist_pos >= 0
            tokens = self.item_tokens[np.maximum(hist_pos, 0)]
            # zero out padded slots' tokens (mask rides the batch too, but
            # the encoder treats token 0 as PAD so padded slots cost no
            # signal either way)
            tokens = tokens * mask[..., None]
            batch["hist_tokens"] = tokens.astype(self.item_tokens.dtype)
            batch["hist_mask"] = mask
            batch["hist_ratings"] = hist_rating
            # movie_rn of each history slot (position + 1; 0 = padded)
            batch["hist_rns"] = ((hist_pos + 1) * mask).astype(np.int32)
        if self.config.max_bag > 0:
            bag_pos = self.user_bag_pos[upos]  # (B, G)
            # mask padding AND the row's own positive (FISM convention:
            # the bag must not contain the answer it is scored against)
            bag_mask = (bag_pos >= 0) & (bag_pos != ipos[:, None])
            batch["bag_rns"] = ((bag_pos + 1) * bag_mask).astype(np.int32)
            batch["bag_ratings"] = self.user_bag_rating[upos]
            batch["bag_mask"] = bag_mask
        return batch

    def train_batches(self, epoch: int = 0) -> Iterator[dict[str, np.ndarray]]:
        """Shuffled fixed-shape training batches with MNS negatives."""
        cfg = self.config
        rng = np.random.default_rng((cfg.seed, epoch))
        order = rng.permutation(len(self.train_user_pos))
        batch = cfg.batch_size
        for start in range(0, len(order) - batch + 1, batch):
            take = order[start : start + batch]
            yield self._assemble_loss_batch(
                self.train_user_pos[take],
                self.train_item_pos[take],
                self.train_rating[take],
                self.user_pos_idx,
                self._neg_sampler,
                hist=(
                    (self.train_hist_pos[take], self.train_hist_rating[take])
                    if cfg.max_history > 0
                    else None
                ),
            )

    def eval_interaction_batches(
        self, subset: str = "val"
    ) -> Iterator[dict[str, np.ndarray]]:
        """Held-out interaction batches, loss-step-shaped like
        `train_batches` (MNS negative per row, pos_idx mask, log_q).

        Deterministic: a fixed-order pass over the subset's holdout
        ratings with a freshly seeded negative stream, so val/test loss
        curves are comparable across validations. A subset smaller than
        one batch is wrap-filled to a single full batch (rows repeat)
        rather than silently yielding nothing; the trailing partial
        batch of larger subsets is dropped (static jit shapes).
        """
        cfg = self.config
        upos_all, ipos_all, rating_all = self._holdout_interactions[subset]
        sampler = NegativeItemSampler(self.num_items, seed=cfg.seed + 1)
        batch = cfg.batch_size
        indices = np.arange(len(upos_all))
        if 0 < indices.size < batch:
            indices = np.resize(indices, batch)
        for start in range(0, len(indices) - batch + 1, batch):
            take = indices[start : start + batch]
            upos = upos_all[take]
            yield self._assemble_loss_batch(
                upos,
                ipos_all[take],
                rating_all[take],
                self.user_holdout_pos_idx,
                sampler,
                # holdout rows' causal history = the user's full train
                # history (every train event precedes every holdout event
                # under the per-user temporal split)
                hist=(
                    (self.user_hist_pos[upos], self.user_hist_rating[upos])
                    if cfg.max_history > 0
                    else None
                ),
            )

    # ------------------------------------------------------------------
    def eval_users(self, subset: str) -> np.ndarray:
        """User positions belonging to an eval subset."""
        mask = self.user_subsets[f"is_{subset}"] & (self.target_counts > 0)
        if subset == "predict":
            mask = self.user_subsets["is_predict"]
        return np.flatnonzero(mask)

    def eval_batches(
        self, subset: str = "val"
    ) -> Iterator[dict[str, np.ndarray]]:
        """Per-user eval batches: tokens + exclusions + padded targets.

        Fixed batch shape: the last batch is padded with repeats and
        carries a `valid` mask.
        """
        cfg = self.config
        users = self.eval_users(subset)
        batch = cfg.eval_batch_size
        max_hist = max(
            (len(self._train_items_by_user.get(int(u), [])) for u in users),
            default=1,
        )
        max_hist = max(max_hist, 1)
        for start in range(0, len(users), batch):
            take = users[start : start + batch]
            valid = np.ones(len(take), dtype=bool)
            if len(take) < batch:  # pad final batch to fixed shape
                pad = np.full(batch - len(take), take[-1])
                valid = np.concatenate(
                    [valid, np.zeros(batch - len(take), dtype=bool)]
                )
                take = np.concatenate([take, pad])
            exclude = _pad_rows(
                [
                    np.asarray(
                        self._train_items_by_user.get(int(u), []),
                        dtype=np.int64,
                    )
                    for u in take
                ],
                max_hist,
                self.num_items,  # out-of-range => dropped by scatter
            )
            target_ids = _pad_rows(
                [self._target_ids[u] for u in take], self.max_targets, 0
            )
            ratings = np.zeros(
                (batch, self.max_targets), dtype=np.float32
            )
            for i, u in enumerate(take):
                r = self._target_ratings[u][: self.max_targets]
                ratings[i, : len(r)] = r
            out = {
                "user_pos": take,
                "user_tokens": self.user_tokens[take],
                "exclude_positions": exclude,
                "target_ids": target_ids,
                "target_ratings": ratings,
                "valid": valid,
            }
            if cfg.max_history > 0:
                # positions into the item corpus: the trainer/engine
                # gathers history EMBEDDINGS from the re-embedded corpus
                # matrix (no token re-encode on the eval/serving path)
                hist_pos = self.user_hist_pos[take]
                out["hist_positions"] = np.maximum(hist_pos, 0)
                out["hist_mask"] = hist_pos >= 0
                out["hist_ratings"] = self.user_hist_rating[take]
            if cfg.max_bag > 0:
                bag_pos = self.user_bag_pos[take]
                bag_mask = bag_pos >= 0
                out["bag_rns"] = ((bag_pos + 1) * bag_mask).astype(
                    np.int32
                )
                out["bag_ratings"] = self.user_bag_rating[take]
                out["bag_mask"] = bag_mask
            yield out
