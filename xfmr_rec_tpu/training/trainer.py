"""Trainer: the jit-compiled training loop with in-training retrieval eval.

Orchestration parity with the reference Lightning stack
(/root/reference/xfmr_rec/lightning.py:365-415 trainer defaults and
:226-250 eval/callback behavior):
- defaults: max_epochs=1, validation every 1/4 epoch, monitor
  val/RetrievalNormalizedDCG (max), EarlyStopping min_delta=0.001
  (patience 3 = lightning default), best-metric checkpointing.
- every validation re-embeds the full item corpus with the current
  encoder and evaluates per-user top-k retrieval — but here the "index
  build" is one jitted batched encode + an HBM matmul index, not a
  LanceDB rebuild (the reference's expensive barrier,
  data/lightning.py:183-235).
- checkpoint/resume via orbax (best + last), deployable artifact via
  `save()` (the reference's LitModule.save, lightning.py:312-328).

TPU design: one compiled train-step graph (all registered losses + grads of the
selected one), one compiled encode graph reused for corpus/users, one
compiled top-k+metrics graph. Host work per step is an integer-array
gather; there is no per-step tokenization.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule
from xfmr_rec_tpu.index.mips import RetrievalIndex, exact_topk
from xfmr_rec_tpu.params import METRIC, PROCESSORS_JSON
from xfmr_rec_tpu.training.metrics import retrieval_metrics
from xfmr_rec_tpu.models.history import uses_item_ids
from xfmr_rec_tpu.training.module import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_encode_fn,
    make_eval_loss_step,
    make_item_encode_fn,
    make_train_step,
    make_user_encode_fn,
)
from xfmr_rec_tpu.utils.logging import MetricsLogger

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 1
    max_steps: int | None = None
    max_time_s: float | None = 86400.0  # reference max_time "1 day"
    val_check_interval: float = 0.25
    limit_train_batches: float | int | None = None
    limit_val_batches: int | None = None
    # held-out interaction batches per validation for val/<LossName>
    # logging (None = the full holdout stream)
    limit_val_loss_batches: int | None = 8
    early_stopping_min_delta: float = 0.001
    early_stopping_patience: int = 3
    encode_batch_size: int = 512
    log_every_steps: int = 50
    log_dir: str = "runs"
    run_name: str = ""
    ckpt_dir: str | None = None
    # False disables best/last checkpoint writes entirely (early-stop
    # bookkeeping still runs). Use for throwaway campaign runs whose
    # reports read metrics.jsonl only — with multi-GB states (e.g. a
    # dense 10M-row ID table + Adam moments) every save fetches the
    # full state through the device relay (~8 min measured, and the
    # second back-to-back save deadlocked the relay client —
    # BENCH_NOTES round 5).
    checkpointing: bool = True
    seed: int = 0
    profile_dir: str | None = None
    # Device mesh (the reference's DDP equivalent, ray.py:40-51): None =
    # auto — shard over all visible devices when there is more than one.
    # Training batches shard over the full mesh (data parallelism, grads
    # all-reduced over ICI); with model_parallel > 1 the eval corpus is
    # additionally sharded over the "model" axis (corpus parallelism).
    mesh: bool | None = None
    model_parallel: int = 1
    # Log every registered loss each train step (the reference's
    # behavior, lightning.py:137-147). False computes only the train
    # loss — identical updates, leaner logs; measured only ~2% faster
    # (the family shares the similarity matrix; BENCH_NOTES round 4).
    log_all_losses: bool = True
    # Real model parallelism for training (off by default — the model
    # axis otherwise folds into data parallelism): shard the (vocab,
    # hidden) token-embedding table + its adam moments row-wise over the
    # model axis (parallel/train.py state_shardings). Numerics are
    # exactly data-parallel (tests/test_parallel.py).
    shard_vocab: bool = False


class Trainer:
    def __init__(
        self,
        config: TrainConfig | None = None,
        data: RecDataModule | DataConfig | None = None,
        trainer_config: TrainerConfig | None = None,
    ) -> None:
        self.config = config or TrainConfig()
        if isinstance(data, RecDataModule):
            self.data = data
        else:
            self.data = RecDataModule(data or DataConfig())
        self.trainer_config = trainer_config or TrainerConfig()
        run_name = self.trainer_config.run_name or time.strftime(
            "%Y%m%d-%H%M%S"
        )
        self.logger = MetricsLogger(self.trainer_config.log_dir, run_name)
        self.model = None
        self.state: TrainState | None = None
        self._train_step = None
        self._encode = None
        self._encode_items = None
        self._encode_user = None
        self._eval_step = None
        self._corpus_f32 = None
        self.global_step = 0
        self.best_metric = -np.inf
        self._bad_checks = 0
        self.index: RetrievalIndex | None = None
        self.mesh = None
        self._sharded_corpus = None
        self._sharded_corpus_pad = 0
        # factorized item-CF scoring channel (models/cf.py): factors +
        # per-user CF vectors, computed once at setup when cf_rank > 0
        self.cf = None
        self._user_cf: np.ndarray | None = None

    # ------------------------------------------------------------------
    def setup(self) -> None:
        if self.state is not None:
            return
        # the data module must emit history/bag fields at the model's
        # widths; sync before setup (or fail loudly on a mismatch with
        # an already-built data module)
        sync_fields: dict[str, int] = {}
        if self.config.user_tower == "history":
            sync_fields["max_history"] = self.config.max_history
        if self.config.max_bag > 0:
            sync_fields["max_bag"] = self.config.max_bag
        if sync_fields:
            if self.data._ready:
                for field, value in sync_fields.items():
                    if getattr(self.data.config, field) != value:
                        msg = (
                            f"model needs data.{field} == {value} "
                            f"(data module built with "
                            f"{getattr(self.data.config, field)})"
                        )
                        raise ValueError(msg)
            else:
                self.data.config = self.data.config.model_copy(
                    update=sync_fields
                )
        self.data.prepare_data()
        self.data.setup()
        if self.config.cf_rank > 0:
            # non-learned channel: deterministic recompute from the train
            # interactions (seeded), so checkpoints need not persist it
            from xfmr_rec_tpu.models.cf import factorize_item_cf

            self.cf = factorize_item_cf(
                self.data._train_items_by_user,
                self.data.num_items,
                rank=self.config.cf_rank,
                seed=self.trainer_config.seed,
            )
            user_cf = np.zeros(
                (len(self.data.user_ids), self.cf.rank), np.float32
            )
            for u, items in self.data._train_items_by_user.items():
                if items:
                    user_cf[u] = self.cf.user_vectors(
                        np.asarray(items, dtype=np.int64)
                    )
            self._user_cf = user_cf
        if (
            self.config.lr_schedule != "constant"
            and self.config.total_steps is None
        ):
            # cosine decays over the full planned run; bound it by
            # max_steps when set, else epochs x the ACTUAL per-epoch
            # batch count (limit_train_batches included — otherwise a
            # limited run executes a fraction of the schedule and never
            # decays)
            planned = (
                self.trainer_config.max_steps
                or self.trainer_config.max_epochs
                * self._num_train_batches()
            )
            self.config = self.config.model_copy(
                update={"total_steps": max(int(planned), 1)}
            )
        if self.config.item_id_embedding == "dense":
            max_rn = (
                int(self.data.item_rns.max())
                if len(self.data.item_rns)
                else 0
            )
            if max_rn >= self.config.item_id_buckets:
                msg = (
                    "dense item_id_embedding needs item_id_buckets > max "
                    f"movie_rn ({self.config.item_id_buckets} <= {max_rn})"
                    " — raise item_id_buckets or use bloom/hash"
                )
                raise ValueError(msg)
        self.model, self.state = create_train_state(
            self.config, rng=self.trainer_config.seed
        )
        tc = self.trainer_config
        n_devices = len(jax.devices())
        use_mesh = tc.mesh if tc.mesh is not None else n_devices > 1
        if use_mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from xfmr_rec_tpu.parallel import (
                create_mesh,
                make_sharded_train_step,
            )
            from xfmr_rec_tpu.parallel.mesh import batch_spec, replicate

            self.mesh = create_mesh(model_parallel=tc.model_parallel)
            if self.data.config.batch_size % self.mesh.size:
                msg = (
                    f"batch_size {self.data.config.batch_size} must be "
                    f"divisible by the mesh size {self.mesh.size} "
                    f"(shape {dict(self.mesh.shape)})"
                )
                raise ValueError(msg)
            replicated = NamedSharding(self.mesh, P())
            sharded_rows = NamedSharding(
                self.mesh, P(batch_spec()[0], None)
            )
            if tc.shard_vocab:
                from xfmr_rec_tpu.parallel.train import (
                    place_state,
                    state_shardings,
                )

                self.state = place_state(
                    self.state, self.mesh, self.config, shard_vocab=True
                )
                params_sharding = state_shardings(
                    self.state, self.mesh, self.config, shard_vocab=True
                ).params
            else:
                self.state = replicate(self.state, self.mesh)
                params_sharding = replicated
            self._train_step = make_sharded_train_step(
                self.config,
                self.mesh,
                shard_vocab=tc.shard_vocab,
                state=self.state,
                log_all_losses=tc.log_all_losses,
            )
            self._eval_step = jax.jit(
                make_eval_loss_step(self.config), out_shardings=replicated
            )
            self._encode = jax.jit(
                make_encode_fn(self.model),
                in_shardings=(params_sharding, sharded_rows),
                out_shardings=replicated,
            )
            sharded_any = NamedSharding(self.mesh, P(batch_spec()[0]))
            if uses_item_ids(self.config):
                self._encode_items = jax.jit(
                    make_item_encode_fn(self.model),
                    in_shardings=(
                        params_sharding,
                        sharded_rows,
                        sharded_any,
                    ),
                    out_shardings=replicated,
                )
            if self.config.user_tower == "history":
                user_in = [
                    params_sharding,
                    sharded_rows,
                    replicated,
                    sharded_any,
                    sharded_any,
                    sharded_any,
                ]
                if self.config.max_bag > 0:
                    user_in += [sharded_any, sharded_any, sharded_any]
                self._encode_user = jax.jit(
                    make_user_encode_fn(self.model),
                    in_shardings=tuple(user_in),
                    out_shardings=replicated,
                )
        else:
            self._train_step = jax.jit(
                make_train_step(
                    self.config, log_all_losses=tc.log_all_losses
                ),
                donate_argnums=0,
            )
            self._eval_step = jax.jit(make_eval_loss_step(self.config))
            self._encode = jax.jit(make_encode_fn(self.model))
            if uses_item_ids(self.config):
                self._encode_items = jax.jit(
                    make_item_encode_fn(self.model)
                )
            if self.config.user_tower == "history":
                self._encode_user = jax.jit(make_user_encode_fn(self.model))
        self.logger.log_hyperparams(
            {
                "model": self.config.model_dump(),
                "data": self.data.config.model_dump(),
                "trainer": dataclasses.asdict(self.trainer_config),
                # measured real-vs-synthetic fingerprint (data/prepare.py
                # record_provenance) so run records label the corpus honestly
                "dataset": self.data.provenance or {},
            }
        )

    # ------------------------------------------------------------------
    def _num_train_batches(self) -> int:
        total = self.data.steps_per_epoch
        limit = self.trainer_config.limit_train_batches
        if limit is None:
            return total
        if isinstance(limit, float) and limit <= 1.0:
            return max(1, int(total * limit))
        return min(total, int(limit))

    def fit(self) -> dict[str, float]:
        """Train with periodic validation; returns final val metrics."""
        self.setup()
        tc = self.trainer_config
        num_batches = self._num_train_batches()
        val_every = max(1, int(num_batches * tc.val_check_interval))
        last_val: dict[str, float] = {}
        stop = False
        profiling = False
        fit_start = time.time()

        for epoch in range(tc.max_epochs):
            if stop:
                break
            for batch_idx, batch in enumerate(self.data.train_batches(epoch)):
                if batch_idx >= num_batches:
                    break
                if tc.profile_dir and self.global_step == 10 and not profiling:
                    jax.profiler.start_trace(tc.profile_dir)
                    profiling = True
                self.state, metrics = self._train_step(
                    self.state, self._place_batch(batch)
                )
                self.global_step += 1
                if profiling and self.global_step == 20:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                if self.global_step % tc.log_every_steps == 0:
                    self.logger.log_metrics(metrics, self.global_step)
                if tc.max_steps and self.global_step >= tc.max_steps:
                    stop = True
                    break
                if (
                    tc.max_time_s
                    and time.time() - fit_start > tc.max_time_s
                ):
                    logger.info("max_time_s reached; stopping")
                    stop = True
                    break
                if (batch_idx + 1) % val_every == 0:
                    last_val = self.validate()
                    if self._early_stop_check(last_val):
                        stop = True
                        break
            if not stop:
                last_val = self.validate()
                if self._early_stop_check(last_val):
                    stop = True
        if profiling:
            jax.profiler.stop_trace()
        if not last_val:  # e.g. max_steps hit before any val check
            last_val = self.validate()
            self._early_stop_check(last_val)
        return last_val

    def _early_stop_check(self, val_metrics: dict[str, float]) -> bool:
        """Best-metric checkpointing + early stopping (monitor = METRIC)."""
        tc = self.trainer_config
        value = val_metrics.get(METRIC["name"])
        if value is None:
            return False
        if value > self.best_metric + tc.early_stopping_min_delta:
            self.best_metric = value
            self._bad_checks = 0
            if tc.checkpointing:
                self.save_checkpoint("best")
        else:
            self._bad_checks += 1
        if tc.checkpointing:
            self.save_checkpoint("last")
        return self._bad_checks >= tc.early_stopping_patience

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def _place_batch(self, batch: dict) -> dict:
        """Shard a host batch over the mesh (no-op single-device)."""
        if self.mesh is None:
            return batch
        from xfmr_rec_tpu.parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    def _encode_tokens(self, tokens: np.ndarray):
        """Encode one token batch, mesh-padding rows to the device count."""
        pad = -len(tokens) % (self.mesh.size if self.mesh else 1)
        if pad:
            tokens = np.concatenate(
                [tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)]
            )
        out = self._encode(self.state.params, tokens)
        return out[:-pad] if pad else out

    def _encode_rows(
        self,
        tokens: np.ndarray,
        *,
        rns: np.ndarray | None = None,
        as_numpy: bool = True,
    ) -> np.ndarray:
        """Encode a token matrix in fixed-size batches (pad last batch).

        Pipelined: every chunk is dispatched asynchronously (device
        slices, no per-chunk host sync) and the result transfers ONCE at
        the end — the reference's eval barrier re-embeds the corpus
        through a per-batch python loop (data/lightning.py:183-235);
        round 2 of this trainer still blocked on np.asarray per chunk.
        Measured at 1M items (runs/bench_reembed.py): see BENCH_NOTES
        round 3. `as_numpy=False` keeps the embeddings on device (the
        index build casts them there anyway).
        """
        batch = self.trainer_config.encode_batch_size
        if self.mesh is not None:  # keep chunk shapes mesh-divisible
            batch += -batch % self.mesh.size
        outs = []
        for start in range(0, len(tokens), batch):
            chunk = tokens[start : start + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)]
                )
            if rns is not None:
                rn_chunk = rns[start : start + batch].astype(np.int32)
                if pad:
                    rn_chunk = np.concatenate(
                        [rn_chunk, np.zeros(pad, np.int32)]
                    )
                out = self._encode_items(
                    self.state.params, chunk, rn_chunk
                )
            else:
                out = self._encode(self.state.params, chunk)
            outs.append(out[: batch - pad] if pad else out)
        if not outs:
            return np.zeros((0, self.config.hidden_size), np.float32)
        result = jnp.concatenate(outs) if len(outs) > 1 else outs[0]
        return np.asarray(result) if as_numpy else result

    def build_index(self) -> RetrievalIndex:
        """Embed the full item corpus -> exact MIPS index (eval barrier).

        The corpus embeddings stay on device end-to-end (pipelined
        encode -> device concat -> index cast); int8 indexes need the
        host quantization pass, so only that path transfers.
        """
        corpus = self._encode_rows(
            self.data.item_tokens,
            rns=(
                self.data.item_rns
                if uses_item_ids(self.config)
                else None
            ),
            as_numpy=self.config.index_dtype == "int8",
        )
        if self.cf is not None:
            # CF channel: factor + popularity-prior columns appended to
            # every corpus row; the paired query columns carry the
            # composition weights (build_index stays weight-agnostic)
            if self.config.index_dtype == "int8":
                logger.warning(
                    "cf_rank > 0 with an int8 index: per-item symmetric "
                    "quantization now spans mixed-scale columns "
                    "(embeddings vs CF factors) — expect reduced "
                    "precision on the smaller-magnitude channel"
                )
            xp = np if isinstance(corpus, np.ndarray) else jnp
            corpus = xp.concatenate(
                [
                    corpus,
                    xp.asarray(self.cf.item_factors, dtype=corpus.dtype),
                    xp.asarray(
                        self.cf.pop_prior[:, None], dtype=corpus.dtype
                    ),
                ],
                axis=1,
            )
        if self.config.user_tower == "history":
            # the history user tower gathers its history-item embeddings
            # from this exact matrix (full precision, on device); with
            # extra scoring columns (item bias / CF factors / popularity
            # prior) the fusion consumes the d-dim part only
            corpus_f32 = jnp.asarray(corpus, dtype=jnp.float32)
            self._corpus_f32 = (
                corpus_f32[:, : self.config.hidden_size]
                if corpus_f32.shape[1] > self.config.hidden_size
                else corpus_f32
            )
        metadata = [
            {"movie_text": text, "movie_rn": int(rn)}
            for text, rn in zip(self.data.item_texts, self.data.item_rns)
        ]
        self.index = RetrievalIndex(
            corpus,
            self.data.item_ids,
            metadata,
            id_col="movie_id",
            dtype=self.config.index_dtype,
            method="auto",
        )
        if self.mesh is not None and self.mesh.shape["model"] > 1:
            # corpus parallelism: the item matrix shards over the "model"
            # axis and eval top-k merges over ICI (parallel/retrieval.py)
            from jax.sharding import NamedSharding, PartitionSpec as P

            num_model = self.mesh.shape["model"]
            corpus_host = np.asarray(corpus, dtype=np.float32)
            pad = -len(corpus_host) % num_model
            padded = (
                np.pad(corpus_host, ((0, pad), (0, 0)))
                if pad
                else corpus_host
            )
            self._sharded_corpus = jax.device_put(
                padded, NamedSharding(self.mesh, P("model", None))
            )
            self._sharded_corpus_pad = pad
        return self.index

    def _eval_user_embeds(self, batch: dict) -> np.ndarray:
        """User embeddings for one eval batch: plain text encode, or —
        history tower — text encode + fusion over history embeddings
        gathered from the freshly built corpus matrix (+ the CF bag
        slot). With item_bias the user vectors carry the constant-1
        column pairing the corpus bias column."""
        if self.config.user_tower != "history":
            out = np.asarray(self._encode_tokens(batch["user_tokens"]))
            if self.config.item_bias:
                out = np.concatenate(
                    [out, np.ones((len(out), 1), out.dtype)], axis=1
                )
            return self._augment_query(out, batch.get("user_pos"))
        tokens = batch["user_tokens"]
        extras = [
            batch["hist_positions"].astype(np.int32),
            batch["hist_mask"].astype(bool),
            batch["hist_ratings"].astype(np.int32),
        ]
        if self.config.max_bag > 0:
            extras += [
                batch["bag_rns"].astype(np.int32),
                batch["bag_ratings"].astype(np.int32),
                batch["bag_mask"].astype(bool),
            ]
        pad = -len(tokens) % (self.mesh.size if self.mesh else 1)
        if pad:
            tokens = np.concatenate(
                [tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)]
            )
            extras = [
                np.concatenate(
                    [arr, np.zeros((pad, arr.shape[1]), arr.dtype)]
                )
                for arr in extras
            ]
        out = self._encode_user(
            self.state.params, tokens, self._corpus_f32, *extras
        )
        out = np.asarray(out[:-pad] if pad else out)
        return self._augment_query(out, batch.get("user_pos"))

    def _augment_query(
        self, out: np.ndarray, user_pos: np.ndarray | None
    ) -> np.ndarray:
        """Append the CF-channel query columns: cf_weight * (unit user CF
        vector) paired with the corpus factor columns, and a constant
        cf_pop_weight paired with the popularity-prior column. Queries
        without a dataset user (raw text, cold users) get zero CF — the
        learned + popularity channels alone rank for them."""
        if self.cf is None:
            return out
        if user_pos is None:
            cf_vecs = np.zeros((len(out), self.cf.rank), np.float32)
        else:
            cf_vecs = self._user_cf[np.asarray(user_pos, dtype=np.int64)]
        return np.concatenate(
            [
                out,
                (self.config.cf_weight * cf_vecs).astype(out.dtype),
                np.full(
                    (len(out), 1), self.config.cf_pop_weight, out.dtype
                ),
            ],
            axis=1,
        )

    def _sharded_search(
        self, users: jnp.ndarray, batch: dict, top_k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Eval top-k over the model-axis-sharded corpus (exact, merged
        over ICI). Zero-embedding pad rows are masked via exclusions.
        Returns (scores, item_ids)."""
        from xfmr_rec_tpu.parallel.retrieval import sharded_topk

        excl = np.asarray(batch["exclude_positions"], dtype=np.int32)
        if self._sharded_corpus_pad:
            n = self.data.num_items
            pad_cols = np.broadcast_to(
                np.arange(
                    n, n + self._sharded_corpus_pad, dtype=np.int32
                ),
                (len(excl), self._sharded_corpus_pad),
            )
            excl = np.concatenate([excl, pad_cols], axis=1)
        values, positions = sharded_topk(
            jnp.asarray(users, dtype=jnp.float32),
            self._sharded_corpus,
            top_k,
            self.mesh,
            exclude_positions=jnp.asarray(excl),
        )
        # clip: pad rows can only appear when top_k > unexcluded items
        positions = np.minimum(
            np.asarray(positions), self.data.num_items - 1
        )
        return np.asarray(values), self.data.item_ids[positions]

    def _eval_retrieval(self, subset: str) -> dict[str, float]:
        index = self.build_index()
        top_k = self.config.top_k
        totals: dict[str, float] = {}
        count = 0
        limit = self.trainer_config.limit_val_batches
        for batch_idx, batch in enumerate(self.data.eval_batches(subset)):
            if limit is not None and batch_idx >= limit:
                break
            users = self._eval_user_embeds(batch)
            if self._sharded_corpus is not None:
                _, pred_ids = self._sharded_search(users, batch, top_k)
            else:
                _, pred_ids = index.search(
                    users,
                    top_k=top_k,
                    exclude_positions=batch["exclude_positions"],
                )
            # zero the padded rows' targets: retrieval_metrics then drops
            # them from the mean (users with no targets are excluded)
            valid = batch["valid"][:, None]
            metrics = retrieval_metrics(
                jnp.asarray(pred_ids),
                jnp.asarray(batch["target_ids"] * valid),
                jnp.asarray(batch["target_ratings"] * valid),
                top_k=top_k,
                prefix=f"{subset}/",
            )
            weight = int(batch["valid"].sum())
            for key, value in metrics.items():
                totals[key] = totals.get(key, 0.0) + float(value) * weight
            count += weight
        return {key: value / max(count, 1) for key, value in totals.items()}

    def _eval_losses(self, subset: str) -> dict[str, float]:
        """Average the full loss family over held-out interaction batches
        (the reference logs all losses at every val/test step,
        lightning.py:194-206)."""
        limit = self.trainer_config.limit_val_loss_batches
        totals: dict[str, float] = {}
        count = 0
        for batch_idx, batch in enumerate(
            self.data.eval_interaction_batches(subset)
        ):
            if limit is not None and batch_idx >= limit:
                break
            losses = self._eval_step(self.state, self._place_batch(batch))
            for name, value in losses.items():
                totals[name] = totals.get(name, 0.0) + float(value)
            count += 1
        return {
            f"{subset}/{name}": value / count
            for name, value in totals.items()
        } if count else {}

    def validate(self) -> dict[str, float]:
        metrics = self._eval_retrieval("val")
        metrics.update(self._eval_losses("val"))
        self.logger.log_metrics(metrics, self.global_step)
        logger.info("step %d val: %s", self.global_step, metrics)
        return metrics

    def test(self) -> dict[str, float]:
        metrics = self._eval_retrieval("test")
        metrics.update(self._eval_losses("test"))
        self.logger.log_metrics(metrics, self.global_step)
        return metrics

    def predict(
        self,
        output_path: str | pathlib.Path | None = None,
        *,
        top_k: int | None = None,
    ):
        """Full-cohort predict: top-k recommendations for every is_predict
        user, written to parquet (the reference's predict stage runs every
        predict-dataloader user through recommend —
        /root/reference/xfmr_rec/data/lightning.py:469-471,
        lightning.py:204-206). Returns the predictions DataFrame.

        Exclusions match `recommend_with_user` semantics: the user's train
        history (eval_batches already carries it as exclude_positions).
        """
        import pandas as pd

        self.setup()
        self.build_index()
        top_k = top_k or self.config.top_k
        user_ids: list[int] = []
        rec_ids: list[np.ndarray] = []
        rec_scores: list[np.ndarray] = []
        for batch in self.data.eval_batches("predict"):
            users = self._eval_user_embeds(batch)
            if self._sharded_corpus is not None:
                scores, pred_ids = self._sharded_search(users, batch, top_k)
            else:
                scores, pred_ids = self.index.search(
                    users,
                    top_k=top_k,
                    exclude_positions=batch["exclude_positions"],
                )
                scores = np.asarray(scores)
            valid = np.asarray(batch["valid"])
            upos = np.asarray(batch["user_pos"])[valid]
            user_ids.extend(int(u) for u in self.data.user_ids[upos])
            rec_ids.extend(np.asarray(pred_ids)[valid])
            rec_scores.extend(np.asarray(scores)[valid])
        frame = pd.DataFrame(
            {
                "user_id": user_ids,
                "rec_item_ids": [row.tolist() for row in rec_ids],
                "rec_scores": [row.tolist() for row in rec_scores],
            }
        )
        if output_path is not None:
            output_path = pathlib.Path(output_path)
            output_path.parent.mkdir(parents=True, exist_ok=True)
            frame.to_parquet(output_path, index=False)
            logger.info(
                "predictions for %d users written to %s",
                len(frame),
                output_path,
            )
        return frame

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def embed_texts(self, texts: list[str]) -> np.ndarray:
        tokens = self.data.tokenizer.encode_batch(
            texts, self.config.max_length
        )
        return self._encode_rows(tokens)

    def recommend(
        self,
        texts: list[str],
        *,
        top_k: int | None = None,
        exclude_ids: list[list[int]] | None = None,
    ) -> list[list[dict[str, Any]]]:
        """Embed texts and retrieve top-k items (history exclusions by id)."""
        if self.index is None:
            self.build_index()
        embeds = self.embed_texts(texts)
        if self.config.item_bias:
            # raw text queries score as dot + b_i via the constant-1 col
            embeds = np.concatenate(
                [embeds, np.ones((len(embeds), 1), embeds.dtype)], axis=1
            )
        embeds = self._augment_query(embeds, None)
        scores, item_ids = self.index.search(
            embeds, top_k=top_k or self.config.top_k, exclude_ids=exclude_ids
        )
        return self._format_candidates(scores, item_ids)

    def eval_user_embeddings(self, user_pos: np.ndarray) -> np.ndarray:
        """Embeddings of dataset users by position — rides the same path
        as eval/serving (text tower, or history fusion over the corpus)."""
        if self.index is None:
            self.build_index()
        batch: dict[str, np.ndarray] = {
            "user_tokens": self.data.user_tokens[user_pos],
            "user_pos": np.asarray(user_pos),
        }
        if self.config.user_tower == "history":
            hist_pos = self.data.user_hist_pos[user_pos]
            batch["hist_positions"] = np.maximum(hist_pos, 0)
            batch["hist_mask"] = hist_pos >= 0
            batch["hist_ratings"] = self.data.user_hist_rating[user_pos]
        if self.config.max_bag > 0:
            bag_pos = self.data.user_bag_pos[user_pos]
            bag_mask = bag_pos >= 0
            batch["bag_rns"] = ((bag_pos + 1) * bag_mask).astype(np.int32)
            batch["bag_ratings"] = self.data.user_bag_rating[user_pos]
            batch["bag_mask"] = bag_mask
        return self._eval_user_embeds(batch)

    def recommend_users(
        self,
        user_pos: np.ndarray,
        *,
        top_k: int | None = None,
        exclude_ids: list[list[int]] | None = None,
    ) -> list[list[dict[str, Any]]]:
        """Top-k recommendations for dataset users by position."""
        embeds = self.eval_user_embeddings(np.asarray(user_pos))
        scores, item_ids = self.index.search(
            embeds, top_k=top_k or self.config.top_k, exclude_ids=exclude_ids
        )
        return self._format_candidates(scores, item_ids)

    def _format_candidates(
        self, scores: np.ndarray, item_ids: np.ndarray
    ) -> list[list[dict[str, Any]]]:
        results = []
        for row_scores, row_ids in zip(scores, item_ids):
            results.append(
                [
                    {
                        "movie_id": int(i),
                        "score": float(s),
                        **self.index.get_id(int(i)),
                    }
                    for s, i in zip(row_scores, row_ids)
                ]
            )
        return results

    # ------------------------------------------------------------------
    # checkpointing + artifact
    # ------------------------------------------------------------------
    def _ckpt_path(self, name: str) -> pathlib.Path:
        # a path-like name ("runs/<run>/ckpt/best", absolute paths)
        # resolves as given — the CLI's documented restore form; bare
        # names ("best"/"last") ALWAYS live under this run's ckpt dir
        # (never CWD-relative: save_checkpoint("best") must not be able
        # to clobber an unrelated ./best entry)
        if "/" in str(name):
            return pathlib.Path(name).absolute()
        base = self.trainer_config.ckpt_dir or (self.logger.log_dir / "ckpt")
        return pathlib.Path(base).absolute() / name

    def save_checkpoint(self, name: str = "last") -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_path(name)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    "params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "step": self.global_step,
                    "best_metric": float(self.best_metric),
                },
                force=True,
            )

    def restore_checkpoint(self, name: str = "last") -> None:
        import orbax.checkpoint as ocp

        self.setup()
        path = self._ckpt_path(name)
        with ocp.StandardCheckpointer() as ckptr:
            template = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": 0,
                "best_metric": 0.0,
            }
            restored = ckptr.restore(path, template)
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"]
        )
        self.global_step = int(restored["step"])
        self.best_metric = float(restored["best_metric"])

    def save(self, path: str | pathlib.Path) -> None:
        """Write the deployable serving artifact (encoder + index + config)."""
        from flax import serialization

        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        # ONE device->host fetch shared by the msgpack and portable
        # writers: back-to-back multi-GB fetches through the relay are
        # the documented deadlock pattern (BENCH_NOTES round 5)
        params_host = jax.device_get(self.state.params)
        (path / "encoder.msgpack").write_bytes(
            serialization.to_bytes(params_host)
        )
        (path / PROCESSORS_JSON).write_text(
            json.dumps(
                {
                    "model": self.config.model_dump(),
                    "data": self.data.config.model_dump(),
                    "step": self.global_step,
                    "best_metric": float(self.best_metric),
                },
                indent=2,
            )
        )
        if self.index is None:
            self.build_index()
        self.index.save(path / "index")
        if self.cf is not None:
            # CF factors ride the artifact: the serving engine rebuilds
            # each query's CF vector from its history movie_ids (works
            # for dataset AND never-seen users alike)
            self.cf.save(path / "cf.npz")
        # corpus-trained vocab rides the artifact so serving tokenizes
        # byte-identically (tokenizer="vocab" only; hashing is stateless)
        if hasattr(self.data.tokenizer, "vocab"):
            self.data.tokenizer.save(path / "vocab.json")
        # user table for id-based serving lookups
        self.data.users_frame.to_parquet(path / "users.parquet", index=False)
        # portable (NumPy-only) inference export of the text tower —
        # the TPU-native counterpart of the reference's ONNX serving
        # backend (bentoml/service.py:91); see serving/portable.py
        from xfmr_rec_tpu.models.history import needs_two_tower
        from xfmr_rec_tpu.serving.portable import write_portable

        text_params = (
            params_host["text"]
            if needs_two_tower(self.config)
            else params_host
        )
        write_portable(
            text_params,
            self.config.model_dump(),
            self.data.config.model_dump(),
            path,
        )
