"""Mesh-sharded retrieval index: one logical index over many chips.

`ShardedRetrievalIndex` presents the same host-facing surface as
`RetrievalIndex` (search / search_certified / get_id / positions_of /
search_text / save / load) but keeps the item-embedding corpus sharded
along items over the "model" axis of a `jax.sharding.Mesh` — each chip
holds N/m rows in its own HBM, sweeps them with the packed-key Pallas
scan, and the per-shard candidate sets merge in key space with one
all-gather over ICI (O(B * (k+E) * m) bytes, never the (B, N) score
matrix). This is the scale-out story the reference lacks entirely: its
LanceDB ANN index (data/lightning.py:183-259) is a single-host CPU
structure, so its catalog ceiling is one machine's RAM — here the
ceiling is the mesh's aggregate HBM, with exactness certificates intact
across shards.

Compute paths are parallel/retrieval.py's shard_map primitives; the
class adds corpus placement, shard-balancing padding, id/metadata
handling and jit caching.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xfmr_rec_tpu.index.mips import CorpusMetadata
from xfmr_rec_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh
from xfmr_rec_tpu.parallel.retrieval import (
    sharded_packed_certified_topk,
    sharded_packed_guaranteed_topk,
    sharded_packed_topk_excluding,
    sharded_topk,
)

NEG_INF = float("-inf")


class ShardedRetrievalIndex(CorpusMetadata):
    """Item corpus sharded over the mesh's model axis, exact search.

    Args:
        embeddings: (N, D) float array (host or device).
        ids: (N,) item ids aligned with rows.
        metadata: optional per-row dicts (drives get_id / search_text).
        mesh: the device mesh; defaults to a pure model-parallel mesh
            over every visible device (`create_mesh(model_parallel=m)`).
            On a 2-D mesh (data d x model m) queries shard over the
            data axis too: per-device work is (B/d, N/m) and search
            throughput scales with the whole mesh, not just the
            catalog axis (batches pad to a multiple of d).
        dtype: corpus storage dtype. "int8" composes per-item symmetric
            quantization (same scheme as the single-chip index: search
            is exact over the quantized corpus, certificates hold) with
            item sharding — 2x items per chip TIMES the mesh size.
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        ids: np.ndarray,
        metadata: list[dict] | None = None,
        *,
        mesh: Mesh | None = None,
        model_parallel: int | None = None,
        id_col: str = "id",
        dtype: str = "bfloat16",
    ) -> None:
        if embeddings.shape[0] != len(ids):
            msg = "embeddings and ids must align"
            raise ValueError(msg)
        if dtype not in ("bfloat16", "float32", "int8"):
            msg = f"unsupported sharded corpus dtype {dtype!r}"
            raise ValueError(msg)
        if mesh is None:
            mesh = create_mesh(
                model_parallel=model_parallel or len(jax.devices())
            )
        self.mesh = mesh
        self.num_shards = mesh.shape[MODEL_AXIS]
        # 2-D mesh serving: queries shard over the data axis (per-device
        # work (B/d, N/m)); the search methods pad batches to a multiple
        # of d so the sharding always engages
        self._data_size = mesh.shape.get(DATA_AXIS, 1)
        self.id_col = id_col
        self.ids = np.asarray(ids)
        self.metadata = metadata or [{} for _ in self.ids]
        self._id_to_pos = {int(i): p for p, i in enumerate(self.ids)}
        self.dtype = dtype

        emb = np.asarray(embeddings, dtype=np.float32)
        self._true_n = emb.shape[0]
        # shard-balancing zero rows: the shard_map primitives require
        # N % m == 0; pad rows are masked in-graph (true_num_items)
        pad = -self._true_n % self.num_shards
        if pad:
            emb = np.pad(emb, ((0, pad), (0, 0)))
        self._padded_n = emb.shape[0]
        sharding = NamedSharding(mesh, P(MODEL_AXIS, None))
        scale_sharding = NamedSharding(mesh, P(None, MODEL_AXIS))
        if dtype == "int8":
            # per-item symmetric quantization (mirrors RetrievalIndex):
            # c_i ~= scale_i * q_i; the Pallas scan dequantizes tiles in
            # VMEM, so exactness/certificates hold over the quantized
            # scores
            scale = np.abs(emb).max(axis=1) / 127.0
            scale = np.maximum(scale, 1e-12)
            quant = np.clip(
                np.round(emb / scale[:, None]), -127, 127
            ).astype(np.int8)
            self.corpus = jax.device_put(quant, sharding)
            self.scales = jax.device_put(
                scale.reshape(1, -1).astype(np.float32), scale_sharding
            )
            self._query_dtype = jnp.bfloat16
            norms = np.linalg.norm(quant.astype(np.float32), axis=1) * scale
            self._corpus_maxnorm = float(norms.max(initial=0.0))
        else:
            self.corpus = jax.device_put(emb.astype(dtype), sharding)
            self.scales = None
            self._query_dtype = self.corpus.dtype
            self._corpus_maxnorm = float(
                np.linalg.norm(emb, axis=1).max(initial=0.0)
            )
        true_n = None if pad == 0 else self._true_n

        self._search_fn = jax.jit(
            lambda q, excl, k, bound, c, s: sharded_packed_topk_excluding(
                q,
                c,
                k,
                mesh,
                exclude_positions=excl,
                score_bound=bound,
                true_num_items=true_n,
                scales=s,
            ),
            static_argnames=("k",),
        )
        self._certified_fn = jax.jit(
            lambda q, k, bound, c, s: sharded_packed_certified_topk(
                q,
                c,
                k,
                mesh,
                score_bound=bound,
                true_num_items=true_n,
                scales=s,
            ),
            static_argnames=("k",),
        )
        self._guaranteed_fn = jax.jit(
            lambda q, k, bound, c, s: sharded_packed_guaranteed_topk(
                q,
                c,
                k,
                mesh,
                score_bound=bound,
                true_num_items=true_n,
                scales=s,
            ),
            static_argnames=("k",),
        )
        self._dense_fn = jax.jit(
            lambda q, k, c, s: sharded_topk(
                q, c, k, mesh, true_num_items=true_n, scales=s
            ),
            static_argnames=("k",),
        )

    @property
    def dim(self) -> int:
        return self.corpus.shape[1]

    def _ids_at(
        self, scores: np.ndarray, positions: np.ndarray
    ) -> np.ndarray:
        """Map global positions to item ids; -inf rows (masked pads /
        exhausted exclusion pools) become id -1, the engine's
        no-candidate sentinel."""
        safe = np.clip(positions, 0, self._true_n - 1)
        item_ids = self.ids[safe].astype(np.int64)
        invalid = (positions >= self._true_n) | ~np.isfinite(scores)
        return np.where(invalid, -1, item_ids)

    def _pad_batch(self, queries, exclude_positions=None):
        """Pad the batch so every data shard tiles the Pallas scan
        cleanly: a multiple of 8*d, and of 128*d once per-shard rows
        exceed the default batch tile (zero-query pad rows certify
        trivially and are stripped by the caller). Pow2-ish padding also
        keeps the jit shape cache bounded."""
        batch = queries.shape[0]
        d = self._data_size
        unit = 8 * d
        padded = -(-max(batch, 8) // unit) * unit
        if padded // d > 128 and (padded // d) % 128:
            unit = 128 * d
            padded = -(-padded // unit) * unit
        pad = padded - batch
        if pad:
            queries = jnp.pad(queries, ((0, pad), (0, 0)))
            if exclude_positions is not None:
                exclude_positions = jnp.pad(
                    exclude_positions,
                    ((0, pad), (0, 0)),
                    constant_values=self._true_n,
                )
        return queries, exclude_positions, batch

    def _score_bound(self, queries: Array) -> Array:
        # ON DEVICE (see RetrievalIndex.search): a host qnorm would sync
        qnorm = jnp.max(jnp.linalg.norm(queries.astype(jnp.float32), axis=-1))
        return jnp.maximum(self._corpus_maxnorm * qnorm * 1.05, 1e-6).astype(
            jnp.float32
        )

    def search(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        exclude_ids: list[list[int]] | None = None,
        exclude_positions: np.ndarray | Array | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched search. Returns (scores (B, k), item_ids (B, k))."""
        queries = jnp.asarray(queries, dtype=self._query_dtype)
        if queries.ndim == 1:
            queries = queries[None, :]
        if exclude_positions is None:
            if exclude_ids is not None:
                exclude_positions = jnp.asarray(self.positions_of(exclude_ids))
            else:
                exclude_positions = jnp.full(
                    (queries.shape[0], 1), self._true_n, dtype=jnp.int32
                )
        exclude_positions = jnp.asarray(exclude_positions, dtype=jnp.int32)
        queries, exclude_positions, batch = self._pad_batch(
            queries, exclude_positions
        )
        bound = self._score_bound(queries)
        scores, positions = self._search_fn(
            queries, exclude_positions, top_k, bound, self.corpus, self.scales
        )
        scores = np.asarray(scores)[:batch]
        positions = np.asarray(positions)[:batch]
        return scores, self._ids_at(scores, positions)

    def search_certified(
        self,
        queries: np.ndarray | Array,
        *,
        top_k: int,
        method: str = "fused",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Guaranteed-exact batched search across the mesh (no exclusions).

        method="fused" (default, mirrors the single-chip flagship): the
        whole escalation — keep-3 certified sweep per shard, key-space
        ICI merge, in-graph lane-shuffled retries with the
        min-over-passes pmax-composed certificate — runs as ONE jit
        dispatch (`sharded_packed_guaranteed_topk`); only the rare
        residual re-runs on the dense sharded path. method="packed" is
        pass 1 only + dense fallback for every uncertified row.
        Exactness is at the key quantum, as on one chip.
        """
        if method not in ("fused", "packed"):
            msg = f"unknown certified search method {method!r}"
            raise ValueError(msg)
        queries = jnp.asarray(queries, dtype=self._query_dtype)
        if queries.ndim == 1:
            queries = queries[None, :]
        queries, _, batch = self._pad_batch(queries)
        bound = self._score_bound(queries)
        fn = self._guaranteed_fn if method == "fused" else self._certified_fn
        scores, positions, exact = fn(
            queries, top_k, bound, self.corpus, self.scales
        )
        scores = np.array(scores)[:batch]
        positions = np.array(positions)[:batch]
        exact = np.asarray(exact)[:batch]
        bad = np.nonzero(~exact)[0]
        self.last_certified_stats = {
            "batch": batch,
            "pass1_bad": int(bad.size),
        }
        if bad.size:
            width = max(
                self._data_size, 1 << (int(bad.size) - 1).bit_length()
            )
            width += -width % self._data_size
            retry = np.zeros((width, self.dim), dtype=np.float32)
            retry[: bad.size] = np.asarray(queries, np.float32)[bad]
            s, p = self._dense_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                self.corpus,
                self.scales,
            )
            scores[bad] = np.asarray(s)[: bad.size]
            positions[bad] = np.asarray(p)[: bad.size]
        return scores, self._ids_at(scores, positions)

    # -- persistence (same artifact layout as RetrievalIndex) -------------
    def save(self, path: str | pathlib.Path) -> None:
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        embeddings = np.asarray(
            self.corpus[: self._true_n], dtype=np.float32
        )
        if self.scales is not None:
            # dequantize: re-quantizing these exact values reproduces
            # the same int8 corpus (round is idempotent at grid points)
            embeddings = (
                embeddings * np.asarray(self.scales)[0][: self._true_n, None]
            )
        np.savez(path / "corpus.npz", embeddings=embeddings, ids=self.ids)
        meta = {
            "id_col": self.id_col,
            "dtype": self.dtype,
            "chunk_size": None,
            "method": "scan",
            "scan_kernel": "packed",
            "kind": "sharded",
            "metadata": self.metadata,
        }
        (path / "index.json").write_text(json.dumps(meta))

    @classmethod
    def load(
        cls,
        path: str | pathlib.Path,
        *,
        mesh: Mesh | None = None,
        model_parallel: int | None = None,
    ) -> ShardedRetrievalIndex:
        """Load any RetrievalIndex-format artifact onto the mesh — the
        single-chip and sharded indexes share one on-disk layout, so an
        artifact trained anywhere serves at any mesh size."""
        path = pathlib.Path(path)
        arrays = np.load(path / "corpus.npz", allow_pickle=False)
        meta = json.loads((path / "index.json").read_text())
        dtype = meta.get("dtype", "bfloat16")
        if dtype not in ("bfloat16", "float32", "int8"):
            dtype = "bfloat16"
        return cls(
            arrays["embeddings"],
            arrays["ids"],
            metadata=meta["metadata"],
            mesh=mesh,
            model_parallel=model_parallel,
            id_col=meta["id_col"],
            dtype=dtype,
        )
