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
from xfmr_rec_tpu.parallel.mesh import MODEL_AXIS, create_mesh
from xfmr_rec_tpu.parallel.retrieval import (
    sharded_packed_certified_topk,
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
        dtype: corpus storage dtype ("bfloat16" or "float32"); int8 is
            a single-chip capacity feature (RetrievalIndex) — sharding
            already multiplies capacity by the mesh size.
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
        if dtype not in ("bfloat16", "float32"):
            msg = f"unsupported sharded corpus dtype {dtype!r}"
            raise ValueError(msg)
        if mesh is None:
            mesh = create_mesh(
                model_parallel=model_parallel or len(jax.devices())
            )
        self.mesh = mesh
        self.num_shards = mesh.shape[MODEL_AXIS]
        self.id_col = id_col
        self.ids = np.asarray(ids)
        self.metadata = metadata or [{} for _ in self.ids]
        self._id_to_pos = {int(i): p for p, i in enumerate(self.ids)}
        self.dtype = dtype

        emb = np.asarray(embeddings, dtype=np.float32)
        self._true_n = emb.shape[0]
        self._corpus_maxnorm = float(
            np.linalg.norm(emb, axis=1).max(initial=0.0)
        )
        # shard-balancing zero rows: the shard_map primitives require
        # N % m == 0; pad rows are masked in-graph (true_num_items)
        pad = -self._true_n % self.num_shards
        if pad:
            emb = np.pad(emb, ((0, pad), (0, 0)))
        self._padded_n = emb.shape[0]
        sharding = NamedSharding(mesh, P(MODEL_AXIS, None))
        self.corpus = jax.device_put(emb.astype(dtype), sharding)
        self._query_dtype = self.corpus.dtype
        true_n = None if pad == 0 else self._true_n

        self._search_fn = jax.jit(
            lambda q, excl, k, bound, c: sharded_packed_topk_excluding(
                q,
                c,
                k,
                mesh,
                exclude_positions=excl,
                score_bound=bound,
                true_num_items=true_n,
            ),
            static_argnames=("k",),
        )
        self._certified_fn = jax.jit(
            lambda q, k, bound, c: sharded_packed_certified_topk(
                q,
                c,
                k,
                mesh,
                score_bound=bound,
                true_num_items=true_n,
            ),
            static_argnames=("k",),
        )
        self._dense_fn = jax.jit(
            lambda q, k, c: sharded_topk(
                q, c, k, mesh, true_num_items=true_n
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
        bound = self._score_bound(queries)
        scores, positions = self._search_fn(
            queries, exclude_positions, top_k, bound, self.corpus
        )
        scores = np.asarray(scores)
        positions = np.asarray(positions)
        return scores, self._ids_at(scores, positions)

    def search_certified(
        self, queries: np.ndarray | Array, *, top_k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Guaranteed-exact batched search across the mesh (no exclusions).

        Pass 1 is the sharded packed-key certified scan (per-shard
        discard-max keys pmax-composed over ICI against the merged tau);
        any uncertified rows re-run on the dense sharded path, which is
        exact by construction. Exactness is at the key quantum, as on
        one chip (`RetrievalIndex.search_certified(method="packed")`).
        """
        queries = jnp.asarray(queries, dtype=self._query_dtype)
        if queries.ndim == 1:
            queries = queries[None, :]
        bound = self._score_bound(queries)
        scores, positions, exact = self._certified_fn(
            queries, top_k, bound, self.corpus
        )
        scores = np.array(scores)
        positions = np.array(positions)
        exact = np.asarray(exact)
        bad = np.nonzero(~exact)[0]
        self.last_certified_stats = {
            "batch": int(queries.shape[0]),
            "pass1_bad": int(bad.size),
        }
        if bad.size:
            width = max(8, 1 << (int(bad.size) - 1).bit_length())
            retry = np.zeros((width, self.dim), dtype=np.float32)
            retry[: bad.size] = np.asarray(queries, np.float32)[bad]
            s, p = self._dense_fn(
                jnp.asarray(retry, dtype=self._query_dtype),
                top_k,
                self.corpus,
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
        if dtype not in ("bfloat16", "float32"):
            dtype = "bfloat16"  # int8 artifacts re-expand when sharded
        return cls(
            arrays["embeddings"],
            arrays["ids"],
            metadata=meta["metadata"],
            mesh=mesh,
            model_parallel=model_parallel,
            id_col=meta["id_col"],
            dtype=dtype,
        )
