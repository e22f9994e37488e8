"""One process of a simulated multi-host data-parallel training step.

Usage: python runs/multihost_worker.py <process_id> <num_processes> <port>

Each process exposes 4 virtual CPU devices; `jax.distributed.initialize`
joins them into one 4*num_processes-device system, and the SAME mesh +
sharded train step used on a single host runs globally — gradients
all-reduce across process boundaries (the DCN path on real pods). This
is the TPU-native counterpart of the reference's Ray multi-worker DDP
(ray.py:105-124), validated in simulation by tests/test_multihost.py.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    from xfmr_rec_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.local_devices()) == 4
    assert jax.device_count() == 4 * nproc, jax.device_count()

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xfmr_rec_tpu.parallel import create_mesh, make_sharded_train_step
    from xfmr_rec_tpu.parallel.mesh import batch_spec
    from xfmr_rec_tpu.training.module import (
        TrainConfig,
        create_train_state,
    )

    mesh = create_mesh(model_parallel=2)
    config = TrainConfig(
        vocab_size=300,
        max_position_embeddings=16,
        max_length=8,
        compute_dtype="float32",
    )
    # identical rng on every process -> identical initial state; the
    # replicated global arrays are assembled from the local copies
    _, state = create_train_state(config, rng=0)
    replicated = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            replicated, np.asarray(x)
        ),
        state,
    )
    step = make_sharded_train_step(config, mesh)

    batch_size = 4 * jax.device_count()  # global
    rng = np.random.default_rng(0)  # same batch derivation everywhere
    full = {
        "user_tokens": rng.integers(1, 300, (batch_size, 8)).astype(
            np.int32
        ),
        "item_tokens": rng.integers(1, 300, (batch_size, 8)).astype(
            np.int32
        ),
        "neg_item_tokens": rng.integers(1, 300, (batch_size, 8)).astype(
            np.int32
        ),
        "target": rng.integers(1, 6, batch_size).astype(np.float32),
        "item_idx": rng.integers(1, 100, 2 * batch_size).astype(np.int64),
        "pos_idx": rng.integers(0, 100, (batch_size, 4)).astype(np.int64),
        "log_q": rng.normal(size=2 * batch_size).astype(np.float32),
    }
    spec = batch_spec()
    local = batch_size // nproc

    def to_global(value):
        sharding = NamedSharding(
            mesh, P(*([spec[0]] + [None] * (value.ndim - 1)))
        )
        return jax.make_array_from_process_local_data(
            sharding,
            value[pid * local : (pid + 1) * local]
            if value.shape[0] == batch_size
            else value[
                pid * (value.shape[0] // nproc) : (pid + 1)
                * (value.shape[0] // nproc)
            ],
            value.shape,
        )

    batch = {k: to_global(v) for k, v in full.items()}
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    loss = float(metrics["train/PairwiseHingeLoss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1
    print(f"OK pid={pid} devices={jax.device_count()} loss={loss:.6f}")

    # --- history user tower (models/history.py) across processes ------
    # the (B, H, L) history tokens shard over the same global batch axis;
    # the fused step's gradient all-reduce crosses the process boundary
    hist_config = config.model_copy(
        update={"user_tower": "history", "max_history": 3}
    )
    _, hist_state = create_train_state(hist_config, rng=0)
    hist_state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            replicated, np.asarray(x)
        ),
        hist_state,
    )
    hist_step = make_sharded_train_step(hist_config, mesh)
    hist_full = dict(full)
    hist_full["hist_tokens"] = rng.integers(
        1, 300, (batch_size, 3, 8)
    ).astype(np.int32)
    hist_full["hist_mask"] = rng.random((batch_size, 3)) < 0.7
    hist_full["hist_ratings"] = rng.integers(
        0, 6, (batch_size, 3)
    ).astype(np.int32)
    hist_batch = {k: to_global(v) for k, v in hist_full.items()}
    hist_state, hist_metrics = hist_step(hist_state, hist_batch)
    jax.block_until_ready(hist_metrics)
    hist_loss = float(hist_metrics["train/PairwiseHingeLoss"])
    assert np.isfinite(hist_loss)
    print(f"OKHIST pid={pid} loss={hist_loss:.6f}")

    # --- sharded retrieval across process boundaries (VERDICT r2 #8) --
    # The corpus shards over the "model" mesh axis, which spans BOTH
    # processes here, so the all-gather candidate merge and the pmax
    # certificate reduction cross the process boundary (the DCN path on
    # real pods).
    from xfmr_rec_tpu.parallel.retrieval import (
        sharded_packed_certified_topk,
        sharded_topk,
    )

    n_items, dim, top_k = 256, 16, 10
    rng2 = np.random.default_rng(1)  # identical on every process
    corpus = rng2.normal(size=(n_items, dim)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    queries = rng2.normal(size=(8, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    corpus_g = jax.make_array_from_callback(
        corpus.shape,
        NamedSharding(mesh, P("model", None)),
        lambda idx: corpus[idx],
    )
    queries_g = jax.make_array_from_callback(
        queries.shape, replicated, lambda idx: queries[idx]
    )
    scores, positions = sharded_topk(queries_g, corpus_g, top_k, mesh)
    dense = queries @ corpus.T
    want_pos = np.argsort(-dense, axis=-1)[:, :top_k]
    got_pos = np.asarray(positions)
    for b in range(len(queries)):
        assert set(got_pos[b]) == set(want_pos[b]), (
            f"sharded_topk row {b} mismatch"
        )
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(dense, got_pos, axis=-1),
        rtol=1e-5,
        atol=1e-5,
    )

    pscores, ppos, pexact = sharded_packed_certified_topk(
        queries_g,
        corpus_g,
        top_k,
        mesh,
        score_bound=1.0,
        batch_tile=8,
        corpus_tile=64,
    )
    pexact = np.asarray(pexact)
    ppos = np.asarray(ppos)
    assert pexact.any(), "no row certified across the 2-process mesh"
    for b in np.flatnonzero(pexact):
        want = np.sort(dense[b])[-top_k:]
        got = np.sort(dense[b][ppos[b]])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    # --- exclusion search with 2-D sharding across processes (round 3):
    # queries shard over the data axis (which also spans processes) and
    # the corpus over model — the serving hot path's full distribution.
    from xfmr_rec_tpu.parallel.retrieval import (
        sharded_packed_topk_excluding,
    )

    excl = want_pos[:, :3].astype(np.int32)  # ban each row's true top-3
    excl_g = jax.make_array_from_callback(
        excl.shape, replicated, lambda idx: excl[idx]
    )
    escores, epos = sharded_packed_topk_excluding(
        queries_g,
        corpus_g,
        top_k,
        mesh,
        exclude_positions=excl_g,
        score_bound=1.0,
        batch_tile=8,
        corpus_tile=64,
        shard_queries=True,
    )
    # outputs are data-axis sharded across BOTH processes: gather the
    # global value (the caller-side contract for explicit shard_queries
    # on a multi-process mesh)
    from jax.experimental import multihost_utils

    epos = np.asarray(multihost_utils.process_allgather(epos, tiled=True))
    dense_excl = dense.copy()
    np.put_along_axis(dense_excl, excl, -np.inf, axis=-1)
    for b in range(len(queries)):
        assert not set(excl[b]) & set(epos[b]), "excluded item returned"
        want = np.sort(dense_excl[b])[-top_k:]
        got = np.sort(dense_excl[b][epos[b]])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # --- guaranteed pipeline across processes (round 3): the in-graph
    # conditional retry rounds (lax.cond wrapping all-gather + pmax)
    # execute with a consensus predicate within each model group, so
    # the collectives stay aligned across the process boundary.
    from xfmr_rec_tpu.parallel.retrieval import (
        sharded_packed_guaranteed_topk,
    )

    gscores, gpos, gexact = sharded_packed_guaranteed_topk(
        queries_g,
        corpus_g,
        top_k,
        mesh,
        score_bound=1.0,
        batch_tile=8,
        corpus_tile=64,
        retry_width=8,
        shard_queries=False,
    )
    gexact = np.asarray(gexact)
    gpos = np.asarray(gpos)
    assert gexact.any(), "guaranteed pipeline certified nothing"
    for b in np.flatnonzero(gexact):
        want = np.sort(dense[b])[-top_k:]
        got = np.sort(dense[b][gpos[b]])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    print(
        f"OK-RETRIEVAL pid={pid} certified={int(pexact.sum())}/"
        f"{len(pexact)} excl-rows={len(queries)} "
        f"guaranteed={int(gexact.sum())}/{len(gexact)}"
    )


if __name__ == "__main__":
    main()
