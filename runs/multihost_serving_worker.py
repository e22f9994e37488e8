"""One process of a simulated multi-host SERVING deployment.

Usage: python runs/multihost_serving_worker.py <pid> <nproc> <port> <artifact>

Each process exposes 4 virtual CPU devices and joins a
4*nproc-device system via jax.distributed; a real
`RecommenderEngine(index_kind="sharded")` + `RecService` then serve a
/recommend_with_user_id request whose corpus scan + candidate merge
collectives SPAN THE PROCESS BOUNDARY (the DCN path on real pods), and
every process asserts the response against a dense numpy reference over
the packaged corpus. The reference's serving story is a single-host
BentoML graph (bentoml/service.py:184-311) — this is the scale-out
counterpart, validated end-to-end (VERDICT r3 next-step #6).
"""

from __future__ import annotations

import os
import pathlib
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    artifact = pathlib.Path(sys.argv[4])
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

    from xfmr_rec_tpu.serving.engine import RecommenderEngine
    from xfmr_rec_tpu.serving.service import RecService

    # every process runs the same program (SPMD): the engine's sharded
    # index places corpus shards across ALL processes' devices, and each
    # request's scan + merge collectives cross the process boundary
    engine = RecommenderEngine(
        artifact, warmup=False, index_kind="sharded"
    )
    assert engine.index.mesh.devices.size == 4 * nproc
    service = RecService(engine)

    top_k = 5
    user_id = sorted(engine._users_by_id)[0]
    user = engine.get_user(user_id)
    candidates = service.recommend_with_user_id(user_id=user_id, top_k=top_k)
    assert len(candidates) == top_k, candidates

    # dense reference over the packaged corpus, same exclusions as the
    # service (history + target), same query embedding path
    arrays = np.load(artifact / "index" / "corpus.npz", allow_pickle=False)
    emb = arrays["embeddings"].astype(np.float32)
    ids = np.asarray(arrays["ids"])
    query = np.asarray(
        engine.embed_user_query(user).embedding, dtype=np.float32
    )
    query = engine._pad_query_vec(query)
    dense = emb @ query
    excluded = {int(a.movie_id) for a in (user.history or [])} | {
        int(a.movie_id) for a in (user.target or [])
    }
    mask = np.isin(ids, np.asarray(sorted(excluded), dtype=ids.dtype))
    dense_excl = np.where(mask, -np.inf, dense)
    kth = np.sort(dense_excl)[-top_k]
    pos_of_id = {int(i): p for p, i in enumerate(ids)}

    got_ids = [c.movie_id for c in candidates]
    assert len(set(got_ids)) == top_k
    for cand in candidates:
        assert int(cand.movie_id) not in excluded, cand
        # exact up to the packed-key score quantum: every returned item
        # must score within one quantum of the dense kth-best
        dense_score = dense_excl[pos_of_id[int(cand.movie_id)]]
        assert dense_score >= kth - 2e-2, (
            f"id {cand.movie_id} dense {dense_score} < kth {kth}"
        )
        assert abs(float(cand.score) - dense_score) < 2e-2, cand

    print(
        f"OK-SERVE pid={pid} devices={jax.device_count()} "
        f"user={user_id} ids={sorted(got_ids)}"
    )


if __name__ == "__main__":
    main()
