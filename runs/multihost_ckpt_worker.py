"""One process of a simulated multi-host checkpoint/resume cycle.

Usage: python runs/multihost_ckpt_worker.py <pid> <nproc> <port> <dir> <phase>

Phases (driven by tests/test_multihost.py::test_two_process_ckpt_resume):

- ``control``: train 3 steps straight through, print step-3 loss.
- ``crash``:   train 2 steps, checkpoint the sharded state via orbax
  (every process participates in the save, as on a real pod), then run
  one MORE step without saving and exit — the work since the last
  checkpoint is lost, simulating a failure between checkpoints.
- ``resume``:  restore the step-2 checkpoint into a FRESH process group
  and train step 3.

The test asserts resume's step-3 loss equals control's bit-for-bit on
both processes: the elastic-recovery contract (reference counterpart:
Ray's checkpoint restore on trial restart, ray.py:60-64, which has no
test). Batches are derived per-step from a seeded rng so every phase
sees identical data; the dropout rng folds from the restored step, so
exact equality is the expected outcome, not a tolerance check.
"""

from __future__ import annotations

import os
import pathlib
import sys


def _steps(step_fn, state, full_batches, to_global, lo, hi):
    import jax

    metrics = None
    for i in range(lo, hi):
        batch = {k: to_global(v) for k, v in full_batches[i].items()}
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics)
    return state, metrics


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir, phase = pathlib.Path(sys.argv[4]).resolve(), sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from xfmr_rec_tpu.parallel import create_mesh, make_sharded_train_step
    from xfmr_rec_tpu.parallel.mesh import batch_spec, initialize_distributed
    from xfmr_rec_tpu.training.module import TrainConfig, create_train_state

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.device_count() == 4 * nproc

    mesh = create_mesh(model_parallel=2)
    config = TrainConfig(
        vocab_size=300,
        max_position_embeddings=16,
        max_length=8,
        compute_dtype="float32",
    )
    _, state = create_train_state(config, rng=0)
    replicated = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            replicated, np.asarray(x)
        ),
        state,
    )
    step_fn = make_sharded_train_step(config, mesh)

    batch_size = 4 * jax.device_count()
    spec = batch_spec()
    local = batch_size // nproc

    def make_batch(step):
        rng = np.random.default_rng(100 + step)  # same on every process
        return {
            "user_tokens": rng.integers(1, 300, (batch_size, 8)).astype(
                np.int32
            ),
            "item_tokens": rng.integers(1, 300, (batch_size, 8)).astype(
                np.int32
            ),
            "neg_item_tokens": rng.integers(
                1, 300, (batch_size, 8)
            ).astype(np.int32),
            "target": rng.integers(1, 6, batch_size).astype(np.float32),
            "item_idx": rng.integers(1, 100, 2 * batch_size).astype(
                np.int64
            ),
            "pos_idx": rng.integers(0, 100, (batch_size, 4)).astype(
                np.int64
            ),
            "log_q": rng.normal(size=2 * batch_size).astype(np.float32),
        }

    def to_global(value):
        sharding = NamedSharding(
            mesh, P(*([spec[0]] + [None] * (value.ndim - 1)))
        )
        rows = value.shape[0]
        per = rows // nproc
        return jax.make_array_from_process_local_data(
            sharding, value[pid * per : (pid + 1) * per], value.shape
        )

    batches = {i: make_batch(i) for i in range(3)}
    path = ckpt_dir / "step2"

    import orbax.checkpoint as ocp

    if phase == "control":
        state, metrics = _steps(step_fn, state, batches, to_global, 0, 3)
    elif phase == "crash":
        state, _ = _steps(step_fn, state, batches, to_global, 0, 2)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": int(state.step),
                },
            )
        # one more step whose result is deliberately never saved — this
        # is the "lost work" a failure between checkpoints destroys
        state, metrics = _steps(step_fn, state, batches, to_global, 2, 3)
    elif phase == "resume":
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(
                path,
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": 0,
                },
            )
        state = state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        assert int(state.step) == 2, int(state.step)
        state, metrics = _steps(step_fn, state, batches, to_global, 2, 3)
    else:  # pragma: no cover - driver bug
        msg = f"unknown phase {phase}"
        raise SystemExit(msg)

    loss = float(metrics["train/PairwiseHingeLoss"])
    assert np.isfinite(loss)
    assert int(state.step) == 3, int(state.step)
    print(
        f"OK-CKPT pid={pid} phase={phase} devices={jax.device_count()} "
        f"loss={loss!r}"
    )


if __name__ == "__main__":
    main()
