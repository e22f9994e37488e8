"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's distributed story (torch
DDP via Ray, /root/reference/xfmr_rec/ray.py:40-51): no process groups or
custom transport — a `jax.sharding.Mesh` over the chips, shardings
annotated at jit boundaries, XLA inserting the collectives over ICI.

Mesh convention:
- axis "data": data parallelism (batch sharded, grads all-reduced).
- axis "model": corpus parallelism for retrieval — the item-embedding
  matrix is sharded along items and top-k merges via all-gather
  (parallel/retrieval.py). During training the same axis is folded into
  data parallelism (batch shards over both axes) so no chip idles.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host setup: call once per host before creating the mesh.

    Thin wrapper over `jax.distributed.initialize` (auto-detecting on TPU
    pods when no args are given). After this, `jax.devices()` spans all
    hosts and the same mesh/jit code scales across DCN — the TPU-native
    replacement for the reference's Ray worker orchestration (ray.py).
    """
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def create_mesh(
    n_devices: int | None = None, model_parallel: int = 1
) -> Mesh:
    """Mesh of shape (data = n/model_parallel, model = model_parallel)."""
    devices = jax.devices()
    n_devices = n_devices or len(devices)
    if n_devices % model_parallel != 0:
        msg = f"{n_devices=} not divisible by {model_parallel=}"
        raise ValueError(msg)
    if n_devices > len(devices):
        msg = (
            f"create_mesh asked for {n_devices} devices but only "
            f"{len(devices)} are visible on platform "
            f"'{devices[0].platform}'. For a virtual multi-device mesh set "
            "JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} before the "
            "first jax device query (see tests/conftest.py)."
        )
        raise ValueError(msg)
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Training batches shard their leading axis over every mesh axis."""
    return P((DATA_AXIS, MODEL_AXIS))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, leading axis sharded over all
    devices (pure data parallelism for the train step)."""
    spec = batch_spec()
    out = {}
    for key, value in batch.items():
        sharding = NamedSharding(mesh, P(*([spec[0]] + [None] * (value.ndim - 1))))
        out[key] = jax.device_put(value, sharding)
    return out


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
