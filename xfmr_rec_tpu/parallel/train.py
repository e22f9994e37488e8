"""Sharded training step: pure data parallelism over the full mesh.

The reference scales training with torch DDP under Ray
(/root/reference/xfmr_rec/ray.py:40-51, single worker by default). Here
the same capability is a jit with sharding annotations: params replicated,
batch sharded over every mesh axis, XLA emitting the gradient all-reduce
over ICI. No process groups, no launcher — the same step function runs on
1 chip or a pod slice.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xfmr_rec_tpu.training.module import TrainConfig, make_train_step


def make_sharded_train_step(config: TrainConfig, mesh: Mesh):
    """Jit the train step with replicated-state output constraints.

    Inputs are placed by `parallel.mesh.shard_batch` (batch) and
    `parallel.mesh.replicate` (state); outputs are constrained replicated
    so the gradient reduction happens inside the step.
    """
    step = make_train_step(config)
    replicated = NamedSharding(mesh, P())
    return jax.jit(step, donate_argnums=0, out_shardings=replicated)
