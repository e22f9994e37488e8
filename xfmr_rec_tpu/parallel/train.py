"""Sharded training step: data parallelism + optional vocab sharding.

The reference scales training with torch DDP under Ray
(/root/reference/xfmr_rec/ray.py:40-51, single worker by default). Here
the same capability is a jit with sharding annotations: batch sharded
over every mesh axis, XLA emitting the gradient all-reduce over ICI. No
process groups, no launcher — the same step function runs on 1 chip or
a pod slice.

Two parameter layouts:

- default: params fully replicated — the `model` mesh axis folds into
  data parallelism for training (it exists for corpus-sharded
  retrieval, parallel/retrieval.py). Honest label: training is DP-only
  in this mode.
- `shard_vocab=True`: real model parallelism on the one tensor that
  dominates the parameter count — the (vocab, hidden) token-embedding
  table (30522 x 384 is ~92% of the reference-default encoder's
  params) shards row-wise over the `model` axis, together with its
  optimizer moments. XLA turns the embedding lookup into a masked
  local take + psum and keeps the gradient scatter local to each
  shard, so per-chip parameter + optimizer memory drops by ~the model
  axis while numerics stay EXACTLY data-parallel (asserted in
  tests/test_parallel.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xfmr_rec_tpu.parallel.mesh import MODEL_AXIS
from xfmr_rec_tpu.training.module import TrainConfig, make_train_step


def state_shardings(
    state, mesh: Mesh, config: TrainConfig, *, shard_vocab: bool = False
):
    """NamedSharding pytree for a TrainState.

    With shard_vocab, every (vocab, hidden) token-embedding leaf —
    params AND the matching adam moments (same tree paths inside
    opt_state) — shards row-wise over the model axis; everything else
    replicates. Uneven vocab / model_parallel splits are fine (XLA pads
    the last shard).
    """

    def spec(path, leaf):
        if (
            shard_vocab
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] == config.vocab_size
            and "word_embed" in jax.tree_util.keystr(path)
        ):
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def place_state(state, mesh: Mesh, config: TrainConfig, *, shard_vocab=False):
    """Put a TrainState on the mesh under `state_shardings`."""
    return jax.device_put(
        state, state_shardings(state, mesh, config, shard_vocab=shard_vocab)
    )


def make_sharded_train_step(
    config: TrainConfig,
    mesh: Mesh,
    *,
    shard_vocab: bool = False,
    state=None,
    log_all_losses: bool = True,
):
    """Jit the train step with sharded-state output constraints.

    Inputs are placed by `parallel.mesh.shard_batch` (batch) and
    `place_state` (state); outputs are constrained to the same state
    layout (replicated by default) so the gradient reduction happens
    inside the step. `state` (an abstract or concrete TrainState) is
    required when shard_vocab=True — output constraints need the tree
    structure.
    """
    step = make_train_step(config, log_all_losses=log_all_losses)
    replicated = NamedSharding(mesh, P())
    if not shard_vocab:
        return jax.jit(step, donate_argnums=0, out_shardings=replicated)
    if state is None:
        msg = "shard_vocab=True needs `state` to derive output shardings"
        raise ValueError(msg)
    out_state = state_shardings(state, mesh, config, shard_vocab=True)
    return jax.jit(
        step, donate_argnums=0, out_shardings=(out_state, replicated)
    )
