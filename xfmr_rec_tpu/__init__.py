"""xfmr_rec_tpu — TPU-native two-tower text recommender framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
reference `xfmr_rec` package (yxtay/matrix-factorization-torch):

- models/    : flax dual text encoder (tiny BERT), pooling, L2 normalize,
               hashing-trick / hash / Bloom embedding tables
- ops/       : contrastive loss family, accidental-hit masking,
               hard/semi-hard negative mining, LogQ correction,
               Pallas kernels for the hot paths
- index/     : TPU-HBM-resident exact MIPS retrieval index with streaming
               top-k and exclusion filters (replaces LanceDB ANN)
- data/      : MovieLens ETL (temporal split, rolling history), synthetic
               corpus generator, fixed-shape token batch pipeline with
               mixed negative sampling
- training/  : jit/shard_map training loop, retrieval metrics, orbax
               checkpointing, early stopping, CLI
- parallel/  : device mesh helpers, data-parallel train step, corpus-sharded
               retrieval over the ICI mesh
- serving/   : jit-compiled batched query engine + HTTP service
- tuning/    : ASHA-style successive-halving hyperparameter search
"""

__version__ = "0.1.0"
