"""TPU-HBM retrieval index: exact MIPS + streaming top-k with exclusions."""

from xfmr_rec_tpu.index.ivf import IVFIndex
from xfmr_rec_tpu.index.mips import RetrievalIndex, exact_topk
from xfmr_rec_tpu.index.sharded import ShardedRetrievalIndex

__all__ = [
    "IVFIndex",
    "RetrievalIndex",
    "ShardedRetrievalIndex",
    "exact_topk",
]
