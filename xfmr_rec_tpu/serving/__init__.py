"""Serving: artifact-backed query engine + HTTP service."""

from xfmr_rec_tpu.serving.engine import RecommenderEngine
from xfmr_rec_tpu.serving.portable import PortableEncoder, export_portable
from xfmr_rec_tpu.serving.service import RecService

__all__ = [
    "PortableEncoder",
    "RecService",
    "RecommenderEngine",
    "export_portable",
]
