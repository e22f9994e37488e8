"""Data layer: ETL, synthetic corpus generator, fixed-shape batch pipeline."""

from xfmr_rec_tpu.data.module import DataConfig, RecDataModule

__all__ = ["DataConfig", "RecDataModule"]
