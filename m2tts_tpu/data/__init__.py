"""Data layer: bucketed fixed-shape batching + async device prefetch."""

from m2tts_tpu.data.dataset import (
    DummyDataset,
    TTSDataset,
    collate,
    create_dataloader,
    data_iterator,
    make_batches,
    select_bucket,
    uniform_durations,
)
from m2tts_tpu.data.prefetch import DevicePrefetcher

__all__ = [
    "DummyDataset", "TTSDataset", "collate", "create_dataloader",
    "data_iterator", "make_batches", "select_bucket", "uniform_durations",
    "DevicePrefetcher",
]
