"""Data pipeline: dataset discovery, featurization, packing, batching."""

from .packing import (
    combine_fixed_length,
    decollate,
    PackedBatch,
    pack_batch,
)
from .normalizers import FeatureNormalizer, load_normalizers, save_normalizers
from .sampler import SizeAwareSampler

__all__ = [
    "combine_fixed_length", "decollate", "PackedBatch", "pack_batch",
    "FeatureNormalizer", "load_normalizers", "save_normalizers",
    "SizeAwareSampler",
]
