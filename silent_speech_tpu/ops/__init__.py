"""Compute ops: on-device DTW alignment, CTC, distance kernels."""

from .dtw import (
    dtw_align,
    dtw_align_batch,
    align_from_distances_numpy,
)

__all__ = ["dtw_align", "dtw_align_batch", "align_from_distances_numpy"]
