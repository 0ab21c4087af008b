"""Feature mean/std normalizers with reference pickle compatibility.

The reference pickles two ``data_utils.FeatureNormalizer`` objects into
``normalizers.pkl`` (``read_emg.py:298-309``): ``mfcc_norm`` with (1,80) means
and one shared scalar std, and ``emg_norm`` with per-dim (1,112) stats. We can
load those exact pickles (remapping the class path) and write new ones.
"""

from __future__ import annotations

import io
import pickle
from typing import List, Sequence, Tuple

import numpy as np


class FeatureNormalizer:
    """Z-scoring over (time, feature) samples (``data_utils.py:138-156``)."""

    def __init__(self, feature_samples: Sequence[np.ndarray] = None,
                 share_scale: bool = False):
        if feature_samples is not None:
            stacked = np.concatenate([np.asarray(f) for f in feature_samples],
                                     axis=0)
            self.feature_means = stacked.mean(axis=0, keepdims=True)
            if share_scale:
                self.feature_stddevs = stacked.std()
            else:
                self.feature_stddevs = stacked.std(axis=0, keepdims=True)

    def normalize(self, sample: np.ndarray) -> np.ndarray:
        return (sample - self.feature_means) / self.feature_stddevs

    def inverse(self, sample: np.ndarray) -> np.ndarray:
        return sample * self.feature_stddevs + self.feature_means


class _CompatUnpickler(pickle.Unpickler):
    """Map the reference's ``data_utils.FeatureNormalizer`` to ours."""

    def find_class(self, module, name):
        if name == "FeatureNormalizer":
            return FeatureNormalizer
        return super().find_class(module, name)


def load_normalizers(path: str) -> Tuple[FeatureNormalizer, FeatureNormalizer]:
    with open(path, "rb") as f:
        mfcc_norm, emg_norm = _CompatUnpickler(f).load()
    return mfcc_norm, emg_norm


def save_normalizers(path: str, mfcc_norm: FeatureNormalizer,
                     emg_norm: FeatureNormalizer) -> None:
    with open(path, "wb") as f:
        pickle.dump((mfcc_norm, emg_norm), f)


def make_normalizers(dataset, n_samples: int = 51
                     ) -> Tuple[FeatureNormalizer, FeatureNormalizer]:
    """Build normalizers from the first ~50 examples
    (reference ``read_emg.py:298-309``: mfcc shares a scalar std,
    EMG has per-dim stats)."""
    mfcc_samples: List[np.ndarray] = []
    emg_samples: List[np.ndarray] = []
    for d in dataset:
        mfcc_samples.append(np.asarray(d["audio_features"]))
        emg_samples.append(np.asarray(d["emg"]))
        if len(emg_samples) > n_samples - 1:
            break
    mfcc_norm = FeatureNormalizer(mfcc_samples, share_scale=True)
    emg_norm = FeatureNormalizer(emg_samples, share_scale=False)
    return mfcc_norm, emg_norm
