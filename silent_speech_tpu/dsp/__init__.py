"""DSP featurization: EMG signal cleaning and audio/EMG feature extraction.

Host-side (numpy/scipy) implementations mirror the reference's
librosa/scipy semantics exactly (``read_emg.py:27-50``,
``data_utils.py:19-136``); JAX twins in :mod:`.jax_ops` run the same math
on-device so featurization can fuse into the training input pipeline.
"""

from .filters import notch, notch_harmonics, remove_drift, butter_highpass
from .resample import subsample, resample_poly_audio
from .mel import (
    mel_filterbank,
    stft_magnitude,
    log_mel_spectrogram,
    MelConfig,
)
from .emg_features import (
    double_average,
    frame_signal,
    get_emg_features,
)

__all__ = [
    "notch", "notch_harmonics", "remove_drift", "butter_highpass",
    "subsample", "resample_poly_audio",
    "mel_filterbank", "stft_magnitude", "log_mel_spectrogram", "MelConfig",
    "double_average", "frame_signal", "get_emg_features",
]
