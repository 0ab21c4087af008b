"""Sample-rate conversion.

- :func:`subsample` — linear-interpolation resampling of EMG, exactly matching
  the reference (``read_emg.py:40-44``: ``np.interp`` over a uniform grid).
- :func:`resample_poly_audio` — high-quality polyphase audio resampling
  (replaces ``librosa.resample``; used for 16 kHz→22.05 kHz flac input and the
  22.05 kHz→16 kHz DeepSpeech path, ``data_utils.py:75``,
  ``asr_evaluation.py:20``).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import scipy.signal


def subsample(signal: np.ndarray, new_freq: float, old_freq: float
              ) -> np.ndarray:
    """Linear-interp resample along axis 0 (reference ``read_emg.py:40-44``).

    The reference resamples each channel separately with identical sample
    times; we vectorize over channels.
    """
    times = np.arange(signal.shape[0]) / old_freq
    sample_times = np.arange(0, times[-1], 1 / new_freq)
    if signal.ndim == 1:
        return np.interp(sample_times, times, signal)
    cols = [np.interp(sample_times, times, signal[:, i])
            for i in range(signal.shape[1])]
    return np.stack(cols, axis=1)


def resample_poly_audio(audio: np.ndarray, orig_sr: int, target_sr: int
                        ) -> np.ndarray:
    """Polyphase resample with a Kaiser-windowed sinc filter.

    Numerically this is scipy's high-quality polyphase path rather than
    librosa/soxr, which is a deliberate substitution: the passband behavior is
    equivalent for speech and it keeps the dependency surface to scipy.
    """
    if orig_sr == target_sr:
        return audio
    frac = Fraction(target_sr, orig_sr)
    out = scipy.signal.resample_poly(audio, frac.numerator, frac.denominator)
    return np.clip(out, -1.0, 1.0)
