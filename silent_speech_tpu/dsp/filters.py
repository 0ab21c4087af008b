"""EMG signal cleaning filters.

Reference semantics (``read_emg.py:27-38``): a 3rd-order Butterworth highpass
at 2 Hz removes electrode drift, and IIR notch filters (Q=30) at 60 Hz and its
harmonics 2..7 remove mains hum; both are applied zero-phase with ``filtfilt``.
Filter *design* runs once per session on the host (scipy); application is a
host-side numpy pass in the input pipeline (cached per utterance).
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def butter_highpass(cutoff_hz: float, fs: float, order: int = 3):
    """3rd-order Butterworth highpass coefficients (``read_emg.py:28``)."""
    return scipy.signal.butter(order, cutoff_hz, "highpass", fs=fs)


def remove_drift(signal: np.ndarray, fs: float) -> np.ndarray:
    """Zero-phase 2 Hz highpass over the first axis (``read_emg.py:27-29``)."""
    b, a = butter_highpass(2.0, fs)
    return scipy.signal.filtfilt(b, a, signal, axis=0)


def notch(signal: np.ndarray, freq: float, sample_frequency: float
          ) -> np.ndarray:
    """Zero-phase IIR notch, Q=30 (``read_emg.py:31-33``)."""
    b, a = scipy.signal.iirnotch(freq, 30, sample_frequency)
    return scipy.signal.filtfilt(b, a, signal, axis=0)


def notch_harmonics(signal: np.ndarray, freq: float, sample_frequency: float
                    ) -> np.ndarray:
    """Notch at ``freq`` × 1..7 (``read_emg.py:35-38``)."""
    for harmonic in range(1, 8):
        signal = notch(signal, freq * harmonic, sample_frequency)
    return signal


def clean_emg(raw: np.ndarray, fs: float = 1000.0,
              mains_hz: float = 60.0) -> np.ndarray:
    """Full cleaning chain over a (time, channels) EMG array
    (``read_emg.py:66-68``): notch harmonics then drift removal.

    Operates on all channels at once (the reference loops channels via
    ``apply_to_all``; ``filtfilt(axis=0)`` is equivalent and vectorized).
    """
    x = notch_harmonics(raw, mains_hz, fs)
    x = remove_drift(x, fs)
    return x
