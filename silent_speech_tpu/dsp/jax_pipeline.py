"""Fully on-device utterance featurization (one jit region).

Composes the JAX twins of every stage of the reference's host pipeline
(``read_emg.py:52-88``): zero-phase notch-harmonic + drift filtering
(:mod:`.jax_filters`), linear-interp resampling to the raw/feature rates,
the 112-dim EMG frame features, and the HiFi-GAN log-mel target — so
featurization can run under jit on any backend (the CPU backend for input
pipelines, or fused on-TPU).

Filter *design* stays on the host (scipy, once per sample rate); filter
*application* is a JAX scan.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .emg_features import jax_get_emg_features
from .filters import butter_highpass
from .jax_filters import jax_filtfilt
from .mel import MelConfig, jax_log_mel_spectrogram

CAPTURE_RATE = 1000.0
RAW_RATE = 689.06
FEAT_RATE = 516.79


@lru_cache(maxsize=None)
def _filter_coeffs(fs: float, mains_hz: float):
    import scipy.signal

    coeffs = []
    for harmonic in range(1, 8):
        b, a = scipy.signal.iirnotch(mains_hz * harmonic, 30, fs)
        coeffs.append((tuple(b.tolist()), tuple(a.tolist())))
    b, a = butter_highpass(2.0, fs)
    coeffs.append((tuple(b.tolist()), tuple(a.tolist())))
    return tuple(coeffs)


def jax_clean_emg(raw: jnp.ndarray, fs: float = CAPTURE_RATE,
                  mains_hz: float = 60.0) -> jnp.ndarray:
    """On-device zero-phase cleaning chain (``read_emg.py:66-68``)."""
    x = raw
    for b, a in _filter_coeffs(fs, mains_hz):
        x = jax_filtfilt(b, a, x)
    return x


def jax_subsample(signal: jnp.ndarray, new_freq: float, old_freq: float
                  ) -> jnp.ndarray:
    """Linear-interp resample, matching ``np.interp`` on a uniform grid."""
    n = signal.shape[0]
    times_last = (n - 1) / old_freq
    # np.arange(0, stop, step) excludes stop: ceil(stop/step) points
    m = int(np.ceil(times_last * new_freq - 1e-9))
    sample_times = jnp.arange(m) / new_freq
    pos = sample_times * old_freq
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo).astype(signal.dtype)
    return signal[lo] * (1 - frac[:, None]) + signal[hi] * frac[:, None]


def featurize_utterance_jax(raw_emg: jnp.ndarray,
                            audio: Optional[jnp.ndarray] = None,
                            mel_cfg: MelConfig = MelConfig()
                            ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                       Optional[jnp.ndarray]]:
    """(T_capture, 8) raw EMG [+ 22.05 kHz audio] →
    (raw_model_input (8T', 8), emg_features (T', 112), mel (T_mel, 80)).

    Mirrors ``load_utterance`` (``read_emg.py:52-88``) minus the neighbor
    context and length cross-trimming, which are host/IO concerns; shapes
    follow the same 16/6 framing and 8×/6× hop alignment.
    """
    x = jax_clean_emg(raw_emg.astype(jnp.float32))
    emg_orig = jax_subsample(x, RAW_RATE, CAPTURE_RATE)
    emg = jax_subsample(x, FEAT_RATE, CAPTURE_RATE)
    feats = jax_get_emg_features(emg)
    t = feats.shape[0]
    mel = None
    if audio is not None:
        mel = jax_log_mel_spectrogram(audio.astype(jnp.float32), mel_cfg)
        t = min(t, mel.shape[0])
        feats = feats[:t]
        mel = mel[: mel.shape[0]]
    raw_out = emg_orig[8: 8 + 8 * t]
    return raw_out, feats[:t], mel
