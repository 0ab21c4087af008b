"""HiFi-GAN-compatible log-mel spectrogram extraction.

Reference semantics (``data_utils.py:29-83``): reflect-pad by
``(n_fft - hop)/2``, STFT with a periodic Hann window and ``center=False``,
magnitude ``sqrt(re² + im² + 1e-9)``, a Slaney-normalized mel filterbank
(librosa defaults: htk=False, norm='slaney'), then ``log(clamp(x, 1e-5))``.
Matching these numbers exactly matters because HiFi-GAN's released checkpoints
were trained against them.

Both a numpy host path and a jit-able JAX path are provided; the JAX path uses
a framed rFFT that XLA maps onto the MXU/VPU and can fuse into the on-device
input pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MelConfig:
    """Defaults = the HiFi-GAN universal config (``data_utils.py:79``)."""

    n_fft: int = 1024
    num_mels: int = 80
    sampling_rate: int = 22050
    hop_size: int = 256
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel with htk=False, norm='slaney')
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3          # linear region: Hz per mel
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, _MIN_LOG_HZ) / _MIN_LOG_HZ)
        / _LOGSTEP,
        mel,
    )
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(
        log_region,
        _MIN_LOG_HZ * np.exp(_LOGSTEP * (np.maximum(m, _MIN_LOG_MEL)
                                         - _MIN_LOG_MEL)),
        f,
    )
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float
                   ) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank, Slaney-normalized."""
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_size: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default, ``data_utils.py:49``)."""
    n = np.arange(win_size)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_size))).astype(
        np.float32)


# ---------------------------------------------------------------------------
# numpy host path
# ---------------------------------------------------------------------------

def stft_magnitude(audio: np.ndarray, n_fft: int, hop_size: int,
                   win_size: int, window: np.ndarray,
                   center: bool = False) -> np.ndarray:
    """|STFT| with the reference's magnitude floor: sqrt(power + 1e-9).

    Returns (1 + n_fft//2, n_frames). ``center=False`` framing: frame t
    covers samples [t*hop, t*hop + n_fft).
    """
    if center:
        pad = n_fft // 2
        audio = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(audio) - n_fft) // hop_size
    idx = (np.arange(n_fft)[None, :]
           + hop_size * np.arange(n_frames)[:, None])
    frames = audio[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    mag = np.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    return mag.T.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, cfg: MelConfig = MelConfig()
                        ) -> np.ndarray:
    """(T, num_mels) log-mel, HiFi-GAN convention (``data_utils.py:39-62``).

    The reference reflect-pads by (n_fft - hop)/2 on both sides and uses
    center=False, so T = 1 + (len + n_fft - 2*hop) // hop − ... (for a
    hop-multiple input, exactly len // hop frames).
    """
    audio = np.asarray(audio, dtype=np.float64)
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    audio = np.pad(audio, (pad, pad), mode="reflect")
    window = hann_window(cfg.win_size).astype(np.float64)
    mag = stft_magnitude(audio, cfg.n_fft, cfg.hop_size, cfg.win_size,
                         window, center=False)
    basis = mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.num_mels,
                           cfg.fmin, cfg.fmax)
    mel = basis @ mag
    logmel = np.log(np.clip(mel, 1e-5, None))
    return logmel.T.astype(np.float32)  # (T, num_mels)


# ---------------------------------------------------------------------------
# JAX on-device path
# ---------------------------------------------------------------------------

def _dft_matrices(n_fft: int):
    """Real/imag rDFT basis matrices, (n_fft, 1 + n_fft//2).

    On TPU the FFT unit is a poor fit for short speech-frame transforms; two
    (T, n_fft) × (n_fft, bins) matmuls ride the MXU instead and fuse with the
    downstream mel projection (GEMM-native DFT; cf. PAPERS.md "MelT").
    """
    k = np.arange(1 + n_fft // 2)
    n = np.arange(n_fft)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft
    return (np.cos(ang).astype(np.float32),
            -np.sin(ang).astype(np.float32))


def jax_stft_magnitude(audio: jnp.ndarray, n_fft: int, hop_size: int,
                       window: jnp.ndarray) -> jnp.ndarray:
    """Framed DFT magnitude for a 1-D signal, center=False.

    Framing is a strided gather (static shapes); the transform is a pair of
    real matmuls onto the MXU rather than an FFT. Returns
    (n_frames, 1 + n_fft//2) with the reference's sqrt(power + 1e-9) floor.
    """
    n_frames = 1 + (audio.shape[0] - n_fft) // hop_size
    starts = hop_size * jnp.arange(n_frames)
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = audio[idx] * window[None, :]
    cos_m, sin_m = _dft_matrices(n_fft)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    return jnp.sqrt(re ** 2 + im ** 2 + 1e-9)


from functools import partial


@partial(jax.jit, static_argnames=("cfg",))
def jax_log_mel_spectrogram(audio: jnp.ndarray,
                            cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """(T, num_mels) log-mel on device; numerics match the numpy path."""
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    audio = jnp.pad(audio, (pad, pad), mode="reflect")
    window = jnp.asarray(hann_window(cfg.win_size))
    mag = jax_stft_magnitude(audio, cfg.n_fft, cfg.hop_size, window)
    basis = jnp.asarray(mel_filterbank(
        cfg.sampling_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))
    mel = mag @ basis.T
    return jnp.log(jnp.clip(mel, 1e-5))
