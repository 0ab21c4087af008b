"""Per-channel EMG frame features (the 112-dim model input features).

Reference semantics (``data_utils.py:85-136``): for each of 8 channels, the
mean-centered signal x is split into a low-frequency envelope
``w = double_average(x)`` (two 9-tap moving averages) and a high-frequency
residual ``p = x - w`` with rectification ``r = |p|``; frames of length 16
with hop 6 yield five scalar features (envelope mean, envelope RMS, rectified
RMS, residual zero-crossing rate, rectified mean) plus a 9-bin |STFT| of x
(n_fft=16) — 14 features × 8 channels = 112 dims at ~86 fps.

A numpy host path mirrors librosa bit-for-bit (framing, RMS,
``zero_crossings`` with threshold 1e-10/signbit/edge-pad); a JAX twin runs
the identical math on-device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .mel import hann_window

FRAME_LENGTH = 16
HOP_LENGTH = 6
FEATS_PER_CHANNEL = 14  # 5 scalar + 9 STFT bins


def double_average(x: np.ndarray) -> np.ndarray:
    """Two passes of a centered 9-tap moving average (``data_utils.py:85-90``).

    Accepts (time,) or (time, channels); 'same'-mode convolution.
    """
    f = np.ones(9) / 9.0
    if x.ndim == 1:
        v = np.convolve(x, f, mode="same")
        return np.convolve(v, f, mode="same")
    return np.stack([double_average(x[:, i]) for i in range(x.shape[1])],
                    axis=1)


def frame_signal(x: np.ndarray, frame_length: int = FRAME_LENGTH,
                 hop_length: int = HOP_LENGTH) -> np.ndarray:
    """(n_frames, frame_length) view of a 1-D signal, librosa frame order."""
    n_frames = 1 + (len(x) - frame_length) // hop_length
    idx = (np.arange(frame_length)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    return x[idx]


def _rms(frames: np.ndarray) -> np.ndarray:
    return np.sqrt(np.mean(frames ** 2, axis=1))


def _zero_crossing_rate(p: np.ndarray, threshold: float = 1e-10) -> np.ndarray:
    """librosa.feature.zero_crossing_rate semantics, center=False.

    Values with |p| <= threshold are clamped to zero before the signbit test;
    crossings are sign-bit changes between consecutive in-frame samples, with
    the first sample edge-padded from the second
    (librosa ``zero_crossings(pad=True, zero_pos=True)``).
    """
    frames = frame_signal(p)
    clamped = np.where(np.abs(frames) <= threshold, 0.0, frames)
    sb = np.signbit(clamped)
    crossings = np.diff(sb, axis=1) != 0
    crossings = np.concatenate([crossings[:, :1], crossings], axis=1)
    return np.mean(crossings, axis=1)


def get_emg_features(emg_data: np.ndarray) -> np.ndarray:
    """(time, channels) cleaned EMG → (n_frames, 14*channels) float32.

    Exact reference math and feature ordering (``data_utils.py:92-136``):
    per channel [w_h, p_w, p_r, z_p, r_h] then the 9 STFT bins.
    """
    xs = emg_data - emg_data.mean(axis=0, keepdims=True)
    window = hann_window(FRAME_LENGTH).astype(np.float64)
    outs = []
    for i in range(emg_data.shape[1]):
        x = xs[:, i]
        w = double_average(x)
        p = x - w
        r = np.abs(p)

        w_h = frame_signal(w).mean(axis=1)
        p_w = _rms(frame_signal(w))
        p_r = _rms(frame_signal(r))
        z_p = _zero_crossing_rate(p)
        r_h = frame_signal(r).mean(axis=1)

        frames = frame_signal(x) * window[None, :]
        s = np.abs(np.fft.rfft(frames, n=FRAME_LENGTH, axis=1))  # (n, 9)

        outs.append(np.stack([w_h, p_w, p_r, z_p, r_h], axis=1))
        outs.append(s)
    return np.concatenate(outs, axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX on-device path
# ---------------------------------------------------------------------------

def jax_double_average(x: jnp.ndarray) -> jnp.ndarray:
    f = jnp.ones(9) / 9.0
    v = jnp.convolve(x, f, mode="same")
    return jnp.convolve(v, f, mode="same")


def jax_frame_signal(x: jnp.ndarray, frame_length: int = FRAME_LENGTH,
                     hop_length: int = HOP_LENGTH) -> jnp.ndarray:
    n_frames = 1 + (x.shape[0] - frame_length) // hop_length
    idx = (jnp.arange(frame_length)[None, :]
           + hop_length * jnp.arange(n_frames)[:, None])
    return x[idx]


import jax


@jax.jit
def jax_get_emg_features(emg_data: jnp.ndarray) -> jnp.ndarray:
    """JAX twin of :func:`get_emg_features`; jitted per input shape."""
    xs = emg_data - emg_data.mean(axis=0, keepdims=True)
    window = jnp.asarray(hann_window(FRAME_LENGTH))

    def per_channel(x):
        w = jax_double_average(x)
        p = x - w
        r = jnp.abs(p)

        fw = jax_frame_signal(w)
        fr = jax_frame_signal(r)
        fp = jax_frame_signal(p)
        fx = jax_frame_signal(x)

        w_h = fw.mean(axis=1)
        p_w = jnp.sqrt(jnp.mean(fw ** 2, axis=1))
        p_r = jnp.sqrt(jnp.mean(fr ** 2, axis=1))
        clamped = jnp.where(jnp.abs(fp) <= 1e-10, 0.0, fp)
        sb = jnp.signbit(clamped)
        crossings = sb[:, 1:] != sb[:, :-1]
        crossings = jnp.concatenate([crossings[:, :1], crossings], axis=1)
        z_p = jnp.mean(crossings.astype(jnp.float32), axis=1)
        r_h = fr.mean(axis=1)

        from .mel import _dft_matrices

        cos_m, sin_m = _dft_matrices(FRAME_LENGTH)
        fw_win = fx * window[None, :]
        re = fw_win @ jnp.asarray(cos_m)
        im = fw_win @ jnp.asarray(sin_m)
        s = jnp.sqrt(re ** 2 + im ** 2)
        return jnp.concatenate(
            [jnp.stack([w_h, p_w, p_r, z_p, r_h], axis=1), s], axis=1)

    feats = [per_channel(xs[:, i]) for i in range(emg_data.shape[1])]
    return jnp.concatenate(feats, axis=1)
