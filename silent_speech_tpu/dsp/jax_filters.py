"""IIR filtering in JAX: ``lfilter`` / ``filtfilt`` with scipy semantics.

Closes the last host-only piece of the featurization chain (SURVEY.md §2.3):
the reference's notch/highpass cleaning uses ``scipy.signal.filtfilt``
(``read_emg.py:27-38``); with this module the whole utterance featurization
can run as one jit region (see :mod:`.jax_pipeline`).

``filtfilt`` reproduces scipy's defaults exactly: odd-extension padding of
``3·max(len(a), len(b))`` samples, steady-state initial conditions
(``lfilter_zi``) scaled by the first sample, forward pass, reverse pass,
crop. The recurrence is a ``lax.scan`` over time in transposed direct-form
II — sequential, but these run over short (≤ a few seconds) EMG clips and
vectorize across channels.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_ba(b, a):
    b = np.atleast_1d(np.asarray(b, np.float64))
    a = np.atleast_1d(np.asarray(a, np.float64))
    n = max(len(a), len(b))
    b = np.pad(b, (0, n - len(b)))
    a = np.pad(a, (0, n - len(a)))
    return b / a[0], a / a[0]


def lfilter_zi(b, a) -> np.ndarray:
    """Steady-state initial filter delays (scipy.signal.lfilter_zi)."""
    b, a = _normalize_ba(b, a)
    n = len(a)
    if n == 1:
        return np.zeros(0)
    # solve (I - A) zi = B  with the companion-form transition matrix
    A = np.zeros((n - 1, n - 1))
    A[:, 0] = -a[1:]
    A[:-1, 1:] = np.eye(n - 2)
    B = b[1:] - a[1:] * b[0]
    return np.linalg.solve(np.eye(n - 1) - A, B)


def jax_lfilter(b, a, x: jnp.ndarray, zi: jnp.ndarray) -> jnp.ndarray:
    """Direct-form II transposed IIR over axis 0 of x (time, channels)."""
    b, a = _normalize_ba(b, a)
    n = len(b)
    bj = jnp.asarray(b, x.dtype)
    aj = jnp.asarray(a, x.dtype)

    def step(z, xt):
        # z: (n-1, C) delays; xt: (C,);  z[i-1] ← b[i]·x − a[i]·y + z[i]
        yt = bj[0] * xt + z[0]
        shifted = jnp.concatenate(
            [z[1:], jnp.zeros((1,) + xt.shape, z.dtype)], axis=0)
        z = shifted + bj[1:, None] * xt[None, :] \
            - aj[1:, None] * yt[None, :]
        return z, yt

    _, y = jax.lax.scan(step, zi, x)
    return y


@partial(jax.jit, static_argnames=("b", "a"))
def _filtfilt_impl(x: jnp.ndarray, b: Tuple[float, ...],
                   a: Tuple[float, ...]) -> jnp.ndarray:
    bn, an = _normalize_ba(b, a)
    ntaps = max(len(bn), len(an))
    padlen = 3 * ntaps  # scipy default: 3 * max(len(a), len(b))

    # odd extension at both ends
    front = 2 * x[0:1] - x[1: padlen + 1][::-1]
    back = 2 * x[-1:] - x[-padlen - 1: -1][::-1]
    ext = jnp.concatenate([front, x, back], axis=0)

    zi = jnp.asarray(lfilter_zi(bn, an), x.dtype)  # (n-1,)
    zi_f = zi[:, None] * ext[0:1]                  # scaled by first sample
    y = jax_lfilter(bn, an, ext, zi_f)

    y_rev = y[::-1]
    zi_b = zi[:, None] * y_rev[0:1]
    y2 = jax_lfilter(bn, an, y_rev, zi_b)[::-1]

    return y2[padlen: padlen + x.shape[0]]


def jax_filtfilt(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase filtering of (time,) or (time, channels) input."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    y = _filtfilt_impl(x, tuple(np.atleast_1d(b).tolist()),
                       tuple(np.atleast_1d(a).tolist()))
    return y[:, 0] if squeeze else y


@partial(jax.jit, static_argnames=("b", "a"))
def _filtfilt_masked_impl(x: jnp.ndarray, length: jnp.ndarray,
                          b: Tuple[float, ...], a: Tuple[float, ...]
                          ) -> jnp.ndarray:
    """filtfilt over the valid prefix of a fixed-size buffer.

    ``x`` is (T_pad, C), zero beyond ``length``; rows ``[0, length)`` of the
    output are BIT-IDENTICAL to ``_filtfilt_impl(x[:length])`` (same f32
    op sequence — the odd extensions, reversals, and crop become clipped
    gathers/scatters at the dynamic boundary), rows beyond are zero. This
    is what lets variable-length utterances batch into one jit region for
    the on-device corpus featurizer (requires length > 3·ntaps).
    """
    bn, an = _normalize_ba(b, a)
    padlen = 3 * max(len(bn), len(an))
    t_pad = x.shape[0]
    zero = jnp.zeros((padlen,) + x.shape[1:], x.dtype)

    front = 2 * x[0:1] - x[1: padlen + 1][::-1]
    ext = jnp.concatenate([front, x, zero], axis=0)  # (t_pad + 2·padlen, C)
    j = jnp.arange(padlen)
    last = x[jnp.clip(length - 1, 0, t_pad - 1)]
    back = 2 * last[None, :] - x[jnp.clip(length - 2 - j, 0, t_pad - 1)]
    ext = ext.at[padlen + length + j].set(back)

    zi = jnp.asarray(lfilter_zi(bn, an), x.dtype)
    y = jax_lfilter(bn, an, ext, zi[:, None] * ext[0:1])

    total = length + 2 * padlen
    t = jnp.arange(t_pad + 2 * padlen)
    y_rev = jnp.where((t < total)[:, None],
                      y[jnp.clip(total - 1 - t, 0, t_pad + 2 * padlen - 1)],
                      0.0)
    y2 = jax_lfilter(bn, an, y_rev, zi[:, None] * y_rev[0:1])

    tp = jnp.arange(t_pad)
    out = y2[jnp.clip(length + padlen - 1 - tp, 0,
                      t_pad + 2 * padlen - 1)]
    return jnp.where((tp < length)[:, None], out, 0.0)


def jax_filtfilt_masked(b, a, x: jnp.ndarray, length) -> jnp.ndarray:
    """Masked zero-phase filtering of a (T_pad, C) buffer whose valid
    prefix is ``length`` rows (see :func:`_filtfilt_masked_impl`)."""
    return _filtfilt_masked_impl(
        x, jnp.asarray(length, jnp.int32),
        tuple(np.atleast_1d(b).tolist()), tuple(np.atleast_1d(a).tolist()))
