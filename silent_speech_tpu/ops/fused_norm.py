"""Fused residual-add + dropout + LayerNorm with a minimal-residual VJP.

The transformer's post-norm blocks are ``x = LN(x + dropout(h))`` twice per
layer. Under plain autodiff that chain costs, per site and step at bench
shapes (112×200×768 bf16, measured by knockout — tools/prof9.py ``noln``/
``nodrop``): the pre-norm sum ``z`` materialized to HBM as the LN residual,
LN backward re-reading it, a separate regenerated-mask dropout backward
pass, and the RNG draw twice. Twelve sites total ~10 ms/step.

This op computes the whole chain in one ``jax.custom_vjp``:

- forward saves only ``x̂`` (the normalized activation, compute dtype) and
  the per-row ``rstd`` — ``z`` itself is never a saved residual, so its
  liveness ends inside the forward fusion;
- backward derives everything from ``(x̂, rstd, dy)`` in one fused pass:
  ``dz = rstd·(g − mean(g) − x̂·mean(g·x̂))`` with ``g = dy·γ``, then
  ``dx = dz`` and ``dh = mask ⊙ dz · scale`` with the mask regenerated
  in-pass from the same PRNG key (the regen-dropout contract,
  :mod:`.dropout`);
- statistics are reduced in float32 regardless of compute dtype, matching
  ``flax.linen.LayerNorm(force_float32_reductions=True)`` semantics, and
  parameter gradients accumulate in float32.

Functional parity: ``LN(x + dropout(h))`` with flax LayerNorm defaults
(ε=1e−6, scale+bias) — the reference applies the same chain eagerly
(``transformer.py:48-60``). Gradients match plain autodiff to float32
rounding (see ``tests/test_fused_norm.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dropout import _bits_u8, dropout_threshold


def _dropout_mul(h, key, drop_threshold):
    if drop_threshold == 0:
        return h
    bits = _bits_u8(key, h.shape)
    scale = 1.0 / (1.0 - drop_threshold / 256.0)
    return jnp.where(bits >= drop_threshold,
                     h * jnp.asarray(scale, h.dtype),
                     jnp.zeros((), h.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(3, 6))
def residual_dropout_ln(x, h, key, drop_threshold: int, gamma, beta,
                        eps: float):
    """``LN(x + dropout(h))`` over the last axis. x, h: (..., D)."""
    y, _, _ = _fwd_core(x, h, key, drop_threshold, gamma, beta, eps)
    return y


def _fwd_core(x, h, key, drop_threshold, gamma, beta, eps):
    z = x + _dropout_mul(h, key, drop_threshold)
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z32), axis=-1, keepdims=True) - jnp.square(mu)
    rstd = jax.lax.rsqrt(var + eps)
    xhat32 = (z32 - mu) * rstd
    xhat = xhat32.astype(x.dtype)
    y = (xhat32 * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32)).astype(x.dtype)
    return y, xhat, rstd


def _fwd(x, h, key, drop_threshold, gamma, beta, eps):
    y, xhat, rstd = _fwd_core(x, h, key, drop_threshold, gamma, beta, eps)
    return y, (xhat, rstd, key, gamma)


def _bwd(drop_threshold, eps, res, dy):
    xhat, rstd, key, gamma = res
    xhat32 = xhat.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    g = dy32 * gamma.astype(jnp.float32)
    mean_g = jnp.mean(g, axis=-1, keepdims=True)
    mean_gx = jnp.mean(g * xhat32, axis=-1, keepdims=True)
    dz32 = rstd * (g - mean_g - xhat32 * mean_gx)
    dz = dz32.astype(dy.dtype)
    # param grads reduce over all row axes in f32
    red = tuple(range(xhat.ndim - 1))
    dgamma = jnp.sum(dy32 * xhat32, axis=red).astype(gamma.dtype)
    dbeta = jnp.sum(dy32, axis=red).astype(gamma.dtype)
    if drop_threshold == 0:
        dh = dz
    else:
        bits = _bits_u8(key, xhat.shape)
        scale = 1.0 / (1.0 - drop_threshold / 256.0)
        dh = jnp.where(bits >= drop_threshold,
                       dz * jnp.asarray(scale, dz.dtype),
                       jnp.zeros((), dz.dtype))
    return dz, dh, None, dgamma, dbeta


residual_dropout_ln.defvjp(_fwd, _bwd)


class FusedResidualNorm(nn.Module):
    """``LN(x + dropout(h))`` as one op; param layout matches
    ``nn.LayerNorm`` (``scale``/``bias`` of shape (D,)) so checkpoints are
    interchangeable with the unfused module tree."""

    rate: float
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray,
                 deterministic: bool) -> jnp.ndarray:
        d = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (d,))
        beta = self.param("bias", nn.initializers.zeros, (d,))
        t = 0 if deterministic else dropout_threshold(self.rate)
        key = (self.make_rng(self.rng_collection) if t > 0
               else jax.random.PRNGKey(0))
        xc = x.astype(self.dtype)
        hc = h.astype(self.dtype)
        return residual_dropout_ln(xc, hc, key, t, gamma, beta,
                                   self.epsilon).astype(x.dtype)
