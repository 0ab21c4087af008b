"""Regenerating dropout: zero mask traffic between forward and backward.

Standard dropout in one jitted train step materializes its keep-mask to HBM
as a forward→backward residual (XLA will not duplicate RngBitGenerator
ops). At this model's scale that is ~890M mask elements per step, and
measured effective HBM bandwidth through the remote-attached v5e makes
those round-trips ~20+ ms/step. This op instead REGENERATES the identical
mask in the backward pass from the same PRNG key (XLA's RngBitGenerator is
a pure function of the key), so the mask fuses into its single consumer on
each side and never touches HBM.

Masks use 8-bit random words (a quarter of the bits of
``jax.random.bernoulli``'s uint32 draw); the keep probability is quantized
to 1/256 — for a train-time regularizer the ≤0.2% rate shift is
immaterial (the reference's dropout pattern is arbitrary RNG anyway,
``transformer.py:48-58``).

``SSTPU_HASH_DROPOUT=1`` swaps the bit source for a counter-based
multiply-xorshift hash (splitmix32-style finalizer keyed by the PRNG
key's words) — byte-level quality is fine (histogram spread 1.5%, lag-1
correlation 0.0016), but the u32→u8 bitcast/reshape it needs forces an
XLA relayout that measured 15 ms/step SLOWER than the native u8
RngBitGenerator in the full train step, so the hardware generator stays
the default. Kept for future layout experiments.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


def _hash_bits_u8(key, shape) -> jnp.ndarray:
    """Keyed counter hash → uint8 bits of ``shape``; pure VPU arithmetic.

    Deterministic per key (the regen contract: forward and backward
    recompute identical bits), distinct across keys via the two mixed-in
    key words."""
    n = 1
    for d in shape:
        n *= int(d)
    nw = -(-n // 4)
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    w0, w1 = data[-1], data[0]
    x = jax.lax.broadcasted_iota(jnp.uint32, (nw,), 0)
    x = x * jnp.uint32(2654435761) + w0          # Knuth odd multiplier
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)  # splitmix32 finalizer
    x = x ^ w1
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    b = jax.lax.bitcast_convert_type(x, jnp.uint8).reshape(-1)
    return b[:n].reshape(shape)


def _bits_u8(key, shape) -> jnp.ndarray:
    if os.environ.get("SSTPU_HASH_DROPOUT") == "1":
        return _hash_bits_u8(key, shape)
    return jax.random.bits(key, shape, jnp.uint8)


def _mask_scale(x: jnp.ndarray, key, drop_threshold: int) -> jnp.ndarray:
    """x * keep_mask / keep_prob with an in-graph regenerable mask."""
    bits = _bits_u8(key, x.shape)
    keep = bits >= drop_threshold
    scale = 1.0 / (1.0 - drop_threshold / 256.0)
    return jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                     jnp.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def regen_dropout(x: jnp.ndarray, key, drop_threshold: int) -> jnp.ndarray:
    return _mask_scale(x, key, drop_threshold)


def _fwd(x, key, drop_threshold):
    return _mask_scale(x, key, drop_threshold), key


def _bwd(drop_threshold, key, g):
    # identical bits from the identical key: the mask is recomputed, not
    # loaded — the custom_vjp exists precisely to keep it out of HBM
    return _mask_scale(g, key, drop_threshold), None


regen_dropout.defvjp(_fwd, _bwd)


def dropout_threshold(rate: float) -> int:
    """Quantize a dropout rate to the uint8 threshold (drop iff bits < t)."""
    return int(round(rate * 256.0))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def relu_dropout(x: jnp.ndarray, key, drop_threshold: int) -> jnp.ndarray:
    """Fused ``dropout(relu(x))`` whose backward needs NO random bits.

    After relu, the forward output's sign already encodes the joint
    relu+dropout mask: ``y > 0`` iff (kept AND x > 0), and elements with
    x <= 0 have zero gradient regardless of the mask. The backward is
    therefore ``g * scale * (y > 0)`` over the saved output — which XLA
    must keep anyway as the following matmul's weight-gradient operand —
    eliminating the regenerated mask draw in the backward pass (the
    single largest RNG site: the FFN hidden layer is 4x the residual
    width). Gradient is bit-identical to ``regen_dropout(relu(x))``
    except for kept positives that underflow to 0 in the output dtype.
    """
    return _mask_scale(jax.nn.relu(x), key, drop_threshold)


def _rd_fwd(x, key, drop_threshold):
    y = _mask_scale(jax.nn.relu(x), key, drop_threshold)
    return y, y


def _rd_bwd(drop_threshold, y, g):
    scale = 1.0 / (1.0 - drop_threshold / 256.0)
    return (jnp.where(y > 0, g * jnp.asarray(scale, g.dtype),
                      jnp.zeros((), g.dtype)), None)


relu_dropout.defvjp(_rd_fwd, _rd_bwd)


class RegenDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` backed by regen_dropout."""

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        t = dropout_threshold(self.rate)
        if deterministic or t == 0:
            return x
        return regen_dropout(x, self.make_rng(self.rng_collection), t)
