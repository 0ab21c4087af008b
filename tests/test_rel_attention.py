"""Fused Pallas rel-position attention vs the XLA reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.ops.pallas.rel_attention import fused_rel_attention
from silent_speech_tpu.models.transformer import (
    _relative_to_absolute_matmul, NEG_INF)


def xla_rel_attention(q, k, v, rel_emb, max_dist):
    """The current XLA path's math (transformer.py:147-172), f32."""
    dh = q.shape[-1]
    logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / (dh ** 0.5)
    rel = jnp.einsum("bhqa,hma->bhqm", q, rel_emb)
    logits = logits + _relative_to_absolute_matmul(
        rel, q.shape[2], max_dist, jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhka->bhqa", probs, v)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * 0.3, jnp.float32)


@pytest.mark.parametrize("b,h,t,dh,m", [
    (2, 2, 200, 32, 100),   # the training shape family (T > window)
    (1, 3, 64, 16, 100),    # T < window (whole matrix in range)
    (2, 2, 150, 32, 40),    # window < T, odd sizes
])
def test_forward_matches_xla(b, h, t, dh, m):
    q = _rand((b, h, t, dh), 0)
    k = _rand((b, h, t, dh), 1)
    v = _rand((b, h, t, dh), 2)
    e = _rand((h, 2 * m - 1, dh), 3)
    ours = fused_rel_attention(q, k, v, e, 0, m, 0)
    ref = xla_rel_attention(q, k, v, e, m)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5)


def test_gradients_match_xla():
    b, h, t, dh, m = 2, 2, 96, 16, 30
    q = _rand((b, h, t, dh), 0)
    k = _rand((b, h, t, dh), 1)
    v = _rand((b, h, t, dh), 2)
    e = _rand((h, 2 * m - 1, dh), 3)
    w = _rand((b, h, t, dh), 4)  # projection to scalar loss

    def loss_fused(q, k, v, e):
        return jnp.sum(fused_rel_attention(q, k, v, e, 0, m, 0) * w)

    def loss_xla(q, k, v, e):
        return jnp.sum(xla_rel_attention(q, k, v, e, m) * w)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, e)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b_, name in zip(g1, g2, "qkve"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-5, err_msg=f"d{name}")


def test_dropout_rate_and_identical_mask_in_bwd():
    b, h, t, dh, m = 1, 2, 128, 16, 100
    q = _rand((b, h, t, dh), 0)
    k = _rand((b, h, t, dh), 1)
    v = jnp.ones((b, h, t, dh), jnp.float32)
    e = jnp.zeros((h, 2 * m - 1, dh), jnp.float32)
    thresh = int(0.25 * 2 ** 32)

    out = fused_rel_attention(q, k, v, e, 7, m, thresh)
    # with V=1, each output row = sum of kept, rescaled probs ≈ 1
    mean = float(jnp.mean(out))
    assert mean == pytest.approx(1.0, abs=0.05)

    # determinism per seed; different seed -> different pattern
    out2 = fused_rel_attention(q, k, v, e, 7, m, thresh)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = fused_rel_attention(q, k, v, e, 8, m, thresh)
    assert (np.asarray(out) != np.asarray(out3)).any()

    # bwd regenerates the SAME mask: finite-difference check on dV.
    # With fixed probs p (q,k fixed), out = P_drop @ V is LINEAR in V, so
    # grad wrt V must equal the forward's sensitivity exactly.
    def f(v):
        return jnp.sum(fused_rel_attention(q, k, v, e, 7, m, thresh)
                       * _rand((b, h, t, dh), 9))

    g = jax.grad(f)(v)
    dv = _rand((b, h, t, dh), 10) * 1e-2
    lin = float(jnp.sum(g * dv))
    fd = float(f(v + dv) - f(v))
    assert lin == pytest.approx(fd, rel=2e-2)  # f32 cancellation noise


def test_padding_t_not_multiple_of_128():
    """t=200 pads to 256 internally; padded rows/cols must not leak."""
    b, h, t, dh, m = 1, 2, 200, 16, 100
    q = _rand((b, h, t, dh), 0)
    k = _rand((b, h, t, dh), 1)
    v = _rand((b, h, t, dh), 2)
    e = _rand((h, 2 * m - 1, dh), 3)
    full = fused_rel_attention(q, k, v, e, 0, m, 0)
    # same computation at t=128 slice: rows < 128-window unaffected by
    # later keys? NOT true for attention; instead check vs XLA directly
    ref = xla_rel_attention(q, k, v, e, m)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ref),
                               atol=2e-5)
    assert full.shape == (b, h, t, dh)


def test_traced_seed_under_jit_and_grad():
    """The seed is a traced array (per-step fold_in in the trainer)."""
    b, h, t, dh, m = 1, 2, 64, 16, 20
    q = _rand((b, h, t, dh), 0)
    e = _rand((h, 2 * m - 1, dh), 3)
    thresh = int(0.2 * 2 ** 32)

    @jax.jit
    def step(q, seed):
        def loss(q):
            return jnp.sum(fused_rel_attention(q, q, q, e, seed, m,
                                               thresh))
        return jax.value_and_grad(loss)(q)

    l1, g1 = step(q, jnp.asarray(5, jnp.int32))
    l2, _ = step(q, jnp.asarray(6, jnp.int32))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # seed actually changes the mask
    assert np.isfinite(np.asarray(g1)).all()


def test_bf16_packed_pair_path():
    """bf16 engages the packed-pair barrel rolls (two heads' rel planes
    ride one 32-bit rotate); outputs and grads must stay at bf16
    tolerance vs the f32 XLA math."""
    b, h, t, dh, m = 2, 4, 200, 32, 100
    q = _rand((b, h, t, dh), 0).astype(jnp.bfloat16)
    k = _rand((b, h, t, dh), 1).astype(jnp.bfloat16)
    v = _rand((b, h, t, dh), 2).astype(jnp.bfloat16)
    e = _rand((h, 2 * m - 1, dh), 3).astype(jnp.bfloat16)
    out = fused_rel_attention(q, k, v, e, 0, m, 0)
    ref = xla_rel_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), e.astype(jnp.float32),
                            m)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=5e-3)

    def loss(q):
        return jnp.sum(
            fused_rel_attention(q, k, v, e, 0, m, 0).astype(jnp.float32)
            ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g, np.float32)).all()
