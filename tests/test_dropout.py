"""Regenerating dropout: semantics + gradient identity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.ops.dropout import (
    regen_dropout, dropout_threshold, RegenDropout)


def test_rate_and_scaling():
    key = jax.random.PRNGKey(0)
    t = dropout_threshold(0.2)
    x = jnp.ones((512, 512))
    y = np.asarray(jax.jit(regen_dropout, static_argnums=2)(x, key, t))
    kept = y > 0
    assert kept.mean() == pytest.approx(1 - t / 256, abs=5e-3)
    np.testing.assert_allclose(y[kept], 1.0 / (1 - t / 256), rtol=1e-6)


def test_deterministic_per_key():
    key = jax.random.PRNGKey(3)
    x = jnp.ones((256, 128))
    f = jax.jit(regen_dropout, static_argnums=2)
    a = np.asarray(f(x, key, 51))
    b = np.asarray(f(x, key, 51))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(f(x, jax.random.PRNGKey(4), 51))
    assert (a != c).any()


def test_gradient_uses_same_mask():
    """d/dx sum(dropout(x)) must be exactly mask*scale — the regenerated
    backward mask equals the forward mask."""
    key = jax.random.PRNGKey(7)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(128, 64)),
                    jnp.float32)

    def loss(x):
        return jnp.sum(regen_dropout(x, key, 51))

    g = np.asarray(jax.jit(jax.grad(loss))(x))
    y = np.asarray(jax.jit(regen_dropout, static_argnums=2)(x, key, 51))
    mask = (y != 0) | (np.asarray(x) == 0)
    scale = 1.0 / (1 - 51 / 256)
    np.testing.assert_allclose(g[np.asarray(mask)].ravel()[: 10],
                               scale, rtol=1e-6)
    assert (g[~np.asarray(mask)] == 0).all()


def test_module_deterministic_mode_identity():
    x = jnp.ones((8, 8))
    m = RegenDropout(0.5)
    y = m.apply({}, x, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_zero_rate_identity():
    x = jnp.ones((8, 8))
    m = RegenDropout(0.0)
    y = m.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_relu_dropout_matches_composition():
    """relu_dropout == regen_dropout(relu(x)) bit-for-bit in fwd AND grad
    (same key -> same bits; backward mask derived from the output sign)."""
    from silent_speech_tpu.ops.dropout import relu_dropout

    key = jax.random.PRNGKey(9)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(256, 128)),
                    jnp.float32)
    t = 51

    f_fused = jax.jit(lambda x: relu_dropout(x, key, t))
    f_comp = jax.jit(lambda x: regen_dropout(jax.nn.relu(x), key, t))
    np.testing.assert_array_equal(np.asarray(f_fused(x)),
                                  np.asarray(f_comp(x)))

    g_fused = np.asarray(jax.jit(jax.grad(
        lambda x: jnp.sum(jnp.sin(relu_dropout(x, key, t)))))(x))
    g_comp = np.asarray(jax.jit(jax.grad(
        lambda x: jnp.sum(jnp.sin(regen_dropout(
            jax.nn.relu(x), key, t)))))(x))
    np.testing.assert_array_equal(g_fused, g_comp)


def test_relu_dropout_bf16():
    from silent_speech_tpu.ops.dropout import relu_dropout

    key = jax.random.PRNGKey(2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(64, 64)),
                    jnp.bfloat16)
    y = relu_dropout(x, key, 51)
    assert y.dtype == jnp.bfloat16
    g = jax.grad(lambda x: jnp.sum(
        relu_dropout(x, key, 51).astype(jnp.float32)))(x)
    assert g.dtype == jnp.bfloat16
    y_np = np.asarray(y.astype(jnp.float32))
    g_np = np.asarray(g.astype(jnp.float32))
    scale = 1.0 / (1 - 51 / 256)
    assert set(np.unique(g_np[y_np > 0])) <= {np.float32(np.float32(
        jnp.bfloat16(scale)))}
    assert (g_np[y_np == 0] == 0).all()
