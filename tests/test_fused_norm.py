"""Fused residual+dropout+LayerNorm: forward and gradient parity vs the
unfused flax composition (reference chain ``transformer.py:48-60``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from silent_speech_tpu.ops.dropout import regen_dropout
from silent_speech_tpu.ops.fused_norm import (
    FusedResidualNorm, residual_dropout_ln)


def _unfused(x, h, key, t, gamma, beta, eps):
    z = x + (regen_dropout(h, key, t) if t else h)
    z32 = z.astype(jnp.float32)
    mu = jnp.mean(z32, axis=-1, keepdims=True)
    var = jnp.var(z32, axis=-1, keepdims=True)
    xhat = (z32 - mu) * jax.lax.rsqrt(var + eps)
    return (xhat * gamma + beta).astype(x.dtype)


@pytest.mark.parametrize("t", [0, 51])
def test_forward_matches_unfused(t):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 64)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(4, 16, 64)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(64,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    key = jax.random.PRNGKey(7)
    y_f = jax.jit(residual_dropout_ln, static_argnums=(3, 6))(
        x, h, key, t, gamma, beta, 1e-6)
    y_u = jax.jit(_unfused, static_argnums=(3, 6))(
        x, h, key, t, gamma, beta, 1e-6)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t", [0, 51])
def test_grads_match_unfused(t):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 8, 32)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(3, 8, 32)), jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(32,)) + 1.0, jnp.float32)
    beta = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    key = jax.random.PRNGKey(3)
    co = jnp.asarray(rng.normal(size=(3, 8, 32)), jnp.float32)

    def loss_f(x, h, gamma, beta):
        return jnp.sum(residual_dropout_ln(
            x, h, key, t, gamma, beta, 1e-6) * co)

    def loss_u(x, h, gamma, beta):
        return jnp.sum(_unfused(x, h, key, t, gamma, beta, 1e-6) * co)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))(x, h, gamma, beta)
    gu = jax.jit(jax.grad(loss_u, argnums=(0, 1, 2, 3)))(x, h, gamma, beta)
    for a, b in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_module_param_tree_matches_layernorm():
    """FusedResidualNorm(name=...) must produce the same param paths as
    nn.LayerNorm so existing checkpoints load unchanged."""
    x = jnp.ones((2, 4, 16))
    m = FusedResidualNorm(rate=0.1, name="norm1")
    v = m.init({"params": jax.random.PRNGKey(0)}, x, x, True)
    assert set(v["params"].keys()) == {"scale", "bias"}
    assert v["params"]["scale"].shape == (16,)

    ln = nn.LayerNorm(name="norm1")
    vl = ln.init({"params": jax.random.PRNGKey(0)}, x)
    assert set(vl["params"].keys()) == set(v["params"].keys())


def test_deterministic_no_dropout_rng_needed():
    x = jnp.ones((2, 4, 16))
    m = FusedResidualNorm(rate=0.5)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, x, True)
    y = m.apply(v, x, x, True)   # deterministic: no dropout rng provided
    assert np.isfinite(np.asarray(y)).all()


def test_bf16_dtypes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.bfloat16)
    h = jnp.asarray(rng.normal(size=(2, 8, 32)), jnp.bfloat16)
    gamma = jnp.ones((32,), jnp.float32)
    beta = jnp.zeros((32,), jnp.float32)
    key = jax.random.PRNGKey(5)
    y = residual_dropout_ln(x, h, key, 51, gamma, beta, 1e-6)
    assert y.dtype == jnp.bfloat16
    g = jax.grad(lambda x: jnp.sum(residual_dropout_ln(
        x, h, key, 51, gamma, beta, 1e-6).astype(jnp.float32)))(x)
    assert g.dtype == jnp.bfloat16
