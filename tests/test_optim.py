"""fused_adamw (bf16-moment AdamW) vs stock optax.adamw."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from silent_speech_tpu.train.state import (fused_adamw, make_adamw,
                                           set_learning_rate)


def _tree(rng, scale=1.0):
    return {
        "w": jnp.asarray(rng.normal(size=(64, 32)) * scale, jnp.float32),
        "b": jnp.asarray(rng.normal(size=(32,)) * scale, jnp.float32),
    }


def _run(tx, params, grads_seq, lr=1e-3):
    # jit the update like the real train step does — eager vs traced
    # lowering of `decay**count` differs at the last ulp otherwise
    step = jax.jit(tx.update)
    state = tx.init(params)
    for g in grads_seq:
        if hasattr(state, "hyperparams"):
            state = set_learning_rate(state, lr)
        updates, state = step(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


@pytest.mark.parametrize("wd", [0.0, 1e-2])
def test_f32_moments_match_optax(wd):
    rng = np.random.default_rng(0)
    params = _tree(rng)
    grads = [_tree(np.random.default_rng(s), 0.1) for s in range(5)]

    ours = _run(fused_adamw(1e-3, weight_decay=wd,
                            moment_dtype=jnp.float32), params, grads)
    ref = _run(optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd), params, grads)
    for k in params:
        # identical arithmetic; XLA fusion reassociation leaves ulp noise
        np.testing.assert_allclose(np.asarray(ours[k]),
                                   np.asarray(ref[k]), rtol=1e-5,
                                   atol=1e-7)


def test_bf16_moments_close_to_f32():
    rng = np.random.default_rng(1)
    params = _tree(rng)
    grads = [_tree(np.random.default_rng(10 + s), 0.1) for s in range(20)]

    bf16 = _run(fused_adamw(1e-3, moment_dtype=jnp.bfloat16), params,
                grads)
    f32 = _run(fused_adamw(1e-3, moment_dtype=jnp.float32), params, grads)
    for k in params:
        # parameter drift from bf16 moment quantization stays tiny over
        # 20 steps relative to the update magnitude (~lr * steps)
        diff = np.abs(np.asarray(bf16[k]) - np.asarray(f32[k])).max()
        assert diff < 20 * 1e-3 * 0.05, (k, diff)


def test_make_adamw_injectable_lr_both_dtypes():
    rng = np.random.default_rng(2)
    params = _tree(rng)
    g = _tree(np.random.default_rng(3), 0.1)
    for md in ("bfloat16", "float32"):
        tx = make_adamw(weight_decay=1e-7, moment_dtype=md)
        state = tx.init(params)
        state = set_learning_rate(state, 5e-4)
        updates, state = tx.update(g, state, params)
        assert float(state.hyperparams["learning_rate"]) == \
            pytest.approx(5e-4)
        newp = optax.apply_updates(params, updates)
        assert not np.allclose(np.asarray(newp["w"]),
                               np.asarray(params["w"]))
        # moment storage dtype honored
        inner = state.inner_state
        leaf = jax.tree_util.tree_leaves(
            inner.mu if hasattr(inner, "mu") else inner[0].mu)[0]
        want = jnp.bfloat16 if md == "bfloat16" else jnp.float32
        assert leaf.dtype == want


def test_multisteps_wrap_with_bf16():
    rng = np.random.default_rng(4)
    params = _tree(rng)
    g = _tree(np.random.default_rng(5), 0.1)
    tx = make_adamw(grad_accum=2, moment_dtype="bfloat16")
    state = tx.init(params)
    state = set_learning_rate(state, 1e-3)
    up1, state = tx.update(g, state, params)
    # first micro-step: no application yet
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree_util.tree_leaves(up1))
    up2, state = tx.update(g, state, params)
    assert any(float(jnp.abs(x).max()) > 0.0
               for x in jax.tree_util.tree_leaves(up2))
