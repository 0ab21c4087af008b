"""Standalone attention-core profiling at the real train-step shape.

Times N in-jit iterations (lax.scan) of fwd+bwd through the attention
module, device-resident args, so relay dispatch noise is amortized.
"""
import sys; sys.path.insert(0, ".")
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from silent_speech_tpu.models.transformer import RelativePositionalAttention

B, T, D, H, M = 112, 200, 768, 8, 100
N = 20


def bench(fused: bool, dropout: float) -> float:
    mod = RelativePositionalAttention(
        d_model=D, n_head=H, dropout=dropout, max_dist=M,
        dtype=jnp.bfloat16, fused=fused)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, D)),
                    jnp.float32)
    params = mod.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x,
                      deterministic=dropout == 0)

    def loss(p, x, key):
        out = mod.apply(p, x, deterministic=dropout == 0,
                        rngs={"dropout": key} if dropout else {})
        return jnp.sum(out.astype(jnp.float32) ** 2)

    @jax.jit
    def many(p, x):
        def body(c, i):
            g = jax.grad(loss)(p, c, jax.random.fold_in(
                jax.random.PRNGKey(7), i))
            leaf = jax.tree_util.tree_leaves(g)[0]
            return c + 1e-12 * jnp.mean(leaf) * jnp.ones_like(c), None
        c, _ = jax.lax.scan(body, x, jnp.arange(N))
        return c

    r = many(params, x)
    float(jnp.sum(r))
    t0 = time.time()
    r = many(params, x)
    float(jnp.sum(r))
    dt = time.time() - t0
    return dt / N * 1000


if __name__ == "__main__":
    for fused in (False, True):
        for drop in (0.0, 0.2):
            ms = bench(fused, drop)
            print(f"fused={fused} dropout={drop}: {ms:7.2f} ms/iter "
                  f"(x6 layers = {6*ms:6.1f} ms)", flush=True)
