"""On-chip parity check of the fused rel-attention kernel vs XLA math.

The pytest suite runs the kernel in interpret mode (CPU); this validates
the actual Mosaic lowering on the TPU at the training shape family —
fwd and grads, bf16 and f32. Run after any kernel change:
    python tools/check_attn_chip.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from silent_speech_tpu.ops.pallas.rel_attention import (  # noqa: E402
    fused_rel_attention)
sys.path.insert(0, "tests")
from test_rel_attention import xla_rel_attention  # noqa: E402


def check(b, h, t, dh, m, dtype, atol):
    rng = np.random.default_rng(0)
    cast = lambda a: jnp.asarray(a * 0.3, dtype)  # noqa: E731
    q = cast(rng.normal(size=(b, h, t, dh)))
    k = cast(rng.normal(size=(b, h, t, dh)))
    v = cast(rng.normal(size=(b, h, t, dh)))
    e = cast(rng.normal(size=(h, 2 * m - 1, dh)))
    w = cast(rng.normal(size=(b, h, t, dh)))

    ours = jax.jit(lambda *a: fused_rel_attention(*a, 0, m, 0))(q, k, v, e)
    ref = xla_rel_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32), e.astype(jnp.float32),
                            m)
    err = float(jnp.max(jnp.abs(ours.astype(jnp.float32) - ref)))
    assert err < atol, f"fwd {dtype} err {err}"

    def loss_fused(q, k, v, e):
        return jnp.sum((fused_rel_attention(q, k, v, e, 0, m, 0)
                        * w).astype(jnp.float32))

    def loss_xla(q, k, v, e):
        return jnp.sum((xla_rel_attention(q, k, v, e, m)
                        * w.astype(q.dtype)).astype(jnp.float32))

    gtol = max(atol, 2e-2)  # grads chain more bf16-decomposed matmuls
    g1 = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(q, k, v, e)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3)))(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), e.astype(jnp.float32))
    for a, b_, name in zip(g1, g2, "qkve"):
        scale = float(jnp.max(jnp.abs(b_))) + 1e-6
        rerr = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_))) / scale
        assert rerr < gtol, f"d{name} {dtype} rel err {rerr}"
    print(f"ok b={b} h={h} t={t} dh={dh} m={m} {np.dtype(dtype).name} "
          f"fwd_err={err:.2e}", flush=True)


if __name__ == "__main__":
    # On-chip f32 tolerance is ~1e-3, NOT the interpret-mode 3e-5: TPU
    # f32 matmuls decompose into bf16 MXU passes at default precision,
    # and the fused kernel and the XLA reference accumulate differently
    # (measured 1.10e-3 on both the pre- and post-stacked-skew kernels —
    # the check guards the skew/mask/softmax SEMANTICS, where a break
    # shows up as O(1) error).
    assert jax.devices()[0].platform == "tpu", "needs the chip"
    check(2, 8, 200, 96, 100, jnp.float32, 3e-3)
    check(2, 8, 200, 96, 100, jnp.bfloat16, 4e-2)
    check(1, 3, 64, 16, 100, jnp.float32, 3e-3)   # odd heads, T < window
    check(2, 2, 150, 32, 40, jnp.bfloat16, 4e-2)  # window < T
    # the head-to-head trainer shape family: 8 f32 heads of d_h=16 at
    # T=200/W=256 — the stacked barrel's VMEM-OOM regression shape
    # (8 full-width f32 planes; chunked stacking + 32M scope fix)
    check(8, 8, 200, 16, 100, jnp.float32, 3e-3)
    print("all on-chip parity checks passed", flush=True)
