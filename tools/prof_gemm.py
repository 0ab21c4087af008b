"""Achieved bf16 GEMM TFLOP/s on this chip (scanned in-jit loop)."""
import time
import numpy as np
import jax, jax.numpy as jnp

def bench_gemm(m, k, n, iters=30):
    a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)), jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)), jnp.bfloat16)

    @jax.jit
    def many(a, b):
        def body(c, _):
            out = (a @ b)
            # fold back to keep the loop serial & defeat CSE
            return a + out[:, :1].astype(a.dtype) * 1e-9, None
        c, _ = jax.lax.scan(body, a, jnp.arange(iters))
        return c

    r = many(a, b); jnp.sum(r.astype(jnp.float32)).block_until_ready()
    t0 = time.time()
    r = many(a, b); float(jnp.sum(r.astype(jnp.float32)))
    dt = time.time() - t0
    fl = 2 * m * k * n * iters
    print(f"GEMM {m}x{k}x{n}: {fl/dt/1e12:7.1f} TFLOP/s  ({dt/iters*1000:.2f} ms/iter)", flush=True)

bench_gemm(22400, 768, 3072)
bench_gemm(22400, 3072, 768)
bench_gemm(4096, 4096, 4096)
bench_gemm(22400, 768, 768)
