"""Microbench: dropout-mask generation strategies on the real chip.

The regen-dropout masks draw ~620M uint8 words per step (fwd) and again
in bwd. This measures, inside a scanned jit (amortized dispatch), the cost
of producing and applying a keep-mask over a bf16 tensor of the real
per-layer residual size, for several bit-generation strategies.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B, T, D = 112, 200, 4608  # one layer's three dropout sites combined
SHAPE = (B, T, D)
N = int(np.prod(SHAPE))


def apply_mask_u8(x, key):
    bits = jax.random.bits(key, x.shape, jnp.uint8)
    keep = bits >= 51
    return jnp.where(keep, x * jnp.asarray(1.25, x.dtype),
                     jnp.zeros((), x.dtype))


def apply_mask_u32cast(x, key):
    w = jax.random.bits(key, (N // 4,), jnp.uint32)
    bits = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(x.shape)
    keep = bits >= 51
    return jnp.where(keep, x * jnp.asarray(1.25, x.dtype),
                     jnp.zeros((), x.dtype))


def apply_mask_u32direct(x, key):
    # one u32 per element, threshold in 32-bit space (current kernel style)
    bits = jax.random.bits(key, x.shape, jnp.uint32)
    keep = bits >= jnp.uint32(858993459)  # 0.2 * 2^32
    return jnp.where(keep, x * jnp.asarray(1.25, x.dtype),
                     jnp.zeros((), x.dtype))


def apply_mask_u16cast(x, key):
    w = jax.random.bits(key, (N // 2,), jnp.uint32)
    bits = jax.lax.bitcast_convert_type(w, jnp.uint16).reshape(x.shape)
    keep = bits >= 13107  # 0.2 * 2^16
    return jnp.where(keep, x * jnp.asarray(1.25, x.dtype),
                     jnp.zeros((), x.dtype))


def nomask(x, key):
    return x * jnp.asarray(1.25, x.dtype)


def bench(fn, name, steps=30):
    x = jnp.ones(SHAPE, jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(x, key):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            c = fn(c, k)
            c = c * jnp.asarray(0.999, c.dtype)
            return c, ()
        y, _ = jax.lax.scan(body, x, jnp.arange(steps))
        return y

    r = run(x, key)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(3):
        r = run(x, key)
    r.block_until_ready()
    dt = (time.time() - t0) / (3 * steps)
    print(f"{name:16s} {dt*1000:7.3f} ms/apply", flush=True)
    return dt


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    bench(nomask, "nomask")
    bench(apply_mask_u8, "u8")
    bench(apply_mask_u32cast, "u32cast->u8")
    bench(apply_mask_u16cast, "u32cast->u16")
    bench(apply_mask_u32direct, "u32direct")
