"""Itemize the attention-internal non-GEMM work + conv epilogues +
batch-assembly gathers (VERDICT r4 item 6: ROOFLINE.md §3's
"unattributed ~10 ms" must be attributed to the same floor-vs-measured
standard as the knockout rows, or shaved).

Three sections, all at the exact train-step geometry (B=112 chunks,
T=200 frames, d=768, H=8, m=100, bf16 compute, dropout 0.2):

1. **Fused attention kernel knockouts.** The Pallas kernel's non-GEMM
   stages (softmax, barrel-shifter skew, OOR mask, in-kernel dropout)
   are disabled one at a time by monkeypatching the module internals
   (a fresh ``jax.jit`` per variant re-traces the kernel under the
   patch), fwd+bwd through a lax.scan of N steps so the tunnel dispatch
   amortizes. The marginal cost of each stage ×6 layers itemizes the
   attention share of the remainder; the all-off "bare" variant is the
   kernel's measured contraction floor (its analytic GEMM content at
   the chip's measured bf16 rate is printed beside it).

2. **Conv stack (3 ResBlocks) floor-vs-measured.** fwd+bwd of the
   encoder's conv downsample at (112, 1600, 8) vs the stack's analytic
   GEMM FLOPs — the gap is the BN/relu/shortcut epilogue cost that XLA
   could not fuse away.

3. **Batch-assembly gathers.** ``assemble_batch`` (device_cache) timed
   standalone vs its HBM floor (bytes gathered / measured 819 GB/s).

Writes docs/tpu_sweep/prof_attn3.json. Run: python tools/prof_attn3.py
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import silent_speech_tpu.ops.pallas.rel_attention as ra  # noqa: E402

B, H, T, DH, M = 112, 8, 200, 96, 100
N = 30
DROP = 0.2
THRESH = min(int(round(DROP * 2.0 ** 32)), 0xFFFFFFFF)
GEMM_RATE = 134e12  # measured bf16 GEMM rate on this chip (prof_gemm)
HBM_RATE = 819e9    # measured HBM bandwidth (ROOFLINE §3 optimizer row)


def make_softmax_drop(do_mask: bool, do_softmax: bool):
    """Variant of ra._softmax_drop with the mask-apply and/or the
    exp-normalize stage removed (dropout stays, keyed off threshold)."""
    from jax.experimental.pallas import tpu as pltpu

    def f(s_unmasked, valid, h, b, seed_ref, *, n_heads, drop_threshold):
        cd = s_unmasked.dtype
        s = (jnp.where(valid, s_unmasked, jnp.asarray(ra.NEG, cd))
             if do_mask else s_unmasked)
        if do_softmax:
            smax = jnp.max(s, axis=-1, keepdims=True)
            ex = jnp.exp(s - smax)
            p_soft = ex / jnp.sum(ex, axis=-1, keepdims=True)
        else:
            # keep shapes/dtypes; a single VPU multiply stands in
            p_soft = s * jnp.asarray(1.0 / s.shape[-1], cd)
        if drop_threshold == 0:
            return p_soft, p_soft
        cell_seed = seed_ref[0] + b * n_heads + h
        pltpu.prng_seed(cell_seed)
        bits = pltpu.bitcast(pltpu.prng_random_bits(p_soft.shape),
                             jnp.uint32)
        keep = bits >= np.uint32(drop_threshold)
        inv_keep = 1.0 / (1.0 - drop_threshold / 2.0 ** 32)
        p_post = jnp.where(keep, p_soft * inv_keep, 0.0)
        return p_soft, p_post

    return f


ORIG = dict(softmax_drop=ra._softmax_drop, skew_many=ra._skew_many,
            unskew_many=ra._unskew_many, cell_valid=ra._cell_valid)


def apply_patches(*, mask=True, softmax=True, skew=True):
    ra._softmax_drop = (ORIG["softmax_drop"] if (mask and softmax)
                        else make_softmax_drop(mask, softmax))
    if skew:
        ra._skew_many = ORIG["skew_many"]
        ra._unskew_many = ORIG["unskew_many"]
    else:
        ra._skew_many = lambda rs, m: list(rs)
        ra._unskew_many = lambda ds, m: list(ds)


def bench_kernel(thresh: int, **patches) -> float:
    """ms per fwd+bwd of the kernel alone (no projections), N-step scan."""
    apply_patches(**patches)
    try:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, H, T, DH)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, T, DH)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, T, DH)), jnp.bfloat16)
        e = jnp.asarray(rng.normal(size=(H, 2 * M - 1, DH)), jnp.bfloat16)

        def loss(args, seed):
            q, k, v, e = args
            o = ra.fused_rel_attention(q, k, v, e, seed, M, thresh)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        @jax.jit
        def many(q, k, v, e):
            def body(c, i):
                g = jax.grad(loss)((c[0], k, v, e), i.astype(jnp.int32))
                return (c[0] + 1e-12 * g[0].astype(c[0].dtype),
                        c[1] + 1e-12 * jnp.mean(g[3])), None
            c, _ = jax.lax.scan(body, (q, jnp.zeros((), jnp.float32)),
                                jnp.arange(N))
            return c[1] + jnp.sum(c[0].astype(jnp.float32)) * 1e-9

        # float() forces a real host sync (block_until_ready is not a
        # reliable barrier through the axon relay — see bench.py:175)
        float(many(q, k, v, e))
        t0 = time.time()
        float(many(q, k, v, e))
        return (time.time() - t0) / N * 1000
    finally:
        apply_patches()  # restore


def kernel_gemm_flops() -> float:
    """Analytic MXU FLOPs of one fwd+bwd kernel pass (padded shapes)."""
    t_pad, w = ra._geometry(T, M, jnp.bfloat16)
    per_head_fwd = (2 * t_pad * DH * 2 * w    # Q·[E|K]
                    + 2 * t_pad * w * DH)     # P·V
    per_head_bwd = (2 * w * t_pad * DH        # dV = Pᵀ·dO
                    + 2 * t_pad * w * DH      # dP = dO·Vᵀ
                    + 2 * t_pad * 2 * w * DH  # dQ = [dR|dS]·[E|K]
                    + 2 * w * t_pad * DH      # dK = dSᵀ·Q
                    + 2 * w * t_pad * DH)     # dE += dRᵀ·Q
    return B * H * (per_head_fwd + per_head_bwd)


def bench_convs() -> dict:
    """fwd+bwd of the 3-ResBlock stack at the train shape vs GEMM floor."""
    from flax import linen as nn
    from silent_speech_tpu.models.encoder import ResBlock

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(3):
                x = ResBlock(768, stride=2, dtype=jnp.bfloat16,
                             name=f"res{i}")(x, train=train)
            return x

    mod = Stack()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 1600, 8)),
                    jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    def loss(p, x):
        out, _ = mod.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    @jax.jit
    def many(p, x):
        def body(c, i):
            g = jax.grad(loss)(p, c)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return c + 1e-12 * jnp.mean(leaf) * jnp.ones_like(c), None
        c, _ = jax.lax.scan(body, x, jnp.arange(N))
        return jnp.sum(c.astype(jnp.float32))

    float(many(variables["params"], x))
    t0 = time.time()
    float(many(variables["params"], x))
    ms = (time.time() - t0) / N * 1000

    # GEMM flops: per block, conv1 (K=3, stride 2) + conv2 (K=3) +
    # 1x1 shortcut, fwd x3 for fwd+bwd (dx + dw each equal fwd cost)
    flops = 0
    l_in, c_in = 1600, 8
    for _ in range(3):
        l_out = l_in // 2
        flops += 2 * B * l_out * 3 * c_in * 768    # conv1
        flops += 2 * B * l_out * 3 * 768 * 768     # conv2
        flops += 2 * B * l_out * 1 * c_in * 768    # shortcut 1x1
        l_in, c_in = l_out, 768
    flops *= 3  # fwd + dgrad + wgrad
    return {"measured_ms": round(ms, 2),
            "gemm_floor_ms": round(flops / GEMM_RATE * 1e3, 2),
            "gemm_tflop": round(flops / 1e12, 3)}


def bench_assembly() -> dict:
    """assemble_batch standalone vs its HBM gather floor (train caps:
    112 chunks x 200 frames, U=64, t_cap=1024, text_cap=128)."""
    from bench import build_examples
    from silent_speech_tpu.data.device_cache import (DeviceCorpus,
                                                     assemble_batch)

    caps = dict(n_chunks=B, seq_len=T, t_cap=1024, text_cap=128)
    u_cap = 64
    example_sets = [build_examples(np.random.default_rng(i))
                    for i in range(4)]
    all_examples = [e for s in example_sets for e in s]
    corpus = DeviceCorpus.build(all_examples)
    ids_np = np.zeros((4, u_cap), np.int32)
    valid_np = np.zeros((4, u_cap), bool)
    pos = 0
    for j, s in enumerate(example_sets):
        n = min(len(s), u_cap)
        ids_np[j, :n] = np.arange(pos, pos + n)
        valid_np[j, :n] = True
        pos += len(s)
    ids, valid = jnp.asarray(ids_np), jnp.asarray(valid_np)

    @jax.jit
    def many(ids, valid):
        def body(c, i):
            b = assemble_batch(corpus.arrays, ids[i % 4], valid[i % 4],
                               **caps)
            s = (jnp.sum(b.raw_emg.astype(jnp.float32))
                 + jnp.sum(b.audio_features.astype(jnp.float32)))
            return c + s * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(N))
        return c

    float(many(ids, valid))
    t0 = time.time()
    float(many(ids, valid))
    ms = (time.time() - t0) / N * 1000
    # gather traffic floor: read+write of every gathered plane, f32
    g_bytes = (B * T * 64 * 4 * 2            # raw frames
               + u_cap * 1024 * 80 * 4 * 2   # mel targets
               + u_cap * 1024 * 4 * 2 * 2    # phonemes + session/segment
               + u_cap * 128 * 4 * 2)        # text
    return {"measured_ms": round(ms, 2),
            "hbm_floor_ms": round(g_bytes / HBM_RATE * 1e3, 2),
            "gather_mb": round(g_bytes / 2 ** 20, 1),
            "caps": caps, "u_cap": u_cap}


def main():
    out = {"shape": f"B={B} H={H} T={T} dh={DH} m={M} bf16 drop={DROP}",
           "n_iters": N}
    rows = {}
    rows["full"] = bench_kernel(THRESH)
    rows["nodrop"] = bench_kernel(0)
    rows["nosoftmax"] = bench_kernel(THRESH, softmax=False)
    rows["noskew"] = bench_kernel(THRESH, skew=False)
    rows["nomask"] = bench_kernel(THRESH, mask=False)
    rows["bare"] = bench_kernel(0, mask=False, softmax=False, skew=False)
    out["kernel_ms_per_layer"] = {k: round(v, 3) for k, v in rows.items()}
    out["kernel_marginal_ms_x6"] = {
        "softmax": round(6 * (rows["full"] - rows["nosoftmax"]), 2),
        "skew": round(6 * (rows["full"] - rows["noskew"]), 2),
        "mask": round(6 * (rows["full"] - rows["nomask"]), 2),
        "dropout": round(6 * (rows["full"] - rows["nodrop"]), 2),
        "total_nongemm": round(6 * (rows["full"] - rows["bare"]), 2),
    }
    gf = kernel_gemm_flops()
    out["kernel_gemm"] = {
        "tflop_per_layer": round(gf / 1e12, 3),
        "floor_ms_per_layer": round(gf / GEMM_RATE * 1e3, 3),
        "bare_measured_ms": round(rows["bare"], 3),
    }
    print(json.dumps(out["kernel_ms_per_layer"]), flush=True)
    print(json.dumps(out["kernel_marginal_ms_x6"]), flush=True)
    print(json.dumps(out["kernel_gemm"]), flush=True)

    out["conv_stack"] = bench_convs()
    print(json.dumps(out["conv_stack"]), flush=True)
    out["batch_assembly"] = bench_assembly()
    print(json.dumps(out["batch_assembly"]), flush=True)

    os.makedirs("docs/tpu_sweep", exist_ok=True)
    with open("docs/tpu_sweep/prof_attn3.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/tpu_sweep/prof_attn3.json", flush=True)


if __name__ == "__main__":
    main()
