"""Fused relative-position attention (Pallas TPU kernel).

Computes, per batch-chunk grid cell (all heads in-cell), entirely in
VMEM:

    S = Q K^T / sqrt(d)  +  skew(Q E_h^T)  [+ padding mask]
    P = dropout(softmax(S))
    O = P V

replacing the XLA path's chain of materialized (B, H, T, T) tensors
(rel2abs one-hot matmul, OOR mask add, softmax, dropout mask, probs).

Design notes (all perf-load-bearing):

- **One grid cell per chunk, heads unrolled in-kernel**: the per-cell
  Pallas overhead is amortized 8x vs a (H, B) grid, and the rel table
  block is resident across the whole grid (constant index map).
- **Fused [E | K] contraction**: per head one (T, d)x(d, W+W) MXU op
  produces both the relative and the content logits, with E first so
  both slices land on 128-lane boundaries.
- **Rows pad to the sublane tile (16), not the lane tile (128)**: T=200
  runs as 208 query rows, not 256 — only the lane (key) axis needs the
  128 multiple. Saves ~23% of every in-kernel op.
- **Every matmul keeps its operands in the input dtype** (bf16 in
  training): f32 operands run the MXU at a fraction of its bf16 rate,
  which dominated the backward pass in the first version of this
  kernel. Accumulation stays f32 via preferred_element_type.
- The relative→absolute "skew" is a **barrel shifter**: row q of the
  width-W rel-logit block rotates by (q−(m−1)) mod W in log2(W)
  constant-shift ``pltpu.roll`` stages, each applied only to rows whose
  rotation amount has that bit set. (Mosaic's native strided
  ``tpu.dynamic_rotate`` refuses any vreg whose 8 row shifts cross a
  multiple of the 128-lane width, which a 256-row stride-1 rotation
  always does — so the barrel shifter is the general lowering.)
  ALL heads share ONE barrel pass (``_roll_many``): the rotation amount
  depends only on the row index within a block, so the per-head (T, W)
  planes — bf16 head pairs packed into the 32-bit lanes, f32 heads
  bitcast — stack along the sublane axis and roll together with
  row-periodic amounts, so 1 barrel fwd + 1 bwd replaces 4+4
  (prof_attn3 knockouts: stacking shaved ~1.6 ms/step of per-pass
  overhead, 11.47 → 11.68 steps/s; the surviving ~6.9 ms/step is the
  log2(W)·rows VPU roll work itself, now at its own roofline).
  Out-of-window positions may read aliased values — a post-roll
  |k−q| ≤ m−1 mask overwrites them with the reference's −1e8 OOR logit
  (``transformer.py:255-261``), so aliasing is harmless and W stays at
  max(T, 2m−1) rounded to the lane width (256 for the training shape,
  not 512).
- Backward is flash-style recompute (``custom_vjp``): S and P are
  rebuilt in-kernel (the dropout mask regenerates from the same
  per-(chunk, head) PRNG seed), then dV, dS, dQ, dK and the rel-table
  gradient dE (accumulated across the sequential batch grid axis) are
  emitted. The unskew is the inverse barrel roll. Nothing quadratic
  ever touches HBM.

Aliasing safety for the unskew: a wrapped read lands ≥ W−(m−1) ≥ m
columns away from the diagonal (W ≥ 2m−1 by construction), where dS is
exactly zero (softmax of the −1e8 OOR logit), so no mask is needed
beyond the existing 2m−1 column guard.

Reference semantics: ``transformer.py:96-111``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e8  # the reference's out-of-range logit


def _round_up(t: int, mult: int) -> int:
    return max(mult, -(-t // mult) * mult)


def _roll_rows(x: jnp.ndarray, shift: int, stride: int,
               period: int | None = None) -> jnp.ndarray:
    """Right-rotate row q of ``x`` (R, W) by (shift + stride·(q mod
    period)) mod W. ``period`` lets several (T, W) blocks stack along
    the sublane axis and share ONE barrel pass (the rotation pattern
    repeats every T rows)."""
    w = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    if period is not None and period < x.shape[0]:
        row = row % period
    amount = (shift + stride * row) % w
    bit = 1
    while bit < w:
        rolled = pltpu.roll(x, bit, 1)
        x = jnp.where((amount & bit) != 0, rolled, x)
        bit <<= 1
    return x


def _cell_valid(t_pad: int, w: int, m: int, t_real: int) -> jnp.ndarray:
    """(T, W) in-window & in-range mask — shared by every head."""
    row = jax.lax.broadcasted_iota(jnp.int32, (t_pad, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, w), 1)
    off = col - row
    return (off >= 1 - m) & (off <= m - 1) & (col < t_real)


def _pack16(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Two bf16 (T, W) planes → one uint32 (T, W): a high, b low."""
    ua = pltpu.bitcast(a, jnp.uint16).astype(jnp.uint32)
    ub = pltpu.bitcast(b, jnp.uint16).astype(jnp.uint32)
    return (ua << 16) | ub


def _unpack16(p: jnp.ndarray):
    hi = pltpu.bitcast((p >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = pltpu.bitcast(p.astype(jnp.uint16), jnp.bfloat16)
    return hi, lo


def _roll_many(rs, shift: int, stride: int):
    """Roll EVERY (T, W) block in ``rs`` by the same row-periodic
    amounts in ONE barrel pass. bf16 blocks pack in pairs into the
    32-bit lanes; f32 blocks bitcast to u32; all planes then stack
    along the sublane axis (the rotation pattern repeats every T rows,
    ``_roll_rows(period=T)``). One log2(W)-stage barrel for all heads
    replaces H/2 passes — measured ~1.6 ms/step of per-pass overhead
    shaved at the train shape (prof_attn3)."""
    t, w = rs[0].shape
    bf16 = rs[0].dtype == jnp.bfloat16
    planes = []
    if bf16:
        for i in range(0, len(rs) - 1, 2):
            planes.append(_pack16(rs[i], rs[i + 1]))
        if len(rs) % 2:
            planes.append(_pack16(rs[-1], rs[-1]))
    else:
        planes = [pltpu.bitcast(r.astype(jnp.float32), jnp.uint32)
                  for r in rs]
    # Bound the stacked buffer: the barrel keeps ~2-3 live copies of it
    # (roll + select temporaries), so an unbounded stack can blow the
    # kernel's scoped VMEM (observed at H=8 f32 T=200 W=256: 17.06M vs
    # the 16M default scope). 2 MiB keeps the production bf16 train
    # shape (4 packed planes x 200x256x4B = 819 KB) in ONE pass and
    # chunks only the outsized/f32 shapes.
    max_stack = 2 * 1024 * 1024
    per_plane = t * w * 4
    group = max(1, min(len(planes), max_stack // per_plane))
    rolled_planes = []
    for g0 in range(0, len(planes), group):
        chunk = planes[g0:g0 + group]
        stacked = chunk[0] if len(chunk) == 1 else jnp.concatenate(
            chunk, axis=0)
        rolled = _roll_rows(stacked, shift, stride, period=t)
        for j in range(len(chunk)):
            rolled_planes.append(
                rolled[j * t:(j + 1) * t] if len(chunk) > 1 else rolled)
    outs = []
    for j, p in enumerate(rolled_planes):
        if bf16:
            hi, lo = _unpack16(p)
            outs.append(hi)
            if 2 * j + 1 < len(rs):
                outs.append(lo)
        else:
            outs.append(pltpu.bitcast(p, jnp.float32))
    return outs


def _skew_many(rs, m: int):
    """All heads' (T, W) rel→absolute skews, one stacked barrel pass."""
    w = rs[0].shape[-1]
    return _roll_many(rs, (w - m + 1) % w, 1)


def _unskew_many(dss, m: int):
    """All heads' (T, W) absolute→rel unskews, one stacked barrel pass."""
    w = dss[0].shape[-1]
    return _roll_many(dss, (m - 1) % w, w - 1)


def _softmax_drop(s_unmasked, valid, h, b, seed_ref, *, n_heads,
                  drop_threshold):
    """Mask → softmax (compute dtype) → in-kernel dropout."""
    cd = s_unmasked.dtype
    s = jnp.where(valid, s_unmasked, jnp.asarray(NEG, cd))
    # softmax in the compute dtype — max-subtracted, so bf16 is safe and
    # matches the XLA path's bf16 softmax (transformer.py:198-201)
    smax = jnp.max(s, axis=-1, keepdims=True)
    ex = jnp.exp(s - smax)
    p_soft = ex / jnp.sum(ex, axis=-1, keepdims=True)

    if drop_threshold == 0:
        return p_soft, p_soft
    cell_seed = seed_ref[0] + b * n_heads + h
    if _use_interpret() or os.environ.get("SSTPU_KERNEL_HASH_DROP") == "1":
        # the CPU interpreters stub the TPU PRNG (zeros); a hash mixer
        # keeps the semantics (deterministic per seed, uniform) testable.
        # The env knob selects it on TPU too (A/B vs the hardware PRNG —
        # fwd and bwd take the same branch, so the regen contract holds)
        bits = _hash_bits(p_soft.shape, cell_seed.astype(jnp.uint32))
    else:
        pltpu.prng_seed(cell_seed)
        bits = pltpu.bitcast(pltpu.prng_random_bits(p_soft.shape),
                             jnp.uint32)
    keep = bits >= np.uint32(drop_threshold)
    inv_keep = 1.0 / (1.0 - drop_threshold / 2.0 ** 32)
    p_post = jnp.where(keep, p_soft * inv_keep, 0.0)
    return p_soft, p_post


def _head_logits(q, ke, *, scale, w):
    """One fused contraction → (content·scale (T, W) f32, rel (T, W) f32)."""
    s_all = jax.lax.dot_general(
        q, ke, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (T, 2W)
    return s_all[:, w:] * scale, s_all[:, :w]


def _all_probs(qs, kes, valid, b, seed_ref, *, scale, m, w,
               n_heads, drop_threshold):
    """(p_soft, p_post) for every head; all heads' rel→abs skews share
    one stacked barrel pass (bf16 additionally packs head pairs into
    the 32-bit lanes — f32 keeps full precision via bitcast planes)."""
    cd = qs[0].dtype
    logits = [_head_logits(q, ke, scale=scale, w=w)
              for q, ke in zip(qs, kes)]
    rels = [r.astype(cd) if cd == jnp.bfloat16 else r
            for _, r in logits]
    sks = _skew_many(rels, m)
    ss = [(c + sk.astype(jnp.float32)).astype(cd)
          for (c, _), sk in zip(logits, sks)]
    return [_softmax_drop(s, valid, h, b, seed_ref, n_heads=n_heads,
                          drop_threshold=drop_threshold)
            for h, s in enumerate(ss)]


def _hash_bits(shape, seed: jnp.ndarray) -> jnp.ndarray:
    """Deterministic uint32 mixer over (row, col, seed) — interpret-mode
    stand-in for the hardware PRNG (murmur3-style finalizer)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * np.uint32(0x9E3779B1)) ^ (c * np.uint32(0x85EBCA77)) ^ seed
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, e_ref, o_ref,
                *, scale, m, t_real, w, n_heads, drop_threshold):
    b = pl.program_id(0)
    t_pad = q_ref.shape[2]
    valid = _cell_valid(t_pad, w, m, t_real)
    kes = [jnp.concatenate([e_ref[h], k_ref[0, h]], axis=0)
           for h in range(n_heads)]
    ps = _all_probs([q_ref[0, h] for h in range(n_heads)], kes, valid,
                    b, seed_ref, scale=scale, m=m, w=w,
                    n_heads=n_heads, drop_threshold=drop_threshold)
    for h, (_, p) in enumerate(ps):
        o_ref[0, h] = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, h],
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, e_ref, do_ref,
                dq_ref, dk_ref, dv_ref, de_ref,
                *, scale, m, t_real, w, n_heads, drop_threshold):
    b = pl.program_id(0)
    t_pad = q_ref.shape[2]
    valid = _cell_valid(t_pad, w, m, t_real)

    @pl.when(b == 0)
    def _():
        de_ref[...] = jnp.zeros(de_ref.shape, de_ref.dtype)

    cd = q_ref.dtype
    kes = [jnp.concatenate([e_ref[h], k_ref[0, h]], axis=0)
           for h in range(n_heads)]
    ps = _all_probs([q_ref[0, h] for h in range(n_heads)], kes, valid,
                    b, seed_ref, scale=scale, m=m, w=w,
                    n_heads=n_heads, drop_threshold=drop_threshold)

    dscs = []
    for h, (p_soft, p_post) in enumerate(ps):
        do = do_ref[0, h]
        dv_ref[0, h] = jax.lax.dot_general(
            p_post.astype(cd), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            do, v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, W)

        # y = drop(softmax(s)):
        #   ds = p_post⊙dp − p_soft·Σ_k(p_post⊙dp)
        prod = p_post * dp
        ds = prod - p_soft * jnp.sum(prod, axis=-1, keepdims=True)
        dscs.append(ds.astype(cd))

    # every head's unskew in one stacked barrel pass
    drs = _unskew_many(dscs, m)

    for h, (ke, dsc, dr) in enumerate(zip(kes, dscs, drs)):
        q = q_ref[0, h]
        dr = dr.astype(cd)
        col = jax.lax.broadcasted_iota(jnp.int32, dr.shape, 1)
        dr = jnp.where(col < 2 * m - 1, dr, jnp.zeros((), cd))

        # dQ = dR·E + (scale·dS)K as one fused contraction over [E | K]
        dr_ds = jnp.concatenate(
            [dr, dsc * jnp.asarray(scale, cd)], axis=1)  # (T, 2W)
        dq_ref[0, h] = jax.lax.dot(
            dr_ds, ke, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)

        dk_ref[0, h] = (jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(
                dk_ref.dtype)

        de_ref[h] += jax.lax.dot_general(
            dr, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _pad_t(x, t_pad):
    t = x.shape[2]
    if t == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))


def _pad_rows(x, rows):
    if x.shape[1] == rows:
        return x
    return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))


def _geometry(t: int, m: int, dtype):
    # query rows pad to the sublane tile; the key/lane axis W pads to
    # the 128-lane tile and doubles as the roll width, with W ≥ 2m−1
    # keeping every in-window skew read un-wrapped and every wrapped
    # unskew read in the guaranteed-zero OOR region (module docstring)
    sublane = 16 if dtype in (jnp.bfloat16, np.dtype("bfloat16")) else 8
    t_pad = _round_up(t, sublane)
    w = _round_up(max(t_pad, 2 * m - 1), 128)
    return t_pad, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_rel_attention(q, k, v, rel_emb, seed, max_dist, drop_threshold):
    """``softmax(QK^T/√d + learned rel-position logits) @ V``, fused.

    q, k, v: (B, H, T, d_head); rel_emb: (H, 2·max_dist−1, d_head).
    ``seed``: int32 scalar/array (traced is fine — vary per step).
    ``drop_threshold``: static uint32 threshold for in-kernel dropout on
    the attention probabilities (drop iff random bits < t; 0 = off).
    """
    out, _ = _fwd(q, k, v, rel_emb, seed, max_dist, drop_threshold)
    return out


def _prep(q, k, v, rel_emb, seed, max_dist):
    b, h, t, dh = q.shape
    t_pad, w = _geometry(t, max_dist, q.dtype)
    qp = _pad_t(q, t_pad)
    kp, vp = _pad_t(k, w), _pad_t(v, w)  # key-axis operands at W rows
    ep = _pad_rows(rel_emb, w)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    spec_q = pl.BlockSpec((1, h, t_pad, dh), lambda j, *_: (j, 0, 0, 0))
    spec_kv = pl.BlockSpec((1, h, w, dh), lambda j, *_: (j, 0, 0, 0))
    spec_e = pl.BlockSpec((h, w, dh), lambda j, *_: (0, 0, 0))
    return (b, h, t, dh, t_pad, w, qp, kp, vp, ep, seed_arr,
            spec_q, spec_kv, spec_e)


def _fwd(q, k, v, rel_emb, seed, max_dist, drop_threshold):
    (b, h, t, dh, t_pad, w, qp, kp, vp, ep, seed_arr,
     spec_q, spec_kv, spec_e) = _prep(q, k, v, rel_emb, seed, max_dist)

    kernel = functools.partial(
        _fwd_kernel, scale=1.0 / (dh ** 0.5), m=max_dist, t_real=t,
        w=w, n_heads=h, drop_threshold=int(drop_threshold))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[spec_q, spec_kv, spec_kv, spec_e],
            out_specs=spec_q,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the stacked barrel's live temporaries push past the 16M
            # default scope on f32/small-dh shapes; v5e VMEM is 128M
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_use_interpret(),
    )(seed_arr, qp, kp, vp, ep)
    return out[:, :, :t], (q, k, v, rel_emb, seed)


def _bwd(max_dist, drop_threshold, res, g):
    q, k, v, rel_emb, seed = res
    (b, h, t, dh, t_pad, w, qp, kp, vp, ep, seed_arr,
     spec_q, spec_kv, spec_e) = _prep(q, k, v, rel_emb, seed, max_dist)
    gp = _pad_t(g, t_pad)

    kernel = functools.partial(
        _bwd_kernel, scale=1.0 / (dh ** 0.5), m=max_dist, t_real=t,
        w=w, n_heads=h, drop_threshold=int(drop_threshold))
    dq, dk, dv, de = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[spec_q, spec_kv, spec_kv, spec_e, spec_q],
            out_specs=[spec_q, spec_kv, spec_kv, spec_e],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, t_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, w, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, w, dh), v.dtype),
            jax.ShapeDtypeStruct((h, w, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_use_interpret(),
    )(seed_arr, qp, kp, vp, ep, gp)
    seed_ct = np.zeros(np.shape(seed), jax.dtypes.float0)
    return (dq[:, :, :t], dk[:, :, :t], dv[:, :, :t],
            de[:, : 2 * max_dist - 1].astype(rel_emb.dtype), seed_ct)


fused_rel_attention.defvjp(_fwd, _bwd)


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"
