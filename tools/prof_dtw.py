"""DP vs backtrace split of the Pallas DTW kernel at training shape.

Variants: full kernel; DP-only (backtrace skipped); and backtrace with a
per-ROW entry-table (cummax of non-left cells) instead of per-CELL steps.
Run: python tools/prof_dtw.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from silent_speech_tpu.ops.pallas import dtw_kernel as DK

K, T1, T2 = 16, 1024, 1024
BIG = DK.BIG
K_TILE = DK.K_TILE


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    costs = rng.uniform(0.1, 2.0, size=(K, T1, T2)).astype(np.float32)
    n1 = rng.integers(600, 1000, size=(K,)).astype(np.int32)
    n2 = rng.integers(600, 1000, size=(K,)).astype(np.int32)
    return jnp.asarray(costs), jnp.asarray(n1), jnp.asarray(n2)


def bench(fn, name, *args):
    @functools.partial(jax.jit, static_argnums=(3,))
    def run(costs, n1, n2, steps):
        def body(c, i):
            al, pc = fn(c + i * 0.0, n1, n2)
            return c, (al.sum(), pc.sum())
        _, (a, p) = jax.lax.scan(body, costs, jnp.arange(steps))
        return a.sum() + p.sum()

    costs, n1, n2 = args
    import functools as ft
    r2 = ft.partial(run, costs, n1, n2)
    float(r2(2)); float(r2(8))
    t2 = time.time()
    for _ in range(3):
        float(r2(2))
    t2 = (time.time() - t2) / 3
    t8 = time.time()
    for _ in range(3):
        float(r2(8))
    t8 = (time.time() - t8) / 3
    print(f"{name:18s} {(t8 - t2) / 6 * 1000:7.3f} ms/call", flush=True)


# ---- variant: DP only (skip backtrace) --------------------------------
def _dtw_kernel_dponly(n1_ref, n2_ref, s_ref, align_ref, cost_out_ref,
                       choices_ref, prev_ref, corner_ref, *,
                       t1, t2, n_chunks):
    kt = pl.program_id(0)
    c = pl.program_id(1)
    ch = s_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K_TILE, t2), 1)
    n1v = jnp.stack([n1_ref[kt * K_TILE + u] for u in range(K_TILE)])
    n2v = jnp.stack([n2_ref[kt * K_TILE + u] for u in range(K_TILE)])

    def row_body(r, _):
        i = c * ch + r
        s_row = s_ref[:, r, :]
        prev = prev_ref[:, :]

        @pl.when(i == 0)
        def _():
            x0 = jnp.where(col == 0, 0.0, BIG)
            prev_ref[:, :] = x0
            choices_ref[0, :, :] = jnp.zeros((K_TILE, t2), jnp.int8)
            corner_ref[:, :] = jnp.where(
                (col == n2v[:, None] - 1) & (n1v[:, None] == 1), x0, 0.0)

        @pl.when(i > 0)
        def _():
            up = prev
            dg = DK._shift_right(prev, 1, BIG)
            b = jnp.minimum(up, dg)
            b = jnp.where(col == 0, BIG, b)
            s_excl = DK._shift_right(s_row, 1, 0.0)
            m = DK._cummin(b - s_excl, t2)
            x = s_row + m
            x = jnp.where(col == 0, BIG, x)
            left = DK._shift_right(x, 1, BIG)
            pick_up = (up <= left) & (up <= dg)
            pick_left = jnp.logical_and(~pick_up, left <= dg)
            choice = jnp.where(pick_up, 0,
                               jnp.where(pick_left, 1, 2)).astype(jnp.int8)
            choices_ref[pl.ds(i, 1), :, :] = choice[None]
            prev_ref[:, :] = x
            corner_ref[:, :] = corner_ref[:, :] + jnp.where(
                (col == n2v[:, None] - 1) & (i == n1v[:, None] - 1), x, 0.0)
        return 0

    max_n1 = jnp.max(n1v)
    rows_here = jnp.clip(max_n1 - c * ch, 0, ch)
    jax.lax.fori_loop(0, rows_here, row_body, 0)

    @pl.when(c == n_chunks - 1)
    def _():
        corner = jnp.sum(corner_ref[:, :], axis=1)
        for u in range(K_TILE):
            cost_out_ref[kt * K_TILE + u] = corner[u]
            align_ref[u, 0:1, :] = jnp.zeros((1, t1), jnp.int32)


def dponly(costs, n1, n2):
    k, t1, t2 = costs.shape
    ch = DK.ROW_CHUNK
    n_chunks = t1 // ch
    s = jnp.cumsum(costs.astype(jnp.float32), axis=2)
    kernel = functools.partial(_dtw_kernel_dponly, t1=t1, t2=t2,
                               n_chunks=n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k // K_TILE, n_chunks),
        in_specs=[pl.BlockSpec((K_TILE, ch, t2),
                               lambda kt, c, *_: (kt, c, 0))],
        out_specs=[
            pl.BlockSpec((K_TILE, 1, t1), lambda kt, c, *_: (kt, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t1, K_TILE, t2), jnp.int8),
            pltpu.VMEM((K_TILE, t2), jnp.float32),
            pltpu.VMEM((K_TILE, t2), jnp.float32),
        ],
    )
    align, path_cost = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((k, 1, t1), jnp.int32),
                   jax.ShapeDtypeStruct((k,), jnp.float32)],
    )(n1.astype(jnp.int32), n2.astype(jnp.int32), s)
    return align[:, 0, :], path_cost


if __name__ == "__main__":
    args = make_inputs()
    bench(DK.pallas_dtw_align_batch, "full", *args)
    bench(dponly, "dp_only", *args)
