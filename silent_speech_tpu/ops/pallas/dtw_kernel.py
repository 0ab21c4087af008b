"""Pallas TPU kernel for monotonic DTW (DP + backtrace in one kernel).

The ``lax.scan`` DTW in :mod:`..dtw` pays per-step dispatch overhead on
its T1+T2 anti-diagonal steps plus another T1+T2 scalar-gather steps for the
backtrace (~25-30 ms per training batch). This kernel runs the whole thing
on-core with VMEM-resident state:

- **DP** row-by-row using the (min, +) semiring closed form: with
  ``b_j = min(dtw[i−1, j], dtw[i−1, j−1])`` and ``S = cumsum(costs[i])``,
  row ``i`` is ``dtw[i, j] = S_j + cummin_j(b_j − S_{j−1})`` — the in-row
  left-to-right dependency becomes a log-depth prefix min, so each row is
  ~30 VPU ops instead of a sequential column loop.
- **Backtrace** as an in-kernel scalar loop over the VMEM DP table with the
  reference's first-minimal tie order (up, left, diag — ``align.py:26``).

Grid = one program per utterance; a (1, T1, T2) cost block plus the (T1, T2)
DP scratch must fit VMEM (≈8 MB at T=1024) — callers fall back to the scan
implementation for larger buckets (see ``dtw.dtw_align_batch_auto``).

Numerics: the cumsum/cummin form accumulates row sums in a different order
than the cell-by-cell reference DP; float32 rounding can differ in the last
ulp, which on near-tied paths may pick an equally-scoring alignment.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _shift_right(x: jnp.ndarray, d: int, fill: float) -> jnp.ndarray:
    """Shift a (1, T) vector right by d, filling the head."""
    rolled = pltpu.roll(x, d, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(idx < d, fill, rolled)


def _cumsum(x: jnp.ndarray, t: int) -> jnp.ndarray:
    d = 1
    while d < t:
        x = x + _shift_right(x, d, 0.0)
        d *= 2
    return x


def _cummin(x: jnp.ndarray, t: int) -> jnp.ndarray:
    d = 1
    while d < t:
        x = jnp.minimum(x, _shift_right(x, d, BIG))
        d *= 2
    return x


def _dtw_kernel(n1_ref, n2_ref, costs_ref, align_ref, cost_out_ref,
                dtw_ref, *, t1: int, t2: int):
    k = pl.program_id(0)
    n1 = n1_ref[k]
    n2 = n2_ref[k]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, t2), 1)

    # row 0: dtw[0,0] = 0 (cost ignored, align.py:7-9), rest BIG
    dtw_ref[0:1, :] = jnp.where(col == 0, 0.0, BIG)

    def row_body(i, _):
        prev = dtw_ref[pl.ds(i - 1, 1), :]                    # (1, T2)
        prev_shift = _shift_right(prev, 1, BIG)               # dtw[i-1, j-1]
        b = jnp.minimum(prev, prev_shift)
        b = jnp.where(col == 0, BIG, b)  # column 0 is a hard boundary
        c = costs_ref[0, pl.ds(i, 1), :]                      # (1, T2)
        s = _cumsum(c, t2)
        s_excl = _shift_right(s, 1, 0.0)
        m = _cummin(b - s_excl, t2)
        dtw_ref[pl.ds(i, 1), :] = s + m
        return 0

    jax.lax.fori_loop(1, t1, row_body, 0)

    def _pick(row: jnp.ndarray, idx) -> jnp.ndarray:
        """row (1, T2) → scalar row[idx] via a masked reduce (Mosaic has no
        dynamic lane-indexed scalar loads)."""
        return jnp.sum(jnp.where(col == idx, row, 0.0))

    corner_row = dtw_ref[pl.ds(n1 - 1, 1), :]
    cost_out_ref[k] = jnp.where(
        n1 + n2 > 2, _pick(corner_row, n2 - 1), 0.0)

    # ---- backtrace -----------------------------------------------------
    # alignment kept as a carried vector (dynamic lane stores are also
    # unsupported); one masked update per step
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (1, t1), 1)

    def bt_body(_, carry):
        i, j, align_vec = carry
        active = (i > 0) & (j > 0)
        align_vec = jnp.where((row_pos == i) & active, j, align_vec)

        iq = jnp.maximum(i - 1, 0)
        jq = jnp.maximum(j - 1, 0)
        row_im = dtw_ref[pl.ds(iq, 1), :]
        row_i = dtw_ref[pl.ds(i, 1), :]
        up = _pick(row_im, j)
        left = _pick(row_i, jq)
        diag = _pick(row_im, jq)
        pick_up = (up <= left) & (up <= diag)
        pick_left = jnp.logical_and(~pick_up, left <= diag)
        ni = jnp.where(pick_left, i, i - 1)
        nj = jnp.where(pick_up, j, j - 1)
        i2 = jnp.where(active, ni, i)
        j2 = jnp.where(active, nj, j)
        return (i2, j2, align_vec)

    init_align = jnp.zeros((1, t1), jnp.int32)
    _, _, align_vec = jax.lax.fori_loop(
        0, t1 + t2, bt_body, (n1 - 1, n2 - 1, init_align))
    align_ref[0, 0:1, :] = align_vec


def pallas_dtw_align_batch(costs: jnp.ndarray, n1: jnp.ndarray,
                           n2: jnp.ndarray, interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, T1, T2) costs + (K,) valid lengths → ((K, T1) alignment, (K,)
    path costs). Semantics match :func:`..dtw.dtw_align`."""
    k, t1, t2 = costs.shape
    kernel = functools.partial(_dtw_kernel, t1=t1, t2=t2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, t1, t2), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            # (K, 1, T1) keeps the trailing two block dims == array dims
            # (Mosaic tiling constraint)
            pl.BlockSpec((1, 1, t1), lambda i, *_: (i, 0, 0)),
            # full-array SMEM block; each program writes its own slot
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t1, t2), jnp.float32),
        ],
    )
    align, path_cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, 1, t1), jnp.int32),
            jax.ShapeDtypeStruct((k,), jnp.float32),
        ],
        interpret=interpret,
    )(n1.astype(jnp.int32), n2.astype(jnp.int32),
      costs.astype(jnp.float32))
    return align[:, 0, :], path_cost
