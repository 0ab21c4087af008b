"""Pallas TPU kernel for monotonic DTW (DP + backtrace in one kernel).

The ``lax.scan`` DTW in :mod:`..dtw` pays per-step dispatch overhead on its
T1+T2 anti-diagonal steps plus another T1+T2 scalar-gather steps for the
backtrace (~25-30 ms per training batch). This kernel runs the whole thing
on-core:

- **Utterance batching**: the grid tiles the batch into groups of 16
  utterances; every DP row op runs on a (16, T2) vreg-aligned tile. The
  per-row loop is latency-bound (small vectors, sequential dependency), so
  doubling the tile from 8 to 16 utterances amortizes the fixed per-row
  cost over twice the work (~2x DP throughput measured at T=1024).
- **DP** row-by-row using the (min, +) semiring closed form: with
  ``b_j = min(dtw[i−1, j], dtw[i−1, j−1])`` and ``S = cumsum(costs[i])``
  (precomputed on the XLA side, one pass over HBM), row ``i`` is
  ``dtw[i, j] = S_j + cummin_j(b_j − S_{j−1})`` — the in-row left-to-right
  dependency becomes a log-depth prefix min.
- Rows stream in as Pallas-pipelined (16, CH, T2) blocks (automatic double
  buffering); only the previous DP row and a **2-bit-packed argmin choice
  table** stay resident (4 rows per int8 plane — the packing is what lets
  a 16-utterance tile fit the ~16 MB VMEM budget: 4 MB of choices at
  T=1024 instead of 16 MB unpacked). Choice codes use the reference's
  first-minimal order (0=up, 1=left, 2=diag — ``align.py:26``).
- **Backtrace**: all 16 utterances walk rows in LOCKSTEP, one row per step
  (the path visits every row exactly once when left-runs are resolved
  whole). At row i with entry column j, the recorded column is the end of
  the run of choice==1 cells scanning left from j; encoding eligible cells
  as ``col*2 + (choice==2)`` makes that one masked reduce-max over the
  unpacked (16, T2) choice row — no per-cell stepping (~10x fewer
  sequential steps than a per-cell walk). Static trip count (t1-1): rows
  above an utterance's n1-1 are masked via ``active`` (an SMEM-derived
  dynamic bound here is both unnecessary and a Mosaic hazard).

VMEM budget at T=1024: packed choices (ceil(T1/4), 16, T2) int8 = 4 MB +
two pipelined 4 MB S blocks + small row state ≈ 12.5 MB; the dispatcher
falls back to the scan implementation for bigger buckets.

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
K_TILE = 16
ROW_CHUNK = 64


def _shift_right(x: jnp.ndarray, d: int, fill: float) -> jnp.ndarray:
    """Shift right by d along the lane (last) axis, filling the head."""
    rolled = pltpu.roll(x, d, axis=x.ndim - 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(idx < d, fill, rolled)


def _cummin(x: jnp.ndarray, t: int) -> jnp.ndarray:
    d = 1
    while d < t:
        x = jnp.minimum(x, _shift_right(x, d, BIG))
        d *= 2
    return x


def _dtw_kernel(n1_ref, n2_ref, s_ref, align_ref, cost_out_ref,
                choices_ref, prev_ref, corner_ref, *,
                t1: int, t2: int, n_chunks: int):
    kt = pl.program_id(0)
    c = pl.program_id(1)
    ch = s_ref.shape[1]

    col = jax.lax.broadcasted_iota(jnp.int32, (K_TILE, t2), 1)
    n1v = jnp.stack([n1_ref[kt * K_TILE + u] for u in range(K_TILE)])
    n2v = jnp.stack([n2_ref[kt * K_TILE + u] for u in range(K_TILE)])

    # ---- DP over this chunk's rows -------------------------------------
    # acc carries the current 2-bit choice plane (rows 4p..4p+3); it is
    # stored UNCONDITIONALLY each row — the last sub-row's store wins, so
    # no read-modify-write of VMEM is needed.
    def row_body(r, acc):
        i = c * ch + r
        s_row = s_ref[:, r, :]                       # (16, T2) cumsum row
        prev = prev_ref[:, :]

        @pl.when(i == 0)
        def _():
            x0 = jnp.where(col == 0, 0.0, BIG)
            prev_ref[:, :] = x0
            corner_ref[:, :] = jnp.where(
                (col == n2v[:, None] - 1) & (n1v[:, None] == 1), x0, 0.0)

        up = prev                                 # dtw[i-1, j]
        dg = _shift_right(prev, 1, BIG)           # dtw[i-1, j-1]
        b = jnp.minimum(up, dg)
        b = jnp.where(col == 0, BIG, b)           # column-0 boundary
        s_excl = _shift_right(s_row, 1, 0.0)
        m = _cummin(b - s_excl, t2)
        x = s_row + m                             # dtw row i
        x = jnp.where(col == 0, BIG, x)

        left = _shift_right(x, 1, BIG)            # dtw[i, j-1]
        pick_up = (up <= left) & (up <= dg)
        pick_left = jnp.logical_and(~pick_up, left <= dg)
        choice = jnp.where(pick_up, 0, jnp.where(pick_left, 1, 2))
        choice = jnp.where(i == 0, 0, choice)     # row 0: no choice

        shift = 2 * (i % 4)
        acc = jnp.where(i % 4 == 0, choice, acc | (choice << shift))
        choices_ref[pl.ds(i // 4, 1), :, :] = acc.astype(jnp.int8)[None]

        @pl.when(i > 0)
        def _():
            prev_ref[:, :] = x
            corner_ref[:, :] = corner_ref[:, :] + jnp.where(
                (col == n2v[:, None] - 1) & (i == n1v[:, None] - 1), x, 0.0)

        return acc

    # only rows below the tile's max valid length are needed
    max_n1 = jnp.max(n1v)
    rows_here = jnp.clip(max_n1 - c * ch, 0, ch)
    jax.lax.fori_loop(0, rows_here, row_body,
                      jnp.zeros((K_TILE, t2), jnp.int32))

    # ---- backtrace + outputs on the last chunk --------------------------
    @pl.when(c == n_chunks - 1)
    def _():
        corner = jnp.sum(corner_ref[:, :], axis=1)   # (16,)
        for u in range(K_TILE):
            cost_out_ref[kt * K_TILE + u] = corner[u]

        row_pos = jax.lax.broadcasted_iota(jnp.int32, (K_TILE, t1), 1)

        n1c = n1v[:, None]                                 # (16, 1)
        n2c = n2v[:, None]

        def bt_row(r, carry):
            j_col, align_acc = carry                       # (16,1), (16,T1)
            i = t1 - 1 - r
            plane = choices_ref[pl.ds(i // 4, 1), :, :][0].astype(
                jnp.int32)
            row = (plane >> (2 * (i % 4))) & 3             # (16, T2)
            active = (i <= n1c - 1) & (i >= 1) & (j_col > 0)   # (16, 1)
            elig = (row != 1) & (col <= j_col)
            enc = jnp.where(elig, col * 2 + (row == 2).astype(jnp.int32),
                            -1)
            pmax = jnp.max(enc, axis=1, keepdims=True)     # (16, 1)
            e = pmax >> 1
            diag = pmax & 1
            rec = jnp.maximum(e, 1)   # a run reaching col 0 records col 1
            align_acc = jnp.where((row_pos == i) & active, rec, align_acc)
            j_next = jnp.where(e == 0, 0, e - diag)
            j_col = jnp.where(active, j_next, j_col)
            return (j_col, align_acc)

        init = (n2c - 1, jnp.zeros((K_TILE, t1), jnp.int32))
        _, align_acc = jax.lax.fori_loop(0, t1 - 1, bt_row, init)
        for u in range(K_TILE):
            align_ref[u, 0:1, :] = align_acc[u][None]


def pallas_dtw_align_batch(costs: jnp.ndarray, n1: jnp.ndarray,
                           n2: jnp.ndarray, interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, T1, T2) costs + (K,) valid lengths → ((K, T1) alignment, (K,)
    path costs). Semantics match :func:`..dtw.dtw_align`."""
    k, t1, t2 = costs.shape
    k_pad = -(-k // K_TILE) * K_TILE
    ch = ROW_CHUNK if t1 % ROW_CHUNK == 0 else t1
    n_chunks = t1 // ch
    n_planes = -(-t1 // 4)

    s = jnp.cumsum(costs.astype(jnp.float32), axis=2)
    if k_pad != k:
        s = jnp.pad(s, ((0, k_pad - k), (0, 0), (0, 0)))
        n1 = jnp.pad(n1.astype(jnp.int32), (0, k_pad - k),
                     constant_values=1)
        n2 = jnp.pad(n2.astype(jnp.int32), (0, k_pad - k),
                     constant_values=1)

    kernel = functools.partial(_dtw_kernel, t1=t1, t2=t2,
                               n_chunks=n_chunks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k_pad // K_TILE, n_chunks),
        in_specs=[
            pl.BlockSpec((K_TILE, ch, t2),
                         lambda kt, c, *_: (kt, c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K_TILE, 1, t1), lambda kt, c, *_: (kt, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (K,) cost vector
        ],
        scratch_shapes=[
            pltpu.VMEM((n_planes, K_TILE, t2), jnp.int8),  # packed choices
            pltpu.VMEM((K_TILE, t2), jnp.float32),    # previous DP row
            pltpu.VMEM((K_TILE, t2), jnp.float32),    # corner accumulator
        ],
    )
    align, path_cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, 1, t1), jnp.int32),
            jax.ShapeDtypeStruct((k_pad,), jnp.float32),
        ],
        interpret=interpret,
    )(n1.astype(jnp.int32), n2.astype(jnp.int32), s)
    return align[:k, 0, :], path_cost[:k]
