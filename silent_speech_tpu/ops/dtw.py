"""On-device monotonic DTW alignment (anti-diagonal wavefront).

Functional spec (reference ``align.py:5-34``): given a distance matrix
``D (T1, T2)``, fill the cumulative-cost table
``dtw[i,j] = D[i,j] + min(dtw[i-1,j], dtw[i,j-1], dtw[i-1,j-1])`` with
``dtw[0,0] = 0`` and the rest of row/column 0 at +inf, then backtrace from the
far corner taking, at each step, the first-minimal of (up, left, diag); the
result maps each row index to its matched column (the smallest column visited
in that row). The reference runs this per silent utterance per training step
as a host numba kernel, forcing a device→host sync
(``transduction_model.py:126``).

TPU-native design:
- the O(T1·T2) DP runs as a ``lax.scan`` over anti-diagonals: the cost matrix
  is pre-skewed into diagonal-major layout with one static gather, so every
  scan step is a pure VPU 3-way min over a (T1,)-vector — no per-step gathers,
- the O(T1+T2) backtrace is a second ``lax.scan`` with three scalar reads per
  step from the diagonal-major table,
- everything is static-shape and vmap-able over a batch of padded utterances
  with per-utterance valid lengths (``n1``, ``n2``); padded cells never
  influence valid cells because DP dependencies are monotone in (i, j),
- gradients flow only through the final cost gather (alignment indices are
  integer outputs), exactly like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.inf


def _skew(costs: jnp.ndarray) -> jnp.ndarray:
    """(T1, T2) → diagonal-major (T1+T2-1, T1): skewed[k, i] = costs[i, k-i].

    Out-of-range entries are arbitrary (clipped); they are masked in the DP.
    """
    t1, t2 = costs.shape
    k = jnp.arange(t1 + t2 - 1)[:, None]
    i = jnp.arange(t1)[None, :]
    j = jnp.clip(k - i, 0, t2 - 1)
    return costs[i, j]


@jax.jit
def dtw_align(costs: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DTW over one padded cost matrix.

    Args:
      costs: (T1, T2) float distances; only ``[:n1, :n2]`` is meaningful.
      n1, n2: scalar int32 valid lengths (>= 1).

    Returns:
      alignment: (T1,) int32 — for each row i < n1, the matched column
        (reference semantics; rows ≥ n1 are 0).
      path_cost: scalar — cumulative DP cost at the (n1-1, n2-1) corner.

    The DP stores only the **argmin choice** per cell (int8 diagonal-major
    table, 3 codes: 0=up, 1=left, 2=diag — the reference backtrace's
    first-minimal order) instead of the full float table; the backtrace
    follows choice pointers. This cuts HBM traffic 4× and removes the
    3-way float gathers from the sequential backtrace.
    """
    t1, t2 = costs.shape
    skewed = _skew(costs)
    i_idx = jnp.arange(t1)

    # --- forward DP over anti-diagonals --------------------------------
    # diag[k][i] = dtw[i, k-i]; carry keeps two live diagonals
    d0 = jnp.full((t1,), BIG).at[0].set(0.0)  # k=0: only (0,0), dtw=0

    def step(carry, sk):
        prev, prev2, k, corner = carry
        up = jnp.concatenate([jnp.full((1,), BIG), prev[:-1]])
        left = prev
        dg = jnp.concatenate([jnp.full((1,), BIG), prev2[:-1]])
        # first-minimal order: up, left, diag (align.py:26 semantics)
        pick_up = (up <= left) & (up <= dg)
        pick_left = (~pick_up) & (left <= dg)
        choice = jnp.where(pick_up, 0, jnp.where(pick_left, 1, 2)) \
            .astype(jnp.int8)
        best = jnp.minimum(jnp.minimum(up, left), dg)
        j = k - i_idx
        interior = (i_idx >= 1) & (j >= 1) & (j <= t2 - 1)
        d = jnp.where(interior, sk + best, BIG)
        # harvest the (n1-1, n2-1) corner value when its diagonal passes
        corner = corner + jnp.where(
            k == n1 + n2 - 2,
            jnp.where(n1 + n2 > 2, d[n1 - 1], 0.0), 0.0)
        return (d, prev, k + 1, corner), choice

    init = (d0, jnp.full((t1,), BIG), jnp.asarray(1, jnp.int32),
            jnp.asarray(0.0, costs.dtype))
    (_, _, _, path_cost), choices_rest = jax.lax.scan(step, init, skewed[1:])
    zeros_row = jnp.zeros((1, t1), jnp.int8)
    choices = jnp.concatenate([zeros_row, choices_rest], axis=0)

    # --- backtrace over choice pointers --------------------------------
    def bt_step(carry, _):
        i, j, results = carry
        active = (i > 0) & (j > 0)
        results = jnp.where(active,
                            results.at[i].set(j.astype(jnp.int32)), results)
        c = choices[i + j, i]
        ni = jnp.where(c == 1, i, i - 1)
        nj = jnp.where(c == 0, j, j - 1)
        i = jnp.where(active, ni, i)
        j = jnp.where(active, nj, j)
        return (i, j, results), None

    results0 = jnp.zeros((t1,), jnp.int32)
    (_, _, results), _ = jax.lax.scan(
        bt_step, (n1 - 1, n2 - 1, results0), None, length=t1 + t2)
    return results, path_cost


@jax.jit
def dtw_align_batch_scan(costs: jnp.ndarray, n1: jnp.ndarray,
                         n2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped :func:`dtw_align` over (U, T1, T2) with (U,) lengths."""
    return jax.vmap(dtw_align)(costs, n1, n2)


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return "tpu" in (dev.platform + dev.device_kind).lower()
    except Exception:
        return False


# VMEM budget for the fused kernel: cost block + DP scratch, both f32
_PALLAS_VMEM_BUDGET = 12 * 1024 * 1024


def dtw_align_batch(costs: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched DTW; dispatches to the fused Pallas kernel on TPU when the
    per-utterance buffers fit VMEM, else the lax.scan implementation."""
    _, t1, t2 = costs.shape
    if _on_tpu() and t2 >= 256 and t2 % 128 == 0 \
            and 2 * t1 * t2 * 4 <= _PALLAS_VMEM_BUDGET:
        from .pallas.dtw_kernel import pallas_dtw_align_batch

        return pallas_dtw_align_batch(costs, n1, n2)
    # the DP must accumulate in f32 even when the caller stores the cost
    # matrix in a reduced dtype (the Pallas path upcasts in its cumsum)
    return dtw_align_batch_scan(costs.astype(jnp.float32), n1, n2)


def align_from_distances_numpy(distance_matrix: np.ndarray) -> list:
    """Host-side oracle with exact reference semantics (``align.py:16-34``).

    Used by tests and by non-hot-path tools; O(T1·T2) numpy DP plus python
    backtrace with first-minimal tie-breaking.
    """
    costs = np.asarray(distance_matrix, dtype=np.float64)
    t1, t2 = costs.shape
    dtw = np.zeros_like(costs)
    dtw[0, 1:] = np.inf
    dtw[1:, 0] = np.inf
    for i in range(1, t1):
        # vectorized over j is impossible (left dependency); do explicit loop
        row_prev = dtw[i - 1]
        row = dtw[i]
        for j in range(1, t2):
            row[j] = costs[i, j] + min(row_prev[j], row[j - 1],
                                       row_prev[j - 1])
    i, j = t1 - 1, t2 - 1
    results = [0] * t1
    while i > 0 and j > 0:
        results[i] = j
        candidates = [(i - 1, j), (i, j - 1), (i - 1, j - 1)]
        i, j = min(candidates, key=lambda x: dtw[x[0], x[1]])
    return results
