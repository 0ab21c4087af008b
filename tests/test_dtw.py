import numpy as np
import pytest

import jax.numpy as jnp

from silent_speech_tpu.ops.dtw import (
    dtw_align, dtw_align_batch, align_from_distances_numpy,
)


def test_numpy_oracle_monotonic_identity():
    # identical sequences: diagonal alignment
    t = 10
    costs = np.ones((t, t)) + 10 * (1 - np.eye(t))
    align = align_from_distances_numpy(costs)
    assert align == [0] + list(range(1, t))


def test_numpy_oracle_monotonicity():
    rng = np.random.default_rng(0)
    costs = rng.uniform(size=(20, 30))
    align = align_from_distances_numpy(costs)
    assert len(align) == 20
    assert all(b >= a for a, b in zip(align[1:], align[2:]))  # monotone
    assert align[0] == 0


@pytest.mark.parametrize("t1,t2,seed", [
    (10, 10, 0), (20, 30, 1), (30, 20, 2), (1, 5, 3), (5, 1, 4),
    (64, 48, 5), (2, 2, 6),
])
def test_jax_matches_numpy_oracle(t1, t2, seed):
    rng = np.random.default_rng(seed)
    costs = rng.uniform(size=(t1, t2)).astype(np.float32)
    expected = align_from_distances_numpy(costs)
    got, _ = dtw_align(jnp.asarray(costs),
                       jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_jax_padded_matches_unpadded():
    """Padding beyond (n1, n2) must not change the alignment."""
    rng = np.random.default_rng(7)
    n1, n2 = 25, 37
    costs = rng.uniform(size=(n1, n2)).astype(np.float32)
    expected = align_from_distances_numpy(costs)

    padded = np.full((64, 64), 123.456, dtype=np.float32)
    padded[:n1, :n2] = costs
    got, _ = dtw_align(jnp.asarray(padded),
                       jnp.asarray(n1, jnp.int32), jnp.asarray(n2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got)[:n1], np.asarray(expected))
    assert (np.asarray(got)[n1:] == 0).all()


def test_batch_vmap():
    rng = np.random.default_rng(8)
    u, t1, t2 = 4, 32, 40
    costs = rng.uniform(size=(u, t1, t2)).astype(np.float32)
    n1 = np.array([32, 10, 20, 1], dtype=np.int32)
    n2 = np.array([40, 15, 1, 7], dtype=np.int32)
    aligns, path_costs = dtw_align_batch(
        jnp.asarray(costs), jnp.asarray(n1), jnp.asarray(n2))
    aligns = np.asarray(aligns)
    for i in range(u):
        expected = align_from_distances_numpy(costs[i, :n1[i], :n2[i]])
        np.testing.assert_array_equal(aligns[i, :n1[i]], expected,
                                      err_msg=f"utterance {i}")


def test_path_cost_matches_dp_corner():
    rng = np.random.default_rng(9)
    costs = rng.uniform(size=(15, 18)).astype(np.float64)
    # reference DP corner value
    dtw = np.zeros_like(costs)
    dtw[0, 1:] = np.inf
    dtw[1:, 0] = np.inf
    for i in range(1, 15):
        for j in range(1, 18):
            dtw[i, j] = costs[i, j] + min(dtw[i - 1, j], dtw[i, j - 1],
                                          dtw[i - 1, j - 1])
    _, path_cost = dtw_align(jnp.asarray(costs.astype(np.float32)),
                             jnp.asarray(15, jnp.int32),
                             jnp.asarray(18, jnp.int32))
    assert float(path_cost) == pytest.approx(dtw[-1, -1], rel=1e-5)


def test_gradient_flows_through_gather():
    """Loss built from costs[alignment] must be differentiable in costs."""
    import jax

    rng = np.random.default_rng(10)
    base = rng.uniform(1.0, 2.0, size=(12, 16)).astype(np.float32)

    def loss_fn(c):
        align, _ = dtw_align(c, jnp.asarray(12, jnp.int32),
                             jnp.asarray(16, jnp.int32))
        align = jax.lax.stop_gradient(align)
        # reference loss: sum over target rows of costs[row, matched col]
        return jnp.take_along_axis(c, align[:, None], axis=1).sum()

    g = jax.grad(loss_fn)(jnp.asarray(base))
    g = np.asarray(g)
    # gradient is 1 exactly on the selected cells
    align = align_from_distances_numpy(base)
    expected = np.zeros_like(base)
    expected[np.arange(12), align] = 1.0
    np.testing.assert_array_equal(g, expected)


def test_pallas_kernel_interpret_matches_oracle():
    """The fused Pallas DTW kernel (interpret mode on CPU) matches the
    reference-semantics oracle, including padding and short utterances."""
    from silent_speech_tpu.ops.pallas.dtw_kernel import \
        pallas_dtw_align_batch

    rng = np.random.default_rng(11)
    t1, t2 = 40, 32
    costs = rng.uniform(1.0, 2.0, size=(3, t1, t2)).astype(np.float32)
    n1 = np.array([40, 17, 2], np.int32)
    n2 = np.array([32, 9, 2], np.int32)
    align, pc = pallas_dtw_align_batch(
        jnp.asarray(costs), jnp.asarray(n1), jnp.asarray(n2),
        interpret=True)
    align = np.asarray(align)
    for u in range(3):
        expected = align_from_distances_numpy(costs[u, :n1[u], :n2[u]])
        np.testing.assert_array_equal(align[u, : n1[u]], expected,
                                      err_msg=f"utt {u}")
        assert (align[u, n1[u]:] == 0).all()
        # path cost matches the scan implementation's corner value
        _, pc_scan = dtw_align(jnp.asarray(costs[u]),
                               jnp.asarray(n1[u]), jnp.asarray(n2[u]))
        assert float(pc[u]) == pytest.approx(float(pc_scan), rel=1e-4)
