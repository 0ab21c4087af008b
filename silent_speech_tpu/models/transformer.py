"""Transformer encoder with learned relative positional attention logits.

Functional parity target: the reference's custom einsum attention with
per-head learned relative position embeddings up to ±(max_dist−1), the
out-of-range −1e8 masking, and the post-norm layer layout
(``transformer.py:7-112`` and the fairseq-derived embedding module at
``transformer.py:114-305``).

TPU-first differences from the reference implementation:
- batch-first ``(B, T, D)`` layout throughout (the reference is time-first),
- the relative→absolute "skew trick" (pad/reshape/slice,
  ``transformer.py:264-305``) is replaced by a static ``(T, T)`` index gather
  built at trace time — XLA lowers it to a single take-along-axis, with no
  reshape gymnastics and no dynamic shapes,
- all projections are einsums that XLA maps straight onto the MXU; an
  optional ``dtype`` (bfloat16) selects the compute precision while params
  stay float32,
- optional segment-id attention masking (the reference attends across packed
  utterance boundaries — SURVEY.md §5.7; we can fix that, off by default for
  parity).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.dropout import RegenDropout, dropout_threshold, relu_dropout
from ..ops.fused_norm import FusedResidualNorm

NEG_INF = -1e8  # matches the reference's out-of-range logit offset


def _fused_kernel_active() -> bool:
    """The fused Pallas kernel runs on TPU; other platforms keep the
    tuned XLA path below (interpret-mode Pallas would be a large silent
    slowdown there). ``SSTPU_INTERPRET_FUSED=1`` overrides — tests use
    it to exercise the kernel under the virtual CPU mesh."""
    if os.environ.get("SSTPU_INTERPRET_FUSED") == "1":
        return True
    return jax.devices()[0].platform == "tpu"


def _key_seed(key) -> jnp.ndarray:
    """(1,) int32 seed from a (typed or raw) PRNG key."""
    try:
        data = jax.random.key_data(key)
    except TypeError:
        data = key
    return data.reshape(-1)[-1:].astype(jnp.int32)


def relative_position_index(q_len: int, k_len: int, max_dist: int
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Static (q_len, k_len) index map into a (2*max_dist-1,) embedding table.

    Entry [q, k] is the table slot for relative position ``k - q`` clipped
    into ±(max_dist−1); the companion boolean marks in-range pairs. Built in
    numpy at trace time so it constant-folds under jit.
    """
    rel = np.arange(k_len)[None, :] - np.arange(q_len)[:, None]
    valid = np.abs(rel) <= max_dist - 1
    idx = np.clip(rel + max_dist - 1, 0, 2 * max_dist - 2)
    return idx.astype(np.int32), valid


_P_CACHE = {}


def _rel_scatter_matrices(t: int, max_dist: int):
    """Constants for the matmul relative→absolute map at length t:
    P (t, 2M−1, t) with P[q, m, k] = 1 iff m == k−q+M−1, and the OOR
    −1e8 bias (t, t). Cached per (t, M)."""
    key = (t, max_dist)
    if key not in _P_CACHE:
        q = np.arange(t)[:, None, None]
        m = np.arange(2 * max_dist - 1)[None, :, None]
        k = np.arange(t)[None, None, :]
        p = (m == (k - q + max_dist - 1)).astype(np.float32)
        rel = np.arange(t)[None, :] - np.arange(t)[:, None]
        mask = np.where(np.abs(rel) <= max_dist - 1, 0.0, NEG_INF)
        _P_CACHE[key] = (p, mask.astype(np.float32))
    return _P_CACHE[key]


def _relative_to_absolute_matmul(rel_logits: jnp.ndarray, t: int,
                                 max_dist: int, dtype) -> jnp.ndarray:
    """Matmul form of the relative→absolute map: one batched GEMM on the
    MXU instead of pad/reshape shuffles (whose fwd+bwd are HBM-bound). The
    P tensor is O(t²·M) so this path is used for the packed training length
    (t ≈ 200); longer eval sequences take the skew path."""
    p, mask = _rel_scatter_matrices(t, max_dist)
    out = jnp.einsum("bhqm,qmk->bhqk", rel_logits, jnp.asarray(p, dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(dtype) + jnp.asarray(mask, dtype)[None, None]


def _relative_to_absolute(rel_logits: jnp.ndarray, t: int, max_dist: int,
                          dtype) -> jnp.ndarray:
    """(B, H, T, 2M−1) per-relative-position logits → (B, H, T, T) absolute.

    Uses the pad/reshape "skew" (Music-Transformer style) instead of a
    take-along-axis gather: the backward pass is then pure reshapes rather
    than a scatter-add, which matters on TPU. Relative positions beyond
    ±(M−1) contribute the NEG_INF mask, matching the reference's padded
    zero-embeddings + −1e8 (``transformer.py:199-262``).
    """
    b, h = rel_logits.shape[:2]
    w = 2 * max_dist - 1
    neg = jnp.asarray(NEG_INF, dtype)
    if t >= max_dist:
        pad = t - max_dist  # OOR slots on each side
        x = jnp.concatenate([
            jnp.full((b, h, t, pad), neg, dtype), rel_logits,
            jnp.full((b, h, t, pad), neg, dtype)], axis=-1)
    else:
        lo = max_dist - t
        x = rel_logits[..., lo: lo + 2 * t - 1]
    # x: (B, H, T, 2T-1); skew to absolute indexing
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))          # (…, 2T)
    x = x.reshape(b, h, 2 * t * t)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, t - 1)))
    x = x.reshape(b, h, t + 1, 2 * t - 1)
    return x[:, :, :t, t - 1:]


class RelativePositionalAttention(nn.Module):
    """Multi-head self-attention with learned relative position logits.

    Parameter layout mirrors the reference so checkpoints convert 1:1:
    ``w_q/w_k/w_v`` are (heads, d_model, d_head), ``w_o`` is
    (heads, d_head, d_model), and ``rel_emb`` is (heads, 2*max_dist−1,
    d_head) (reference stores a trailing singleton axis).
    """

    d_model: int
    n_head: int
    dropout: float = 0.1
    max_dist: int = 100
    dtype: jnp.dtype = jnp.float32
    # fused Pallas kernel for the attention core (QK^T + rel bias +
    # softmax + probs-dropout + PV in VMEM); the XLA path remains for
    # segment-masked (packed-eval) calls and as the fallback
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 segment_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        d_head = self.d_model // self.n_head
        assert d_head * self.n_head == self.d_model

        def proj_init(key, shape, dtype=jnp.float32):
            # xavier normal over the (d_model, d_head) fan as in the reference
            return nn.initializers.xavier_normal()(key, shape, dtype)

        w_q = self.param("w_q", proj_init, (self.n_head, self.d_model, d_head))
        w_k = self.param("w_k", proj_init, (self.n_head, self.d_model, d_head))
        w_v = self.param("w_v", proj_init, (self.n_head, self.d_model, d_head))
        w_o = self.param("w_o", proj_init, (self.n_head, d_head, self.d_model))
        rel_emb = self.param(
            "rel_emb",
            nn.initializers.normal(stddev=d_head ** -0.5),
            (self.n_head, 2 * self.max_dist - 1, d_head),
        )

        cdt = self.dtype
        xc = x.astype(cdt)
        q = jnp.einsum("btd,hda->bhta", xc, w_q.astype(cdt))
        k = jnp.einsum("btd,hda->bhta", xc, w_k.astype(cdt))
        v = jnp.einsum("btd,hda->bhta", xc, w_v.astype(cdt))

        if self.fused and segment_ids is None and _fused_kernel_active():
            from ..ops.pallas.rel_attention import fused_rel_attention

            thresh = 0
            seed = jnp.zeros((1,), jnp.int32)
            if not deterministic and self.dropout > 0:
                thresh = min(int(round(self.dropout * 2.0 ** 32)),
                             0xFFFFFFFF)
                seed = _key_seed(self.make_rng("dropout"))
            o = fused_rel_attention(q, k, v, rel_emb.astype(cdt), seed,
                                    self.max_dist, thresh)
            out = jnp.einsum("bhta,haf->btf", o.astype(cdt),
                             w_o.astype(cdt))
            return out.astype(x.dtype)

        logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / jnp.asarray(
            d_head ** 0.5, cdt)

        t = x.shape[1]
        # (B, H, T, 2M-1) relative logits over the learned window
        rel_logits = jnp.einsum("bhqa,hma->bhqm", q, rel_emb.astype(cdt))
        rel2abs = (_relative_to_absolute_matmul if t <= 256
                   else _relative_to_absolute)
        logits = logits + rel2abs(rel_logits, t, self.max_dist, cdt)

        if segment_ids is not None:
            same = segment_ids[:, None, :, None] == segment_ids[:, None,
                                                                None, :]
            logits = jnp.where(same, logits, jnp.asarray(NEG_INF, cdt))

        # softmax in the compute dtype: jax.nn.softmax subtracts the row max
        # first, so bf16 is safe here and saves two f32 materializations of
        # the (B, H, T, T) tensor
        probs = jax.nn.softmax(logits, axis=-1)
        probs = RegenDropout(self.dropout)(probs, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhka->bhqa", probs, v)
        out = jnp.einsum("bhta,haf->btf", o, w_o.astype(cdt))
        return out.astype(x.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer: attn → add&norm → ReLU FFN → add&norm
    (reference ``transformer.py:43-60``)."""

    d_model: int
    n_head: int
    dim_feedforward: int = 3072
    dropout: float = 0.1
    max_dist: int = 100
    dtype: jnp.dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *,
                 segment_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        attn_out = RelativePositionalAttention(
            d_model=self.d_model, n_head=self.n_head, dropout=self.dropout,
            max_dist=self.max_dist, dtype=self.dtype, fused=self.fused,
            name="self_attn",
        )(x, segment_ids=segment_ids, deterministic=deterministic)
        # residual dropout + add + LayerNorm fused into one custom-VJP op
        # (saves only x̂/rstd; backward regenerates the mask in-pass) —
        # the unfused chain was ~10 ms/step across the 12 sites
        x = FusedResidualNorm(rate=self.dropout, dtype=self.dtype,
                              name="norm1")(x, attn_out, deterministic)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     name="linear1")(x)
        t = dropout_threshold(self.dropout)
        if deterministic or t == 0:
            h = nn.relu(h)
        else:
            # fused relu+dropout: backward derives the joint mask from
            # the saved output sign — no RNG regen on the widest tensor
            h = relu_dropout(h, self.make_rng("dropout"), t)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = FusedResidualNorm(rate=self.dropout, dtype=self.dtype,
                              name="norm2")(x, h, deterministic)
        return x
