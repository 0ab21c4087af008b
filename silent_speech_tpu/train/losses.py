"""Training losses, fully on-device over packed static-shape batches.

Functional spec (reference ``transduction_model.py:98-157``):

- **silent** utterances: pairwise L2 distances between predicted mel frames
  and the parallel voiced target's frames, minus ``w·log p(phone)`` under the
  aux head evaluated at the target's phoneme labels; DTW-align the combined
  cost (columns = prediction frames, rows = target frames) and sum the costs
  along the alignment — one cost per target frame.
- **voiced** utterances: framewise L2 distance (torch ``pairwise_distance``
  semantics: ‖y − ŷ + 1e−6‖₂) plus ``w·`` summed phoneme cross-entropy.
- batch loss = Σ per-utterance losses / Σ target lengths.

The reference decollates to a ragged python list and loops utterances,
syncing to the CPU for every silent DTW (``transduction_model.py:111-126``).
Here the whole loss — distance matrices (MXU batched matmuls), phoneme-logit
gathers (one-hot matmul), DTW (wavefront scans), and masked reductions — is
one jit region over the ``(U, T, ·)`` padded views; padding utterances have
zero target length and contribute nothing.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.dtw import dtw_align_batch
from ..phonemes import NUM_PHONES


class TransductionLossOut(NamedTuple):
    loss: jnp.ndarray             # scalar: Σ utterance losses / Σ target len
    correct_phones: jnp.ndarray   # scalar int: aligned phoneme hits
    total_length: jnp.ndarray     # scalar int: Σ target lengths
    confusion: Optional[jnp.ndarray]  # (48, 48) pred×target counts or None


def pairwise_l2(a: jnp.ndarray, b: jnp.ndarray,
                matmul_dtype=None) -> jnp.ndarray:
    """Batched ‖a_i − b_j‖₂: (U, Ta, D) × (U, Tb, D) → (U, Ta, Tb).

    Uses the |a|²+|b|²−2ab expansion so the inner product rides the MXU
    (same algorithm torch.cdist picks for these sizes). ``matmul_dtype``
    sets the inner-product operand dtype (bf16 = full-rate MXU); the
    squared norms and the combine stay float32.
    """
    md = matmul_dtype or a.dtype
    a2 = jnp.sum(a * a, axis=-1, dtype=jnp.float32)[:, :, None]
    b2 = jnp.sum(b * b, axis=-1, dtype=jnp.float32)[:, None, :]
    ab = jnp.einsum("uad,ubd->uab", a.astype(md), b.astype(md),
                    preferred_element_type=jnp.float32)
    sq = jnp.clip(a2 + b2 - 2.0 * ab, 1e-12, None)
    return jnp.sqrt(sq)


def gather_utterances(flat: jnp.ndarray, gather_idx: jnp.ndarray
                      ) -> jnp.ndarray:
    """(N·L, D) packed rows → (U, T_max, D) padded per-utterance views."""
    return flat[gather_idx]


def transduction_loss(pred: jnp.ndarray, phoneme_pred: jnp.ndarray,
                      batch, phoneme_loss_weight: float = 0.5,
                      phoneme_eval: bool = False,
                      n_silent: Optional[int] = None,
                      matmul_dtype=None) -> TransductionLossOut:
    """Args:
      pred:          (N, L, 80) packed mel predictions.
      phoneme_pred:  (N, L, 48) packed phoneme logits.
      batch:         a PackedBatch already on device (jnp arrays).
      phoneme_eval:  also compute the (48, 48) confusion matrix.
      n_silent:      static count of leading silent utterances (the packer
        sorts silent-first and pads to a small bucket). When given, the
        O(T²) distance/phoneme matrices and the DTW DP run only on that
        slice — voiced utterances need just the framewise path. None =
        run the full-batch DP (always correct, more work).
      matmul_dtype:  compute dtype for the loss interior — the O(T²) MXU
        contractions AND the big (U, T, ·) gathered views / log-softmax /
        framewise distances (trainers pass their compute dtype; bfloat16
        halves the interior's HBM traffic and runs the MXU at full rate).
        Every frame/feature reduction accumulates in float32 and the
        returned loss is float32. None = float32 throughout (the parity
        and oracle tests' configuration).
    """
    # interior compute dtype: with a reduced matmul_dtype the big (U, T, ·)
    # gathered views / log-softmax / distances are held in that dtype too
    # (halves their HBM traffic); every SUM over frames or features
    # accumulates in float32, and the scalar loss is float32
    cdt = jnp.float32 if matmul_dtype is None else matmul_dtype
    d_out = pred.shape[-1]
    flat_pred = pred.reshape(-1, d_out).astype(cdt)
    flat_phone = phoneme_pred.reshape(-1, phoneme_pred.shape[-1]) \
        .astype(cdt)

    utt_pred = gather_utterances(flat_pred, batch.utt_gather_idx)
    utt_phone = gather_utterances(flat_phone, batch.utt_gather_idx)
    y = batch.audio_features.astype(cdt)          # (U, T, 80)
    y_phone = batch.phonemes                      # (U, T) target timeline
    utt_len = batch.utt_len                       # (U,) prediction frames
    tgt_len = batch.target_len                    # (U,) target frames
    silent = batch.silent                         # (U,) bool

    u, t_max = utt_phone.shape[:2]
    pos = jnp.arange(t_max)
    pred_mask = pos[None, :] < utt_len[:, None]
    tgt_mask = pos[None, :] < tgt_len[:, None]

    lsm = jax.nn.log_softmax(utt_phone, axis=-1)  # (U, T, 48)
    # target-phone log-probs by gather, NOT a (U, T, 48) one-hot einsum —
    # the full-batch one-hot is 126 MB of f32 HBM traffic at bench shapes;
    # one-hot is built only where a dense MXU contraction needs it (the
    # silent slice) or for the eval-only confusion matrix
    y_phone_idx = jnp.maximum(y_phone, 0)[..., None]     # (U, T, 1)

    # ---- silent path: DTW over combined cost (silent slice only) ------
    k = u if n_silent is None else min(max(n_silent, 0), u)
    if k > 0:
        md = matmul_dtype or jnp.float32
        # The dense (K, Ttgt, Tpred) cost matrix exists ONLY to pick the
        # alignment — it is built entirely under stop_gradient, so XLA
        # saves no (K, T, T) residuals and runs no einsum VJPs / dense
        # scatter in the backward pass (measured ~4 ms/step at the
        # training batch size). The differentiable loss is recomputed
        # sparsely along the alignment below from O(K·T·D) gathers.
        # Built natively in DTW orientation (rows = target frames,
        # reference aligns costs.T) — a (K, T, T) f32 swapaxes is a
        # 67 MB relayout per matrix otherwise.
        yk = jax.lax.stop_gradient(y[:k])
        pk_ng = jax.lax.stop_gradient(utt_pred[:k])
        lsm_ng = jax.lax.stop_gradient(lsm[:k])
        dists_t = pairwise_l2(yk, pk_ng, matmul_dtype=md)  # (K, Ttgt, Tpred)
        # phone_lp_t[u, tt, tp] = lsm[u, tp, y_phone[u, tt]]
        onehot_k = jax.nn.one_hot(y_phone[:k], NUM_PHONES, dtype=md)
        phone_lp_t = jnp.einsum(
            "utk,upk->utp", onehot_k, lsm_ng.astype(md),
            preferred_element_type=jnp.float32)
        # the dense matrix only picks the path (values are recomputed
        # along it below), so it is STORED in the matmul dtype — bf16
        # halves its HBM footprint; the DP itself still accumulates in
        # f32 (the kernel's cumsum / the scan path's upcast)
        costs_t = (dists_t
                   + phoneme_loss_weight * (-phone_lp_t)).astype(md)
        alignment_k, _ = dtw_align_batch(
            costs_t,
            jnp.maximum(tgt_len[:k], 1), jnp.maximum(utt_len[:k], 1))
        # loss per target frame: costs_t[u, t, alignment[u, t]],
        # recomputed from the aligned frame pairs (gradients flow through
        # the gathers, not the dense matrix; same clip floor as
        # pairwise_l2, value equal up to matmul-expansion rounding)
        aligned_pred = jnp.take_along_axis(
            utt_pred[:k], alignment_k[:, :, None], axis=1)  # (K, Ttgt, 80)
        diff_k = y[:k] - aligned_pred
        picked_dist = jnp.sqrt(jnp.clip(
            jnp.sum(diff_k * diff_k, axis=-1, dtype=jnp.float32),
            1e-12, None))
        aligned_lsm = jnp.take_along_axis(
            lsm[:k], alignment_k[:, :, None], axis=1)       # (K, Ttgt, 48)
        picked_lp = jnp.take_along_axis(
            aligned_lsm, y_phone_idx[:k], axis=2)[..., 0]   # (K, Ttgt)
        picked = picked_dist + phoneme_loss_weight \
            * (-picked_lp.astype(jnp.float32))
        silent_k = jnp.sum(jnp.where(tgt_mask[:k], picked, 0.0), axis=1)
        silent_losses = jnp.pad(silent_k, (0, u - k))
        alignment = jnp.pad(alignment_k, ((0, u - k), (0, 0)))
    else:
        silent_losses = jnp.zeros((u,), jnp.float32)
        alignment = jnp.zeros((u, t_max), jnp.int32)

    # ---- voiced path: framewise distance + CE -------------------------
    # runs on ALL rows: call sites may pass a wave-wide n_silent that
    # exceeds this batch's own silent count (trainers max() it across a
    # scan wave so every batch shares one trace), so real voiced
    # utterances can sit anywhere below k — `per_utt`'s where() picks the
    # right branch per row
    diff = y - utt_pred
    framewise = jnp.sqrt(jnp.clip(
        jnp.sum((diff + jnp.asarray(1e-6, cdt)) ** 2, axis=-1,
                dtype=jnp.float32), 1e-12, None))            # (U, T)
    ce = -jnp.take_along_axis(lsm, y_phone_idx,
                              axis=2)[..., 0].astype(jnp.float32)
    voiced_losses = jnp.sum(
        jnp.where(tgt_mask, framewise + phoneme_loss_weight * ce, 0.0),
        axis=1)

    per_utt = jnp.where(silent, silent_losses, voiced_losses)
    total_length = jnp.sum(tgt_len)
    loss = jnp.sum(per_utt) / jnp.maximum(total_length, 1)

    # ---- phoneme accuracy / confusion ---------------------------------
    pred_phone_ids = jnp.argmax(lsm, axis=-1)     # (U, Tpred)
    aligned_pred_ids = jnp.take_along_axis(pred_phone_ids, alignment, axis=1)
    eval_ids = jnp.where(silent[:, None], aligned_pred_ids, pred_phone_ids)
    hits = (eval_ids == y_phone) & tgt_mask
    correct = jnp.sum(hits)

    confusion = None
    if phoneme_eval:
        pred_oh = jax.nn.one_hot(eval_ids, NUM_PHONES)
        pred_oh = pred_oh * tgt_mask[..., None]
        tgt_oh = jax.nn.one_hot(y_phone, NUM_PHONES, dtype=jnp.float32)
        confusion = jnp.einsum("utp,utq->pq", pred_oh, tgt_oh)

    return TransductionLossOut(loss=loss, correct_phones=correct,
                               total_length=total_length,
                               confusion=confusion)


def ctc_loss(log_probs_packed: jnp.ndarray, batch, blank_id: int
             ) -> jnp.ndarray:
    """CTC loss over packed recognition batches.

    Reference (``recognition_model.py:96-101``): per-utterance
    ``F.ctc_loss`` with mean-over-batch of per-example NLL normalized by
    target length. Uses ``optax.ctc_loss`` on the (U, T, K) padded gather
    view; padding utterances (target length 0) are excluded from the mean.
    """
    import optax

    k = log_probs_packed.shape[-1]
    flat = log_probs_packed.reshape(-1, k)
    utt_logits = gather_utterances(flat, batch.utt_gather_idx)  # (U, T, K)

    u, t_max = utt_logits.shape[:2]
    pos = jnp.arange(t_max)
    logit_pad = (pos[None, :] >= batch.utt_len[:, None]).astype(jnp.float32)

    labels = jnp.maximum(batch.text_int, 0)       # -1 padding → 0 (padded)
    label_pad = (jnp.arange(labels.shape[1])[None, :]
                 >= batch.text_len[:, None]).astype(jnp.float32)

    per_example = optax.ctc_loss(utt_logits, logit_pad, labels, label_pad,
                                 blank_id=blank_id)
    real = batch.text_len > 0
    per_example = jnp.where(real, per_example
                            / jnp.maximum(batch.text_len, 1), 0.0)
    return jnp.sum(per_example) / jnp.maximum(jnp.sum(real), 1)
