"""HBM-resident corpus cache with on-device batch assembly.

The featurized corpus (raw EMG at the model rate, mel targets, phonemes,
text) lives in a few flat device arrays; each training step ships only a
(U,) utterance-id vector and assembles the packed batch ON DEVICE — gathers
from the flat caches build the (N, 200·8, 8) chunk tensor, the per-utterance
(U, T, 80) target views, session/segment ids, everything. Host→device
traffic per step drops from ~16 MB to a few hundred bytes.

This is the TPU-first replacement for the reference's per-batch host
collation (``read_emg.py:261-296`` + ``combine_fixed_length``): the
reference re-uploads every batch; here the corpus uploads once and XLA
gathers assemble batches at HBM bandwidth. Assembly output matches
``pack_batch`` bit-for-bit (tested).

HBM budget arithmetic (f32, both timelines at ~86.13 fps):

- raw EMG, frame-grouped:  86.13 fps · 3600 s · 64 f32 · 4 B ≈ 79 MB/h
- mel targets:             86.13 fps · 3600 s · 80 f32 · 4 B ≈ 99 MB/h
- phonemes (int32):        86.13 fps · 3600 s · 4 B           ≈ 1.2 MB/h
- text/offsets:            negligible (<1 MB/h)

≈ **0.18 GB per corpus hour** — silent utterances also carry their paired
voiced target's mel+phonemes, so the reference corpus (~20 h total) lands
around 3.6–4 GB. That must coexist with params+optimizer (~1.3 GB at the
reference's 110 M params under AdamW) and the step's activations, so the
cache is only allowed a fraction of per-device HBM
(``cache_hbm_fraction``, default 0.4 of a 16 GB v5e chip ⇒ ~6.4 GB ⇒
~35 corpus hours). ``DeviceCorpus.build`` measures the EXACT host bytes
before upload and raises :class:`HBMBudgetError` with the full arithmetic
when over budget; the trainers catch it and fall back to the host packing
path (per-batch upload — slower, but unbounded).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .packing import DeviceBatch


class HBMBudgetError(RuntimeError):
    """Corpus cache would exceed its per-device HBM allowance.

    Carries the exact byte accounting so the refusal is actionable; the
    trainers catch this and fall back to host-side per-batch packing."""

    def __init__(self, total_bytes: int, budget_bytes: int,
                 breakdown: dict):
        self.total_bytes = total_bytes
        self.budget_bytes = budget_bytes
        self.breakdown = breakdown
        detail = ", ".join(f"{k}={v / 2**20:.1f} MiB"
                           for k, v in breakdown.items())
        super().__init__(
            f"HBM corpus cache needs {total_bytes / 2**30:.2f} GiB "
            f"({detail}) but the per-device budget is "
            f"{budget_bytes / 2**30:.2f} GiB; falling back to the host "
            f"packing path (set data.cache_hbm_fraction or "
            f"SSTPU_CACHE_BUDGET_BYTES to raise the allowance, or "
            f"data.device_cache=False to silence this)")


def _device_hbm_budget(fraction: float) -> Optional[int]:
    """Per-device cache allowance in bytes, or None when undeterminable.

    Order: explicit ``SSTPU_CACHE_BUDGET_BYTES`` env override, then
    ``memory_stats()['bytes_limit']`` of device 0 (real TPUs report it;
    virtual CPU devices generally don't) scaled by ``fraction``."""
    import os

    env = os.environ.get("SSTPU_CACHE_BUDGET_BYTES")
    if env:
        return int(env)
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats or "bytes_limit" not in stats:
        return None
    return int(stats["bytes_limit"] * fraction)


class CorpusArrays(NamedTuple):
    """Flat device-resident corpus (leading dims are corpus-wide sums).

    The raw signal is stored grouped by FEATURE FRAME — row f holds the 8
    consecutive 8-channel samples of frame f flattened to 64 floats — so
    batch assembly is one wide row-gather (a (T, 64) gather saturates HBM
    where a (8T, 8) row gather is lane-starved). One trailing zero row
    serves as the padding target for masked gathers.
    """

    raw_frames: jnp.ndarray    # (sum T_u + 1, 64) frame-grouped raw EMG
    tgt_flat: jnp.ndarray      # (sum Ttgt_u + 1, 80) mel targets
    phon_flat: jnp.ndarray     # (sum Ttgt_u + 1,) target-timeline phonemes
    text_flat: jnp.ndarray     # (sum chars_u + 1,) char ids
    feat_len: jnp.ndarray      # (E,) feature frames per example
    raw_off: jnp.ndarray       # (E,) FRAME offsets into raw_frames
    tgt_off: jnp.ndarray       # (E,) offsets into tgt_flat / phon_flat
    tgt_len: jnp.ndarray       # (E,)
    text_off: jnp.ndarray      # (E,)
    text_len: jnp.ndarray      # (E,)
    session_id: jnp.ndarray    # (E,)
    silent: jnp.ndarray        # (E,) bool


@dataclass
class DeviceCorpus:
    arrays: CorpusArrays
    num_examples: int
    # host copies for ordering and static-cap guards
    silent_mask: np.ndarray
    feat_len_host: np.ndarray
    tgt_len_host: np.ndarray
    text_len_host: np.ndarray

    @staticmethod
    def build(examples: Sequence[dict], device=None, mesh=None,
              hbm_fraction: float = 0.4) -> "DeviceCorpus":
        """Host-side flattening of featurized example dicts (the
        ``EMGDataset.__getitem__`` schema), then one upload.

        With ``mesh``, the flat arrays replicate across every device (the
        corpus is replicated, not sharded: batches shard at assembly time
        via ``constrain_batch`` in the trainers' cache steps).

        Before uploading, the EXACT host bytes are measured against the
        per-device allowance (``hbm_fraction`` of the device's reported
        ``bytes_limit``, or ``SSTPU_CACHE_BUDGET_BYTES``); over budget
        raises :class:`HBMBudgetError` — see the module docstring for the
        bytes/hour arithmetic. ``hbm_fraction <= 0`` disables the check."""
        raw_parts, tgt_parts, phon_parts, text_parts = [], [], [], []
        feat_len, raw_off, tgt_off, tgt_len = [], [], [], []
        text_off, text_len, session_id, silent = [], [], [], []
        r_pos = t_pos = c_pos = 0
        for e in examples:
            raw = np.asarray(e["raw_emg"], np.float32)
            tgt = np.asarray(
                e["parallel_voiced_audio_features"] if e["silent"]
                else e["audio_features"], np.float32)
            phon = np.asarray(e["phonemes"], np.int32)
            text = np.asarray(e["text_int"], np.int32)
            assert phon.shape[0] == tgt.shape[0], \
                "phonemes must follow the target timeline"
            raw_parts.append(raw.reshape(-1, 8 * raw.shape[1]))
            tgt_parts.append(tgt)
            phon_parts.append(phon)
            text_parts.append(text)
            feat_len.append(raw.shape[0] // 8)
            raw_off.append(r_pos)
            tgt_off.append(t_pos)
            tgt_len.append(tgt.shape[0])
            text_off.append(c_pos)
            text_len.append(text.shape[0])
            session_id.append(int(e["session_ids"][0])
                              if len(e["session_ids"]) else 0)
            silent.append(bool(e["silent"]))
            r_pos += raw.shape[0] // 8
            t_pos += tgt.shape[0]
            c_pos += text.shape[0]

        def _with_pad_row(parts, dtype=np.float32):
            tail = parts[0].shape[1:] if parts else ()
            return np.concatenate(parts + [np.zeros((1,) + tail, dtype)],
                                  axis=0)

        arrays = CorpusArrays(
            raw_frames=_with_pad_row(raw_parts),
            tgt_flat=_with_pad_row(tgt_parts),
            phon_flat=_with_pad_row(phon_parts, dtype=np.int32),
            text_flat=_with_pad_row(text_parts, dtype=np.int32),
            feat_len=np.asarray(feat_len, np.int32),
            raw_off=np.asarray(raw_off, np.int32),
            tgt_off=np.asarray(tgt_off, np.int32),
            tgt_len=np.asarray(tgt_len, np.int32),
            text_off=np.asarray(text_off, np.int32),
            text_len=np.asarray(text_len, np.int32),
            session_id=np.asarray(session_id, np.int32),
            silent=np.asarray(silent, bool),
        )
        if hbm_fraction > 0:
            breakdown = {f: getattr(arrays, f).nbytes
                         for f in arrays._fields}
            total = sum(breakdown.values())
            budget = _device_hbm_budget(hbm_fraction)
            if budget is not None and total > budget:
                raise HBMBudgetError(total, budget, breakdown)

        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = partial(jax.device_put,
                          device=NamedSharding(mesh, P()))
        else:
            put = (partial(jax.device_put, device=device) if device
                   else jax.device_put)
        return DeviceCorpus(
            arrays=CorpusArrays(*(put(np.asarray(a)) for a in arrays)),
            num_examples=len(examples),
            silent_mask=np.asarray(silent, bool),
            feat_len_host=np.asarray(feat_len, np.int32),
            tgt_len_host=np.asarray(tgt_len, np.int32),
            text_len_host=np.asarray(text_len, np.int32))

    def order_silent_first(self, ids: Sequence[int]) -> List[int]:
        ids = list(ids)
        return sorted(ids, key=lambda i: not bool(self.silent_mask[i]))


def _segment_owner(dest_starts: jnp.ndarray, total: jnp.ndarray,
                   n_positions: int):
    """For each output position, which utterance owns it (−1 on padding)."""
    pos = jnp.arange(n_positions)
    owner = jnp.searchsorted(dest_starts, pos, side="right") - 1
    owner = jnp.where(pos < total, owner, -1)
    return pos, owner


@partial(jax.jit,
         static_argnames=("n_chunks", "seq_len", "t_cap", "text_cap",
                          "feat_dim"))
def assemble_batch(arrays: CorpusArrays, utt_ids: jnp.ndarray,
                   utt_valid: jnp.ndarray, *, n_chunks: int,
                   seq_len: int = 200, t_cap: int = 1024,
                   text_cap: int = 128, feat_dim: int = 112
                   ) -> DeviceBatch:
    """Build a packed DeviceBatch on device for the given utterance ids.

    ``utt_ids`` is (U,) int32 (padded entries arbitrary), ``utt_valid`` the
    matching bool mask. Shapes are pinned by the static caps — identical to
    ``pack_batch(..., fixed_*)`` output (minus the unused feature tensor,
    which ships as a placeholder).
    """
    u = utt_ids.shape[0]
    feat_len = jnp.where(utt_valid, arrays.feat_len[utt_ids], 0)
    tgt_len = jnp.where(utt_valid, arrays.tgt_len[utt_ids], 0)
    text_len = jnp.where(utt_valid, arrays.text_len[utt_ids], 0)
    raw_off = arrays.raw_off[utt_ids]
    tgt_off = arrays.tgt_off[utt_ids]
    text_off = arrays.text_off[utt_ids]
    session = jnp.where(utt_valid, arrays.session_id[utt_ids], 0)
    silent = jnp.where(utt_valid, arrays.silent[utt_ids], False)

    # packing destinations (concat semantics of combine_fixed_length)
    feat_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(feat_len)[:-1]])
    total_feat = jnp.sum(feat_len)

    # ---- packed per-frame tensors (N, seq_len, ·) ----------------------
    # Everything is vectorized row gathers (no sequential copy loops): the
    # corpus stores raw EMG frame-grouped (64 floats per feature frame), so
    # one (n_rows, 64) gather builds the packed signal at HBM bandwidth.
    n_rows = n_chunks * seq_len
    pos_f, owner_f = _segment_owner(feat_starts, total_feat, n_rows)
    sess_rows = jnp.where(owner_f >= 0, session[jnp.maximum(owner_f, 0)], 0)
    seg_rows = jnp.where(owner_f >= 0, owner_f + 1, 0)

    pad_raw = arrays.raw_frames.shape[0] - 1  # trailing zero row
    own = jnp.maximum(owner_f, 0)
    frame_src = raw_off[own] + (pos_f - feat_starts[own])
    frame_src = jnp.where(owner_f >= 0, frame_src, pad_raw)
    raw_frames = jnp.take(arrays.raw_frames, frame_src, axis=0,
                          mode="clip")  # (n_rows, 8·C)

    # ---- per-utterance padded views (U, t_cap, ·) -----------------------
    t_range = jnp.arange(t_cap)
    tgt_mask = t_range[None, :] < tgt_len[:, None]
    pad_tgt = arrays.tgt_flat.shape[0] - 1
    tgt_src = jnp.where(tgt_mask, tgt_off[:, None] + t_range[None, :],
                        pad_tgt)
    audio = jnp.take(arrays.tgt_flat, tgt_src.reshape(-1), axis=0,
                     mode="clip").reshape(u, t_cap, -1)
    phonemes = jnp.take(arrays.phon_flat, tgt_src.reshape(-1),
                        mode="clip").reshape(u, t_cap)

    utt_gather_idx = jnp.minimum(
        feat_starts[:, None] + t_range[None, :], n_rows - 1
    ).astype(jnp.int32)
    utt_gather_idx = jnp.where(utt_valid[:, None], utt_gather_idx, 0)

    c_range = jnp.arange(text_cap)
    text_mask = c_range[None, :] < text_len[:, None]
    pad_text = arrays.text_flat.shape[0] - 1
    text_src = jnp.where(text_mask, text_off[:, None] + c_range[None, :],
                         pad_text)
    text = jnp.take(arrays.text_flat, text_src.reshape(-1),
                    mode="clip").reshape(u, text_cap)
    text = jnp.where(text_mask, text, -1)

    return DeviceBatch(
        emg=jnp.zeros((1, 1, feat_dim), jnp.float32),
        raw_emg=raw_frames.reshape(n_chunks, seq_len * 8, -1),
        session_ids=sess_rows.reshape(n_chunks, seq_len),
        segment_ids=seg_rows.reshape(n_chunks, seq_len),
        utt_gather_idx=utt_gather_idx,
        utt_len=feat_len.astype(jnp.int32),
        target_len=tgt_len.astype(jnp.int32),
        phonemes=phonemes.astype(jnp.int32),
        silent=silent,
        text_int=text.astype(jnp.int32),
        text_len=text_len.astype(jnp.int32),
        audio_features=audio,
    )
