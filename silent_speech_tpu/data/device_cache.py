"""HBM-resident corpus cache with on-device batch assembly.

The featurized corpus (raw EMG at the model rate, mel targets, phonemes,
text) lives in a few flat device arrays; each training step ships only a
(U,) utterance-id vector and assembles the packed batch ON DEVICE — gathers
from the flat caches build the (N, 200·8, 8) chunk tensor, the per-utterance
(U, T, 80) target views, session/segment ids, everything. Host→device
traffic per step drops from ~16 MB to a few hundred bytes.

This is the TPU-first replacement for the reference's per-batch host
collation (``read_emg.py:261-296`` + ``combine_fixed_length``): the
reference re-uploads every batch; here the corpus uploads once (it fits
HBM: hours of EMG ≈ a few GB) and XLA gathers assemble batches at HBM
bandwidth. Assembly output matches ``pack_batch`` bit-for-bit (tested).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .packing import DeviceBatch


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
    def build(examples: Sequence[dict], device=None,
              mesh=None) -> "DeviceCorpus":
        """Host-side flattening of featurized example dicts (the
        ``EMGDataset.__getitem__`` schema), then one upload.

        With ``mesh``, the flat arrays replicate across every device (the
        corpus is small next to HBM; batches shard at assembly time via
        ``constrain_batch`` in the trainers' cache steps)."""
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
