"""On-device corpus featurization for the HBM cache build.

The reference featurizes every utterance on the host (scipy filtfilt chain,
np.interp resampling, librosa mel — ``read_emg.py:52-100``); this module
runs the same math as ONE jit region per fixed-size batch of utterances
(SURVEY.md §2.3-7, VERDICT round-2 item 7): the masked zero-phase filter
chain (:func:`~..dsp.jax_filters.jax_filtfilt_masked`, bit-identical to the
unmasked twin on each utterance's valid prefix), neighbor-context cropping,
linear-interp resampling to the 689.06 Hz model rate, soft-clip
normalization, and the HiFi-GAN log-mel target with reflect padding at the
dynamic utterance boundary — all under static shapes so utterances batch.

Host code keeps IO and the integer bookkeeping (section lengths and trims,
computed with the exact host-path arithmetic), the device runs the DSP.
``build_device_corpus`` is the production entry point used by the trainers'
cache builds; featurized arrays land in the same
:class:`~.device_cache.DeviceCorpus` layout, parity-tested against the
host ``EMGDataset.__getitem__`` path end-to-end.

Not covered (host fallback): the 112-dim EMG frame features — the corpus
training path never consumes them (the encoder reads the raw signal; see
``device_cache.assemble_batch``, which ships a placeholder).
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.jax_filters import jax_filtfilt_masked
from ..dsp.jax_pipeline import _filter_coeffs
from ..dsp.mel import MelConfig, _dft_matrices, hann_window, mel_filterbank
from ..dsp.resample import resample_poly_audio
from ..phonemes import SIL_ID, read_phonemes
from ..utils.audio_io import read_audio

CAPTURE_RATE = 1000.0
RAW_RATE = 689.06
FEAT_RATE = 516.79
FRAME_LENGTH = 16
HOP_LENGTH = 6


# ---------------------------------------------------------------------------
# host-path integer arithmetic (must match dsp.resample.subsample /
# dsp.mel.log_mel_spectrogram / data.dataset.load_utterance exactly)
# ---------------------------------------------------------------------------

def subsample_len(n: int, new_freq: float, old_freq: float = CAPTURE_RATE
                  ) -> int:
    """Output length of ``dsp.resample.subsample`` for an n-sample input
    (the np.arange count, including its float endpoint behavior)."""
    return len(np.arange(0, (n - 1) / old_freq, 1.0 / new_freq))


def mel_frames_len(n_samples: int, cfg: MelConfig = MelConfig()) -> int:
    """Frame count of ``dsp.mel.log_mel_spectrogram`` for an n-sample clip
    ((n_fft - hop)/2 reflect pad both sides, center=False framing)."""
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    return 1 + (n_samples + 2 * pad - cfg.n_fft) // cfg.hop_size


def emg_frame_count(n_516: int) -> int:
    """EMG feature frames for an n-sample 516.79 Hz signal."""
    return 1 + (n_516 - FRAME_LENGTH) // HOP_LENGTH


# ---------------------------------------------------------------------------
# raw (pre-DSP) utterance loading — the IO half of load_utterance
# ---------------------------------------------------------------------------

def load_utterance_raw(base_dir: str, index: int) -> dict:
    """IO-only half of ``dataset.load_utterance``: the neighbor-context
    raw EMG concat (shared helper), the 22.05 kHz audio, and the info
    record."""
    from .dataset import load_neighbor_context_emg

    x, n_before, n_main = load_neighbor_context_emg(base_dir, index)

    audio_path = os.path.join(base_dir, f"{index}_audio_clean.flac")
    audio, rate = read_audio(audio_path)
    if rate != 22050:
        audio = resample_poly_audio(audio, rate, 22050)

    with open(os.path.join(base_dir, f"{index}_info.json")) as f:
        info = json.load(f)

    return {
        "raw_concat": np.asarray(x, np.float32),
        "before_len": n_before,
        "main_len": n_main,
        "audio": np.asarray(audio, np.float32),
        "audio_file": audio_path,
        "text": info["text"],
        "book_location": (info["book"], info["sentence_index"]),
        "base_dir": base_dir,
        "index": index,
    }


# ---------------------------------------------------------------------------
# device kernels (one jit per buffer shape; utterances batch via vmap)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("raw_cap",))
def _emg_kernel(raw, total_len, before_len, main_len, t8, chan_mask, *,
                raw_cap: int):
    """(B, T_pad, C) raw capture batches → (B, raw_cap, C) soft-clipped
    689.06 Hz model-rate signal (rows ``[0, t8_b)`` valid).

    Per utterance: masked zero-phase notch-harmonic + drift chain over the
    neighbor-context concat, context crop, linear-interp resample starting
    at the host path's ``[8:]`` trim, /20 + 50·tanh(/50) soft clip
    (``read_emg.py:66-70``, ``read_emg.py:228-230``).
    """
    coeffs = _filter_coeffs(CAPTURE_RATE, 60.0)

    def per_utt(x, tot, bef, mlen, t8_u):
        for b, a in coeffs:
            x = jax_filtfilt_masked(b, a, x, tot)
        tp = jnp.arange(x.shape[0])
        z = jnp.where((tp < mlen)[:, None],
                      x[jnp.clip(bef + tp, 0, x.shape[0] - 1)], 0.0)
        t = jnp.arange(raw_cap)
        pos = (t + 8).astype(jnp.float32) * jnp.float32(
            CAPTURE_RATE / RAW_RATE)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, mlen - 1)
        hi = jnp.clip(lo + 1, 0, mlen - 1)
        frac = (pos - lo).astype(z.dtype)
        v = z[lo] * (1 - frac[:, None]) + z[hi] * frac[:, None]
        v = v * chan_mask[None, :]
        v = jnp.where((t < t8_u)[:, None], v, 0.0)
        v = v / 20.0
        return 50.0 * jnp.tanh(v / 50.0)

    return jax.vmap(per_utt)(raw, total_len, before_len, main_len, t8)


@partial(jax.jit, static_argnames=("mel_cap", "cfg", "normalize"))
def _mel_kernel(audio, a_len, n_frames, mel_mean, mel_std, *,
                mel_cap: int, cfg: MelConfig = MelConfig(),
                normalize: bool = True):
    """(B, A_pad) audio batches → (B, mel_cap, 80) normalized log-mel
    (rows ``[0, n_frames_b)`` valid).

    Reflect padding at the dynamic end is a clipped-gather scatter; frames
    ride two DFT matmuls (MXU-native, see ``dsp.mel``).
    """
    pad = int((cfg.n_fft - cfg.hop_size) / 2)
    a_pad = audio.shape[1]
    window = jnp.asarray(hann_window(cfg.win_size))
    cos_m, sin_m = _dft_matrices(cfg.n_fft)
    basis = jnp.asarray(mel_filterbank(
        cfg.sampling_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax))

    def per_utt(x, length, nf):
        x = jnp.clip(x, -1.0, 1.0)  # load_audio_features clip
        j = jnp.arange(pad)
        front = x[pad - j]
        ext = jnp.concatenate([front, x, jnp.zeros(pad, x.dtype)])
        back = x[jnp.clip(length - 2 - j, 0, a_pad - 1)]
        ext = ext.at[pad + length + j].set(back)

        starts = cfg.hop_size * jnp.arange(mel_cap)
        idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]
        frames = ext[jnp.clip(idx, 0, ext.shape[0] - 1)] * window[None, :]
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        mag = jnp.sqrt(re ** 2 + im ** 2 + 1e-9)
        mel = jnp.log(jnp.clip(mag @ basis.T, 1e-5))
        if normalize:
            mel = (mel - mel_mean) / mel_std
        return jnp.where((jnp.arange(mel_cap) < nf)[:, None], mel, 0.0)

    return jax.vmap(per_utt)(audio, a_len, n_frames)


# ---------------------------------------------------------------------------
# corpus-level driver
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def featurize_on_device(dataset, ids: Optional[Sequence[int]] = None,
                        batch: int = 8) -> List[dict]:
    """Featurize dataset examples with the device DSP kernels; returns
    example dicts in the ``EMGDataset.__getitem__`` schema (minus the
    112-dim features, which the corpus path never consumes)."""
    ids = list(range(len(dataset))) if ids is None else list(ids)
    if not ids:
        return []

    # unique utterances to process: every example (with the dataset's
    # limit_length) + voiced pairs of silent examples (loaded UNLIMITED,
    # like dataset.__getitem__'s pair load) — keyed by (dir, idx, lim)
    # because the host path featurizes both variants separately
    utt_keys = []   # (SessionDir, idx, limit_length)
    key_pos = {}

    def claim(d, idx, lim):
        k = (d.directory, idx, lim)
        if k not in key_pos:
            key_pos[k] = len(utt_keys)
            utt_keys.append((d, idx, lim))
        return key_pos[k]

    ex_rows, pair_rows = [], []
    for i in ids:
        d, idx = dataset.example_indices[i]
        ex_rows.append(claim(d, idx, dataset.limit_length))
        if d.silent:
            with open(os.path.join(d.directory,
                                   f"{idx}_info.json")) as f:
                info = json.load(f)
            vd, vidx = dataset.voiced_data_locations[
                (info["book"], info["sentence_index"])]
            pair_rows.append(claim(vd, vidx, False))
        else:
            pair_rows.append(-1)

    # ---- host IO + integer bookkeeping --------------------------------
    raws = []
    for (d, idx, lim) in utt_keys:
        r = load_utterance_raw(d.directory, idx)
        r["session_index"] = d.session_index
        r["silent"] = d.silent
        m516 = subsample_len(r["main_len"], FEAT_RATE)
        feat_frames = emg_frame_count(m516)
        max_frames = min(feat_frames, 800) if lim else feat_frames
        mel_frames = min(mel_frames_len(len(r["audio"])), max_frames)
        r["t_frames"] = min(feat_frames, mel_frames)
        r["mel_frames"] = mel_frames
        raws.append(r)

    remove = tuple(getattr(dataset.cfg, "remove_channels", ()) or ())

    # ---- device passes ------------------------------------------------
    t_pad = _round_up(max(r["raw_concat"].shape[0] for r in raws), 256)
    raw_cap = _round_up(max(8 * r["t_frames"] for r in raws), 256)
    a_pad = _round_up(max(len(r["audio"]) for r in raws), 4096)
    mel_cap = _round_up(max(r["mel_frames"] for r in raws), 32)

    n_ch = raws[0]["raw_concat"].shape[1]
    chan_mask = np.ones(n_ch, np.float32)
    for c in remove:
        chan_mask[int(c)] = 0.0

    normalize = not dataset.no_normalizers
    if normalize:
        mel_mean = np.asarray(dataset.mfcc_norm.feature_means,
                              np.float32).reshape(1, -1)
        mel_std = np.float32(dataset.mfcc_norm.feature_stddevs)
    else:
        mel_mean = np.zeros((1, 80), np.float32)
        mel_std = np.float32(1.0)

    raw_out = [None] * len(raws)
    mel_out = [None] * len(raws)
    for lo in range(0, len(raws), batch):
        group = raws[lo: lo + batch]
        b = len(group)
        raw_buf = np.zeros((batch, t_pad, n_ch), np.float32)
        tot = np.zeros(batch, np.int32)
        bef = np.zeros(batch, np.int32)
        mlen = np.ones(batch, np.int32)
        t8 = np.zeros(batch, np.int32)
        audio_buf = np.zeros((batch, a_pad), np.float32)
        alen = np.ones(batch, np.int32)
        nframes = np.zeros(batch, np.int32)
        for k, r in enumerate(group):
            n = r["raw_concat"].shape[0]
            raw_buf[k, :n] = r["raw_concat"]
            tot[k] = n
            bef[k] = r["before_len"]
            mlen[k] = r["main_len"]
            t8[k] = 8 * r["t_frames"]
            na = len(r["audio"])
            audio_buf[k, :na] = r["audio"]
            alen[k] = max(na, 2)
            nframes[k] = r["mel_frames"]
        rdev = np.asarray(_emg_kernel(
            jnp.asarray(raw_buf), jnp.asarray(tot), jnp.asarray(bef),
            jnp.asarray(mlen), jnp.asarray(t8), jnp.asarray(chan_mask),
            raw_cap=raw_cap))
        mdev = np.asarray(_mel_kernel(
            jnp.asarray(audio_buf), jnp.asarray(alen),
            jnp.asarray(nframes), jnp.asarray(mel_mean),
            jnp.asarray(mel_std), mel_cap=mel_cap, normalize=normalize))
        for k, r in enumerate(group):
            raw_out[lo + k] = rdev[k, : 8 * r["t_frames"]]
            mel_out[lo + k] = mdev[k, : r["mel_frames"]][: r["t_frames"]]

    # ---- phonemes (host TextGrids, voiced timelines) -------------------
    tad = dataset.cfg.text_align_directory
    phon_out = []
    for r in raws:
        t = r["t_frames"]
        phon = None
        if tad is not None:
            sess = os.path.basename(r["base_dir"])
            tg = os.path.join(tad, sess,
                              f'{sess}_{r["index"]}_audio.TextGrid')
            if os.path.exists(tg):
                phon = read_phonemes(tg, t)
        if phon is None:
            phon = np.full(t, SIL_ID, dtype=np.int64)
        phon_out.append(phon)

    # ---- assemble example dicts ---------------------------------------
    examples = []
    for i, row, pair in zip(ids, ex_rows, pair_rows):
        r = raws[row]
        t = r["t_frames"]
        ex = {
            "audio_features": mel_out[row],
            "raw_emg": raw_out[row],
            "text": r["text"],
            "text_int": np.array(
                dataset.text_transform.text_to_int(r["text"]),
                dtype=np.int64),
            "file_label": r["index"],
            "session_ids": np.full(t, r["session_index"], dtype=np.int64),
            "book_location": r["book_location"],
            "silent": r["silent"],
            "phonemes": phon_out[row],
            "audio_file": r["audio_file"],
        }
        if pair >= 0:
            ex["parallel_voiced_audio_features"] = mel_out[pair]
            ex["phonemes"] = phon_out[pair]
            ex["audio_file"] = raws[pair]["audio_file"]
        examples.append(ex)
    return examples


def build_device_corpus(dataset, mesh=None, featurize: str = "jax",
                        hbm_fraction: float = 0.4):
    """Build the HBM corpus cache, featurizing with the device DSP
    pipeline by default (``featurize="host"`` falls back to the
    per-utterance host path). Raises ``HBMBudgetError`` when the corpus
    would exceed ``hbm_fraction`` of per-device HBM (callers fall back
    to host packing)."""
    from .device_cache import DeviceCorpus

    if featurize == "jax":
        examples = featurize_on_device(dataset)
    else:
        examples = [dataset[i] for i in range(len(dataset))]
    return DeviceCorpus.build(examples, mesh=mesh,
                              hbm_fraction=hbm_fraction)
