"""Serving export: ahead-of-time StableHLO artifacts via ``jax.export``.

The reference deploys by shipping the whole training repo and loading
``model.pt`` into the model class at inference time (reference
``evaluate.py:24-35``, ``recognition_model.py:30-45``). This module adds a
deployment path the reference has no equivalent of: the flagship forwards
are lowered ONCE to serialized StableHLO (per static time-bucket shape, as
the MXU wants) and can be executed anywhere jax runs — no flax, no torch,
no model code, no risk of a training-side edit changing serving numerics.

Design notes (TPU-first):

- **Static shape buckets.** Each exported function is lowered for a fixed
  ``(batch=1, T)`` with ``T`` from ``t_buckets``; inputs pad to the
  smallest covering bucket exactly like the trainers' solo-utterance
  inference (``train/transduction.py::pad_single`` — padding is masked out
  of attention by segment ids, so the result equals an unpadded forward).
  This keeps XLA tiling static instead of relying on shape polymorphism,
  which TPU executables cannot use anyway.
- **Parameters are call arguments, not baked constants.** The artifact
  stays a few hundred KB per bucket and the (57M-param) weight tree ships
  once via orbax next to it; ``ServingBundle.load`` binds them.
- **Multi-platform.** Bundles lower for CPU *and* TPU by default, so the
  artifact exported on a dev host runs on the serving pod. The forward
  passes segment ids, which routes attention through the tuned XLA path
  (``models/transformer.py:178``) — no platform-specific custom calls in
  the exported module.

Bundle layout (``directory/``)::

    manifest.json      kind, t_buckets, dims, charset (recognition)
    fwd_t{T}.jexp      serialized jax.export.Exported per bucket
    params/            orbax tree {params, batch_stats} (or generator)

CLI — export a trained checkpoint (transduction or recognition is picked
by ``--recognition``, matching the training CLIs)::

    python -m silent_speech_tpu.eval.export --models run/model.pt \
        --output_directory serving/ [--recognition] [--t_buckets 256,512]
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_PARAMS_DIR = "params"

DEFAULT_T_BUCKETS = (256, 512, 1024, 2048)

# input dims are fixed: remove_channels zeroes (does not drop) channels
# (data/dataset.py:108-110), 14 features x 8 channels (dsp/emg_features.py)
N_FEATURES = 112
N_RAW_CHANNELS = 8


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _specs_like(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def _input_specs(t: int, n_features: int, raw_channels: int):
    return (
        jax.ShapeDtypeStruct((1, t, n_features), jnp.float32),
        jax.ShapeDtypeStruct((1, t * 8, raw_channels), jnp.float32),
        jax.ShapeDtypeStruct((1, t), jnp.int32),
        jax.ShapeDtypeStruct((1, t), jnp.int32),
    )


# --------------------------------------------------------------------------
# int8 weight-only quantization (serving)
# --------------------------------------------------------------------------
#
# Batch-1 serving on TPU is HBM-bandwidth-bound on the weight stream; storing
# the big GEMM kernels as per-output-channel symmetric int8 quarters that
# traffic (the dequantize multiply fuses into the matmul read under XLA).
# Biases, norms, embeddings and small kernels stay float32.

_QKEYS = frozenset(("int8", "scale"))

# GEMM weight leaves: flax Dense/Conv kernels plus the attention
# projections (models/transformer.py:162-165)
_QNAMES = frozenset(("kernel", "w_q", "w_k", "w_v", "w_o"))


def _quantize_leaf(w: np.ndarray) -> dict:
    # scale per slice of the contraction (second-to-last) axis: per output
    # channel for (in, out) Dense kernels, per (k, out) for conv kernels,
    # per (head, out) for the (h, d, a) attention projections
    scale = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.maximum(scale / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"int8": q, "scale": scale}


def is_quantized_leaf(node) -> bool:
    return isinstance(node, dict) and set(node) == _QKEYS


def quantize_tree(params, min_size: int = 4096):
    """Per-channel symmetric int8 for every float GEMM-weight leaf with
    ≥ ``min_size`` elements; everything else passes through."""
    def rec(node, name):
        if isinstance(node, dict):
            return {k: rec(v, k) for k, v in node.items()}
        arr = np.asarray(node)
        if (name in _QNAMES and arr.ndim >= 2 and arr.size >= min_size
                and np.issubdtype(arr.dtype, np.floating)):
            return _quantize_leaf(arr.astype(np.float32))
        return arr

    return rec(params, "")


def dequantize_tree(qtree):
    """Inverse of :func:`quantize_tree` (runs inside jit at serving time)."""
    if is_quantized_leaf(qtree):
        return (qtree["int8"].astype(jnp.float32) * qtree["scale"])
    if isinstance(qtree, dict):
        return {k: dequantize_tree(v) for k, v in qtree.items()}
    return qtree


def export_trainer_forward(trainer, kind: str,
                           t_buckets: Sequence[int] = DEFAULT_T_BUCKETS,
                           platforms: Sequence[str] = ("cpu", "tpu"),
                           quantize: Optional[str] = None):
    """Lower a trainer's solo-utterance inference forward for each time
    bucket. Returns ``({t: jax.export.Exported}, params_tree)``.

    ``kind``: ``"transduction"`` (→ (1,T,80) normalized mel) or
    ``"recognition"`` (→ (1,T,38) CTC log-probs).
    ``quantize="int8"``: weight-only per-channel int8 for the big kernels —
    the exported module takes the quantized tree and dequantizes in-jit.
    """
    from jax import export as jexport

    assert trainer.state is not None, "init/load the trainer state first"
    assert quantize in (None, "int8"), quantize
    model = trainer.model

    def fwd(params, batch_stats, emg, raw, sess, seg):
        if quantize:
            params = dequantize_tree(params)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          emg, raw, sess, segment_ids=seg, train=False)
        if kind == "transduction":
            return out[0]  # (mel, phoneme_logits) → mel
        return jax.nn.log_softmax(out, axis=-1)

    params = jax.device_get(trainer.state.params)
    if quantize:
        params = quantize_tree(params)
    stats = jax.device_get(trainer.state.batch_stats)
    n_feat, n_raw = N_FEATURES, N_RAW_CHANNELS
    exported = {}
    for t in t_buckets:
        assert t % 32 == 0, f"bucket {t} must be a multiple of 32"
        exported[t] = jexport.export(
            jax.jit(fwd), platforms=tuple(platforms))(
            _specs_like(params), _specs_like(stats),
            *_input_specs(t, n_feat, n_raw))
    return exported, params


def save_serving_bundle(trainer, kind: str, directory: str,
                        t_buckets: Sequence[int] = DEFAULT_T_BUCKETS,
                        platforms: Sequence[str] = ("cpu", "tpu"),
                        quantize: Optional[str] = None,
                        audio_normalizer=None) -> str:
    """Export + write a self-contained serving bundle. Returns the dir.

    ``audio_normalizer`` (a ``data.normalizers.FeatureNormalizer``, the
    dataset's ``mfcc_norm``) embeds the mel denormalization stats in the
    manifest so a downstream vocoder can run without the corpus."""
    os.makedirs(directory, exist_ok=True)
    exported, params = export_trainer_forward(
        trainer, kind, t_buckets, platforms, quantize=quantize)
    for t, exp in exported.items():
        with open(os.path.join(directory, f"fwd_t{t}.jexp"), "wb") as f:
            f.write(exp.serialize())

    _checkpointer().save(
        os.path.abspath(os.path.join(directory, _PARAMS_DIR)),
        {"params": params,
         "batch_stats": jax.device_get(trainer.state.batch_stats)},
        force=True)

    manifest = {
        "kind": kind,
        "t_buckets": sorted(int(t) for t in t_buckets),
        "platforms": list(platforms),
        "num_features": N_FEATURES,
        "num_raw_channels": N_RAW_CHANNELS,
        "quantize": quantize,
    }
    if kind == "recognition":
        manifest["charset"] = list(trainer.text_transform.chars)
    if audio_normalizer is not None:
        manifest["audio_normalizer"] = {
            "means": np.asarray(
                audio_normalizer.feature_means).ravel().tolist(),
            "stddevs": np.asarray(
                audio_normalizer.feature_stddevs).ravel().tolist(),
        }
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return directory


DEFAULT_MEL_BUCKETS = (128, 256, 512, 1024)


def save_vocoder_bundle(vocoder, directory: str,
                        mel_buckets: Sequence[int] = DEFAULT_MEL_BUCKETS,
                        platforms: Sequence[str] = ("cpu", "tpu")) -> str:
    """Export the HiFi-GAN generator (mel (1,F,80) → waveform (1,F·hop))
    per mel-frame bucket. Together with a transduction bundle this is the
    complete EMG→speech serving chain, model-code-free. ``vocoder`` is a
    ``models.hifigan.Vocoder`` (or anything with ``.params``/``.cfg``)."""
    from jax import export as jexport

    from ..models.hifigan import generator_apply

    os.makedirs(directory, exist_ok=True)
    cfg = vocoder.cfg
    params = jax.device_get(vocoder.params)

    def fwd(p, mel):
        return generator_apply(p, mel, cfg)

    for f_ in mel_buckets:
        exp = jexport.export(jax.jit(fwd), platforms=tuple(platforms))(
            _specs_like(params),
            jax.ShapeDtypeStruct((1, f_, cfg.num_mels), jnp.float32))
        with open(os.path.join(directory, f"fwd_t{f_}.jexp"), "wb") as f:
            f.write(exp.serialize())

    _checkpointer().save(
        os.path.abspath(os.path.join(directory, _PARAMS_DIR)),
        {"params": params, "batch_stats": {}}, force=True)
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump({"kind": "vocoder",
                   "t_buckets": sorted(int(b) for b in mel_buckets),
                   "platforms": list(platforms),
                   "num_mels": cfg.num_mels,
                   "hop_length": cfg.hop_length}, f, indent=1)
    return directory


class ServingBundle:
    """Run an exported bundle: pad to the smallest covering bucket, call
    the deserialized StableHLO, slice back to the true length."""

    def __init__(self, directory: str):
        from jax import export as jexport

        with open(os.path.join(directory, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.kind = self.manifest["kind"]
        self._fns = {}
        self._calls = {}
        for t in self.manifest["t_buckets"]:
            with open(os.path.join(directory, f"fwd_t{t}.jexp"), "rb") as f:
                self._fns[t] = jexport.deserialize(f.read())
            # Exported.call re-traces on every invocation; a jit wrapper
            # compiles the deserialized StableHLO once per bucket and
            # serves every subsequent call from the executable cache
            # (7.2 s/call -> ~40 ms/call on the TPU latency bench).
            self._calls[t] = jax.jit(self._fns[t].call)
        tree = _checkpointer().restore(
            os.path.abspath(os.path.join(directory, _PARAMS_DIR)))
        self.params, self.batch_stats = tree["params"], tree["batch_stats"]

    @classmethod
    def load(cls, directory: str) -> "ServingBundle":
        return cls(directory)

    def _bucket(self, t: int) -> int:
        for b in self.manifest["t_buckets"]:
            if t <= b:
                return b
        raise ValueError(
            f"utterance length {t} exceeds the largest exported bucket "
            f"{self.manifest['t_buckets'][-1]}; re-export with a larger "
            "t_buckets entry")

    def predict(self, emg: np.ndarray, raw_emg: np.ndarray,
                session_ids: Optional[np.ndarray] = None) -> np.ndarray:
        """Solo-utterance inference: ``emg`` (T, num_features), ``raw_emg``
        (T*8, raw_channels) → (T, 80) mel or (T, 38) CTC log-probs."""
        t = emg.shape[0]
        b = self._bucket(t)
        emg_p = np.zeros((1, b, emg.shape[1]), np.float32)
        emg_p[0, :t] = emg
        raw_p = np.zeros((1, b * 8, raw_emg.shape[1]), np.float32)
        raw_p[0, : t * 8] = raw_emg
        sess = np.zeros((1, b), np.int32)
        if session_ids is not None:
            sess[0, :t] = session_ids
        elif self.kind == "transduction":
            # the live transduction path conditions on the session
            # embedding (train/transduction.py::pad_single); a silent
            # all-zeros substitute would produce session-0 voice for
            # every speaker. Recognition's live eval path zeroes them.
            raise ValueError(
                "transduction bundles require session_ids (the model "
                "conditions on the session embedding)")
        seg = np.zeros((1, b), np.int32)
        seg[0, :t] = 1
        out = self._calls[b](self.params, self.batch_stats,
                             emg_p, raw_p, sess, seg)
        return np.asarray(out)[0, :t]

    @property
    def has_normalizer(self) -> bool:
        return "audio_normalizer" in self.manifest

    def denormalize(self, mel: np.ndarray) -> np.ndarray:
        """Normalized mel (as ``predict`` returns) → log-mel for a
        vocoder, using the stats embedded at export time."""
        n = self.manifest["audio_normalizer"]
        means = np.asarray(n["means"], np.float32)
        stds = np.asarray(n["stddevs"], np.float32)
        return mel * stds + means

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        """mel (F, num_mels) → waveform (F·hop,) (vocoder bundles). The
        generator is convolutional, so the last few hundred samples sit in
        the receptive field of the pad boundary and may differ slightly
        from an unpadded run."""
        assert self.kind == "vocoder", self.kind
        t = mel.shape[0]
        b = self._bucket(t)
        # pad with the log-mel floor (dsp/mel.py: log(clip(x, 1e-5))) —
        # silence, not the loud broadband energy a 0.0 log-mel would be
        mel_p = np.full((1, b, mel.shape[1]), np.log(1e-5), np.float32)
        mel_p[0, :t] = mel
        out = self._calls[b](self.params, mel_p)
        return np.asarray(out)[0, : t * self.manifest["hop_length"]]

    def decode_greedy(self, log_probs: np.ndarray) -> str:
        """Greedy CTC transcript from ``predict`` output (recognition)."""
        assert self.kind == "recognition"
        from .decode import greedy_ctc_decode

        chars = self.manifest["charset"]
        ids = greedy_ctc_decode(log_probs, blank_id=len(chars))
        return "".join(chars[i] for i in ids)


def _synthetic_example(t: int = 112) -> dict:
    """A schema-shaped random utterance, enough to init trainer state."""
    rng = np.random.default_rng(0)
    return {
        "emg": rng.normal(size=(t, N_FEATURES)).astype(np.float32),
        "raw_emg": rng.normal(size=(t * 8, N_RAW_CHANNELS)).astype(
            np.float32),
        "session_ids": np.zeros(t, np.int64),
        "audio_features": rng.normal(size=(t, 80)).astype(np.float32),
        "silent": False,
        "text": "export",
        "text_int": rng.integers(0, 37, size=12).astype(np.int64),
        "phonemes": rng.integers(0, 48, size=t).astype(np.int64),
    }


def main():
    from absl import flags, logging

    from silent_speech_tpu.config import config_from_flags

    cfg = config_from_flags()
    F = flags.FLAGS

    kind = "recognition" if F.export_recognition else "transduction"
    if kind == "recognition":
        from silent_speech_tpu.train.recognition import RecognitionTrainer

        trainer = RecognitionTrainer(cfg)
    else:
        from silent_speech_tpu.train.transduction import TransductionTrainer

        trainer = TransductionTrainer(cfg)

    # init state shapes from a synthetic example — exporting a checkpoint
    # must not require the training corpus on the exporting host
    trainer.init_state(trainer._pack([_synthetic_example()]), seed=0)

    models = list(F.models) if F.models else []
    assert len(models) == 1, "pass exactly one --models checkpoint"
    from silent_speech_tpu.train.checkpoint import load_any_checkpoint

    params, stats = load_any_checkpoint(trainer.state, models[0],
                                        num_layers=cfg.model.num_layers)
    trainer.state = trainer.state.replace(params=params, batch_stats=stats)

    audio_norm = None
    if kind == "transduction" and os.path.exists(cfg.data.normalizers_file):
        from silent_speech_tpu.data.normalizers import load_normalizers

        audio_norm, _ = load_normalizers(cfg.data.normalizers_file)

    out = save_serving_bundle(
        trainer, kind, cfg.transduction.output_directory,
        t_buckets=[int(t) for t in F.t_buckets],
        quantize="int8" if F.export_int8 else None,
        audio_normalizer=audio_norm)
    logging.info("wrote %s serving bundle → %s (mel normalizer: %s)",
                 kind, out, "embedded" if audio_norm else "absent")


if __name__ == "__main__":
    import sys

    from absl import flags

    from silent_speech_tpu.config import define_flags

    define_flags()
    if "t_buckets" not in flags.FLAGS:
        flags.DEFINE_list("t_buckets",
                          [str(t) for t in DEFAULT_T_BUCKETS],
                          "exported time buckets (multiples of 32)")
        flags.DEFINE_bool("export_recognition", False,
                          "export the recognition model (default: "
                          "transduction)")
        flags.DEFINE_bool("export_int8", False,
                          "weight-only per-channel int8 for the big "
                          "kernels (smaller + less HBM traffic)")
    flags.FLAGS(sys.argv)
    main()
