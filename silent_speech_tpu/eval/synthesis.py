"""Synthesis outputs: wav dumping and model ensembling.

Reference equivalents: ``save_output`` (``transduction_model.py:57-73``) —
forward one utterance, invert the mel normalizer, vocode, write a 22.05 kHz
wav — and ``EnsembleModel`` (``evaluate.py:22-34``) which averages the mel
and phoneme heads of N checkpoints.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

from ..utils.audio_io import write_wav


def save_output(trainer, example: dict, filename: str, audio_normalizer,
                vocoder) -> np.ndarray:
    """Predict → denormalize → vocode → write wav; returns the audio."""
    pred = trainer.predict(example)           # (T, 80), normalized
    mel = audio_normalizer.inverse(pred)
    audio = np.asarray(vocoder(mel))
    write_wav(filename, audio, 22050)
    return audio


class EnsemblePredictor:
    """Averages the outputs of several trained transduction states.

    Mirrors the reference EnsembleModel: mean over mel heads and phoneme
    heads. Implemented by averaging the already-jitted per-model forwards
    (models are identical architecture, distinct weights).
    """

    def __init__(self, trainers: Sequence = None, *, base=None,
                 states: Sequence = None):
        """Either from N trainers, or from ONE base trainer plus a list of
        (params, batch_stats) pairs (the cheap path: one model object, one
        init, N weight loads)."""
        if trainers:
            base = trainers[0]
            states = [(t.state.params, t.state.batch_stats)
                      for t in trainers]
        assert base is not None and states, "need at least one model"
        self.base = base
        self.states = list(states)
        self._eval_step = None
        self._predict_fn = None
        self._stacked = None

    def predict(self, example: dict) -> np.ndarray:
        """Mean-of-heads mel prediction via ONE compiled vmapped forward
        over stacked params (N separate compiles would cost N traces
        through the ~40 s remote compiler)."""
        import jax

        base = self.base
        if self._predict_fn is None:
            def fwd(ps, ss, emg, raw, sess, seg):
                def one(p, s):
                    return base.model.apply(
                        {"params": p, "batch_stats": s}, emg, raw, sess,
                        segment_ids=seg, train=False)

                preds, _ = jax.vmap(one)(ps, ss)
                return preds.mean(0)

            self._predict_fn = jax.jit(fwd)
        params_s, stats_s = self._stacked_variables()
        emg, raw, sess, seg, t = base.pad_single(example)
        pred = self._predict_fn(params_s, stats_s, emg, raw, sess, seg)
        return np.asarray(pred)[0, :t]

    def _stacked_variables(self):
        import jax
        import jax.numpy as jnp

        if self._stacked is None:
            params = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[p for p, _ in self.states])
            stats = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[s_ for _, s_ in self.states])
            self._stacked = (params, stats)
        return self._stacked

    def evaluate(self, dataset, batch_size: int = 32):
        """Ensemble validation loss / phoneme accuracy / confusion: both
        heads are averaged across models *before* the loss, matching the
        reference EnsembleModel semantics (``evaluate.py:27-34``)."""
        import jax
        import jax.numpy as jnp

        from ..phonemes import NUM_PHONES
        from ..train.losses import transduction_loss

        base = self.base
        w = base.cfg.transduction.phoneme_loss_weight

        if self._eval_step is None:
            def eval_step(params_s, stats_s, batch, n_silent):
                def one(p, s):
                    return base.model.apply(
                        {"params": p, "batch_stats": s}, batch.emg,
                        batch.raw_emg, batch.session_ids, train=False)

                preds, phones = jax.vmap(one)(params_s, stats_s)
                out = transduction_loss(
                    preds.mean(0), phones.mean(0), batch, w,
                    phoneme_eval=True, n_silent=n_silent)
                return {"loss": out.loss, "correct": out.correct_phones,
                        "total": out.total_length,
                        "confusion": out.confusion}

            self._eval_step = jax.jit(eval_step, static_argnums=(3,))

        params_s, stats_s = self._stacked_variables()
        total_loss = correct = total = batches = 0
        confusion = np.zeros((NUM_PHONES, NUM_PHONES))
        for group in base.eval_groups(dataset, batch_size):
            examples = [dataset[i] for i in group]
            batch = base._pack(examples)
            db = base._to_device(batch)
            m = self._eval_step(params_s, stats_s, db, batch.num_silent)
            total_loss += float(m["loss"])
            batches += 1
            correct += int(m["correct"])
            total += int(m["total"])
            confusion += np.asarray(m["confusion"])
        return (total_loss / max(batches, 1), correct / max(total, 1),
                confusion)

    def get_aligned_prediction(self, example: dict, audio_normalizer):
        import jax.numpy as jnp

        from ..ops.dtw import dtw_align

        pred = self.predict(example)
        if example["silent"]:
            y = np.asarray(example["parallel_voiced_audio_features"])
            costs = np.sqrt(np.clip(
                (pred ** 2).sum(-1)[:, None] + (y ** 2).sum(-1)[None, :]
                - 2 * pred @ y.T, 1e-12, None))
            align, _ = dtw_align(
                jnp.asarray(costs.T),
                jnp.asarray(y.shape[0], jnp.int32),
                jnp.asarray(pred.shape[0], jnp.int32))
            pred = pred[np.asarray(align)]
        return audio_normalizer.inverse(pred)


def dump_all_outputs(trainer, dataset, output_directory: str,
                     audio_normalizer, vocoder,
                     prefix: str = "example_output") -> List[str]:
    """Write ``{prefix}_{i}.wav`` for every example
    (reference ``transduction_model.py:222-223``, ``evaluate.py:61-62``)."""
    os.makedirs(output_directory, exist_ok=True)
    paths = []
    for i in range(len(dataset)):
        path = os.path.join(output_directory, f"{prefix}_{i}.wav")
        save_output(trainer, dataset[i], path, audio_normalizer, vocoder)
        paths.append(path)
    return paths
