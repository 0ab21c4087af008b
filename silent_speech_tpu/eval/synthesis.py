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

    def __init__(self, trainers: Sequence):
        assert trainers, "need at least one model"
        self.trainers = list(trainers)

    def predict(self, example: dict) -> np.ndarray:
        preds = [t.predict(example) for t in self.trainers]
        return np.mean(preds, axis=0)

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
