"""ASR-based WER evaluation of synthesized audio.

The reference judges synthesis quality by transcribing the vocoded wavs with
DeepSpeech 0.7.0 (pbmm + scorer) and computing WER against the target texts
(``asr_evaluation.py:12-32``); the README pins that exact version for
comparable numbers. DeepSpeech is a host-side C++/TF runtime, not a TPU
concern — we keep it behind a pluggable interface:

- ``DeepSpeechASR``: the pinned reference judge (requires the ``deepspeech``
  package + model files; raises a clear error when absent),
- ``TransformersASR``: any HF CTC model (e.g. wav2vec2) as a fallback judge
  when DeepSpeech isn't installable — NOT comparable to published numbers,
- ``evaluate``: reference-compatible driver reading
  ``example_output_{i}.wav`` from a directory.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, List, Optional

import numpy as np

from ..dsp.resample import resample_poly_audio
from ..text import ascii_transliterate, remove_punctuation, wer
from ..utils.audio_io import read_audio


class DeepSpeechASR:
    """The pinned reference ASR judge (DeepSpeech 0.7.0)."""

    def __init__(self, model_path: str = "deepspeech-0.7.0-models.pbmm",
                 scorer_path: str = "deepspeech-0.7.0-models.scorer"):
        try:
            import deepspeech  # type: ignore
        except ImportError as e:
            raise ImportError(
                "the `deepspeech` package is not installed; install "
                "deepspeech==0.7.0 with its pbmm+scorer models for "
                "published-comparable WER, or use TransformersASR"
            ) from e
        self.model = deepspeech.Model(model_path)
        if scorer_path and os.path.exists(scorer_path):
            self.model.enableExternalScorer(scorer_path)
        assert self.model.sampleRate() == 16000, "wrong sample rate"

    def transcribe(self, audio: np.ndarray, rate: int) -> str:
        if rate != 16000:
            audio = resample_poly_audio(audio, rate, 16000)
        audio_int16 = (audio * (2 ** 15)).astype(np.int16)
        return self.model.stt(audio_int16)


class TransformersASR:
    """HF CTC ASR fallback judge (not comparable to published WER).

    Pass ``model``/``processor`` objects to run fully offline (any
    ``*ForCTC`` + processor pair); otherwise they are fetched by name.
    """

    def __init__(self, model_name: str = "facebook/wav2vec2-base-960h",
                 device: str = "cpu", model=None, processor=None):
        if model is None or processor is None:
            from transformers import AutoModelForCTC, AutoProcessor

            processor = processor or AutoProcessor.from_pretrained(
                model_name)
            model = model or AutoModelForCTC.from_pretrained(model_name)
        self.processor = processor
        self.model = model.to(device)
        self.device = device

    def transcribe(self, audio: np.ndarray, rate: int) -> str:
        import torch

        if rate != 16000:
            audio = resample_poly_audio(audio, rate, 16000)
        inputs = self.processor(audio, sampling_rate=16000,
                                return_tensors="pt")
        with torch.no_grad():
            logits = self.model(
                inputs.input_values.to(self.device)).logits
        ids = logits.argmax(-1)[0]
        return self.processor.decode(ids).lower()


def _normalize(text: str) -> str:
    return remove_punctuation(ascii_transliterate(text)).lower()


def evaluate(testset, audio_directory: str,
             asr: Optional[object] = None) -> float:
    """Transcribe ``example_output_{i}.wav`` for each test utterance and log
    corpus WER (reference ``asr_evaluation.py:12-32``)."""
    if asr is None:
        asr = DeepSpeechASR()
    predictions: List[str] = []
    targets: List[str] = []
    for i in range(len(testset)):
        datapoint = testset[i]
        audio, rate = read_audio(
            os.path.join(audio_directory, f"example_output_{i}.wav"))
        predictions.append(asr.transcribe(audio, rate))
        targets.append(ascii_transliterate(datapoint["text"]))
    targets = [_normalize(t) for t in targets]
    predictions = [_normalize(p) for p in predictions]
    logging.info(f"targets: {targets}")
    logging.info(f"predictions: {predictions}")
    result = wer(targets, predictions)
    logging.info(f"wer: {result}")
    return result
