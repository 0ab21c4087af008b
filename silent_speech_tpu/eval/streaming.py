"""Streaming EMG→text recognition — the serving-path surface.

The reference is strictly offline: ``recognition_model.py:30-58`` decodes
utterances after a session is recorded to disk. This module adds a
low-latency live surface with the EXACT offline featurization semantics:
raw 1 kHz capture chunks stream in, and after every ``hop_s`` seconds of
new signal the accumulated window is re-featurized and the running greedy
transcript recomputed.

Why recompute instead of filtering causally: the pipeline's zero-phase
filters (``dsp.filters.clean_emg``) and centered feature frames are
non-causal — a causal approximation would change the numbers the model
was trained on. Re-running the pipeline on the growing buffer keeps the
streamed output identical to the offline pipeline over the same samples
(tested), at O(T) work per hop. ``max_window_s`` bounds the buffer (old
samples fall off the front — the packed 200-frame training window means
the encoder never learned longer context anyway).

Run a live demo against the synthetic capture board:
    python -m silent_speech_tpu.eval.streaming --seconds 6
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..data.dataset import CAPTURE_RATE, FEAT_RATE, RAW_RATE
from ..dsp.emg_features import get_emg_features
from ..dsp.filters import clean_emg
from ..dsp.resample import subsample
from .decode import greedy_ctc_decode


def featurize_raw_window(x: np.ndarray, emg_norm=None,
                         session_index: int = 0,
                         remove_channels=()) -> Optional[dict]:
    """One raw 1 kHz capture window ``(n, 8)`` → a model example dict
    (``emg``, ``raw_emg``, ``session_ids``) with the exact
    ``dataset.load_utterance`` + ``_load_normalized`` semantics
    (``read_emg.py:52-100`` path, minus the audio-length cap — there is
    no parallel audio in a live stream). Returns None while the window
    is too short to produce a feature frame."""
    x = clean_emg(np.asarray(x, np.float64), fs=CAPTURE_RATE)
    emg_orig = subsample(x, RAW_RATE, CAPTURE_RATE)
    emg = subsample(x, FEAT_RATE, CAPTURE_RATE)
    for c in remove_channels:
        emg[:, int(c)] = 0
        emg_orig[:, int(c)] = 0
    if emg.shape[0] < 32:  # not enough 516.79 Hz samples for one frame
        return None
    feats = get_emg_features(emg)
    n = feats.shape[0]
    # hop-exact trims, then soft clip / normalize as the dataset does
    emg_model = emg_orig[8: 8 + 8 * n]
    if emg_model.shape[0] < 8 * n:
        n = emg_model.shape[0] // 8
        if n == 0:
            return None
        feats = feats[:n]
        emg_model = emg_model[: 8 * n]
    raw = emg_model / 20.0
    raw = 50.0 * np.tanh(raw / 50.0)
    if emg_norm is not None:
        feats = emg_norm.normalize(feats)
        feats = 8.0 * np.tanh(feats / 8.0)
    return {
        "emg": feats.astype(np.float32),
        "raw_emg": raw.astype(np.float32),
        "session_ids": np.full(n, session_index, dtype=np.int64),
    }


class StreamingRecognizer:
    """Feed raw capture chunks; read back the running transcript.

    ``trainer`` is an initialized ``RecognitionTrainer`` (its padded solo
    forward + greedy CTC decode are reused unchanged, so the streamed
    transcript matches ``trainer.decode(example, beam=False)`` on the
    same samples).
    """

    def __init__(self, trainer, emg_norm=None, session_index: int = 0,
                 hop_s: float = 0.25, max_window_s: float = 20.0,
                 remove_channels=()):
        assert trainer.state is not None, "trainer not initialized"
        self.trainer = trainer
        self.emg_norm = emg_norm
        self.session_index = session_index
        self.hop = int(hop_s * CAPTURE_RATE)
        self.max_window = int(max_window_s * CAPTURE_RATE)
        self.remove_channels = tuple(remove_channels)
        self._buf = np.zeros((0, 8), np.float64)
        self._since_decode = 0
        self._text = ""

    def feed(self, samples: np.ndarray) -> None:
        """Append ``(n, 8)`` raw 1 kHz samples to the stream."""
        samples = np.atleast_2d(np.asarray(samples, np.float64))
        self._buf = np.concatenate([self._buf, samples], axis=0)
        if self._buf.shape[0] > self.max_window:
            self._buf = self._buf[-self.max_window:]
        self._since_decode += samples.shape[0]

    @property
    def buffered_samples(self) -> int:
        return self._buf.shape[0]

    def transcript(self, force: bool = False) -> str:
        """The running greedy transcript; recomputed when ≥ one hop of
        new samples arrived since the last decode (or ``force``)."""
        if self._since_decode >= self.hop or force:
            self._since_decode = 0
            ex = featurize_raw_window(
                self._buf, self.emg_norm, self.session_index,
                self.remove_channels)
            if ex is not None:
                lp = self.trainer.predict_logits(ex)
                ids = greedy_ctc_decode(lp, self.trainer.blank_id)
                self._text = self.trainer.text_transform.int_to_text(ids)
        return self._text


class StreamingSynthesizer:
    """Live EMG→speech: the transduction twin of ``StreamingRecognizer``.

    Feed raw capture chunks; ``audio()`` returns the vocoded waveform of
    the buffered window (predicted normalized mel → ``mfcc_norm`` inverse
    → HiFi-GAN), recomputed per hop with the same recompute-from-buffer
    exactness contract. ``trainer`` is an initialized
    ``TransductionTrainer``; ``vocoder`` maps (T, 80) mel → 22.05 kHz
    audio (``models.hifigan.Vocoder``)."""

    def __init__(self, trainer, mfcc_norm, vocoder, emg_norm=None,
                 session_index: int = 0, hop_s: float = 0.25,
                 max_window_s: float = 20.0, remove_channels=()):
        assert trainer.state is not None, "trainer not initialized"
        self.trainer = trainer
        self.mfcc_norm = mfcc_norm
        self.vocoder = vocoder
        self.emg_norm = emg_norm
        self.session_index = session_index
        self.hop = int(hop_s * CAPTURE_RATE)
        self.max_window = int(max_window_s * CAPTURE_RATE)
        self.remove_channels = tuple(remove_channels)
        self._buf = np.zeros((0, 8), np.float64)
        self._since_decode = 0
        self._audio = np.zeros(0, np.float32)

    feed = StreamingRecognizer.feed
    buffered_samples = StreamingRecognizer.buffered_samples

    def audio(self, force: bool = False) -> np.ndarray:
        """22.05 kHz waveform for the buffered window; recomputed when
        ≥ one hop of new samples arrived (or ``force``)."""
        if self._since_decode >= self.hop or force:
            self._since_decode = 0
            ex = featurize_raw_window(
                self._buf, self.emg_norm, self.session_index,
                self.remove_channels)
            if ex is not None:
                mel = self.mfcc_norm.inverse(self.trainer.predict(ex))
                self._audio = np.asarray(self.vocoder(mel),
                                         np.float32).reshape(-1)
        return self._audio


def _demo(seconds: float, hop_s: float, model_path: str = "") -> None:
    """Live demo: synthetic board → streaming recognizer (random-weight
    tiny model unless ``model_path`` is a reference-format model.pt)."""
    import time

    import jax

    from ..capture.recorder import SyntheticBoard
    from ..config import Config
    from ..parallel.mesh import make_mesh
    from ..train.recognition import RecognitionTrainer

    cfg = Config()
    if model_path:
        cfg.recognition.start_training_from = model_path
    else:
        cfg.model.model_size = 64
        cfg.model.num_layers = 2
        cfg.model.dim_feedforward = 128
        cfg.model.dropout = 0.0
        cfg.model.compute_dtype = "float32"
    trainer = RecognitionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    rng = np.random.default_rng(0)
    warm = featurize_raw_window(rng.normal(size=(2000, 8)))
    n = warm["emg"].shape[0]
    trainer.init_state(trainer._pack([{
        **warm, "text_int": np.array([1, 2], np.int64), "silent": False,
        "text": "hi", "phonemes": np.zeros(n, np.int64)}]), seed=0)

    board = SyntheticBoard()
    stream = StreamingRecognizer(trainer, hop_s=hop_s)
    board.start_stream()
    t0 = time.monotonic()
    try:
        while time.monotonic() - t0 < seconds:
            time.sleep(hop_s / 2)
            data = board.get_board_data()
            if data.shape[1]:
                stream.feed(data[:8].T)
            text = stream.transcript()
            print(f"\r[{stream.buffered_samples / 1000.0:6.2f}s] "
                  f"{text!r}", end="", flush=True)
    finally:
        board.stop_stream()
    print()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--hop_s", type=float, default=0.5)
    ap.add_argument("--model", default="")
    a = ap.parse_args()
    _demo(a.seconds, a.hop_s, a.model)
