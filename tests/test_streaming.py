"""Streaming recognizer: chunking-invariance vs the offline pipeline."""

import numpy as np
import pytest

import jax

from silent_speech_tpu.config import Config
from silent_speech_tpu.eval.decode import greedy_ctc_decode
from silent_speech_tpu.eval.streaming import (
    StreamingRecognizer, featurize_raw_window,
)
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.train.recognition import RecognitionTrainer


@pytest.fixture(scope="module")
def trainer():
    cfg = Config()
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    tr = RecognitionTrainer(cfg, mesh=make_mesh(1, 1,
                                                devices=jax.devices()[:1]))
    warm = featurize_raw_window(
        np.random.default_rng(0).normal(size=(2000, 8)))
    n = warm["emg"].shape[0]
    tr.init_state(tr._pack([{
        **warm, "text_int": np.array([1, 2], np.int64), "silent": False,
        "text": "hi", "phonemes": np.zeros(n, np.int64)}]), seed=0)
    return tr


def test_featurize_matches_dataset_semantics():
    """The streaming featurizer must produce the dataset's model-input
    schema: 112-dim features, 8-per-frame raw trim, soft clips."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3000, 8)) * 30
    ex = featurize_raw_window(x)
    n = ex["emg"].shape[0]
    assert ex["emg"].shape == (n, 112)
    assert ex["raw_emg"].shape == (8 * n, 8)
    assert ex["session_ids"].shape == (n,)
    assert np.abs(ex["raw_emg"]).max() < 50.0  # soft-clipped
    # too-short windows produce None, never a crash
    assert featurize_raw_window(x[:40]) is None


def test_streamed_transcript_matches_offline(trainer):
    """Feeding the same samples in uneven chunks must yield exactly the
    offline decode of the full window (recompute-from-buffer design)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4000, 8)) * 30

    stream = StreamingRecognizer(trainer, hop_s=0.25, max_window_s=30.0)
    pos = 0
    while pos < len(x):
        n = int(rng.uniform(50, 700))
        stream.feed(x[pos: pos + n])
        stream.transcript()  # exercise mid-stream decodes
        pos += n
    streamed = stream.transcript(force=True)

    ex = featurize_raw_window(x)
    lp = trainer.predict_logits(ex)
    offline = trainer.text_transform.int_to_text(
        greedy_ctc_decode(lp, trainer.blank_id))
    assert streamed == offline


def test_window_bound(trainer):
    stream = StreamingRecognizer(trainer, hop_s=0.25, max_window_s=2.0)
    stream.feed(np.zeros((5000, 8)))
    assert stream.buffered_samples == 2000
    stream.transcript(force=True)  # decodes the bounded window
