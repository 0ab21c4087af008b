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

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas



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


def test_streaming_synthesizer_matches_offline(tmp_path):
    from silent_speech_tpu.data.normalizers import FeatureNormalizer
    from silent_speech_tpu.eval.streaming import StreamingSynthesizer
    from silent_speech_tpu.models.hifigan import HiFiGANConfig, Vocoder
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from hifigan_util import write_tiny_checkpoint

    cfg = Config()
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    tr = TransductionTrainer(cfg, mesh=make_mesh(1, 1,
                                                 devices=jax.devices()[:1]))
    rng = np.random.default_rng(3)
    warm = featurize_raw_window(rng.normal(size=(2000, 8)))
    n = warm["emg"].shape[0]
    tr.init_state(tr._pack([{
        **warm, "silent": False, "text": "hi",
        "text_int": np.array([1, 2], np.int64),
        "phonemes": np.zeros(n, np.int64),
        "audio_features": np.zeros((n, 80), np.float32)}]), seed=0)

    hcfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),))
    voc = Vocoder(write_tiny_checkpoint(str(tmp_path / "voc"), hcfg))
    mfcc_norm = FeatureNormalizer(
        [np.random.default_rng(4).normal(size=(50, 80))])

    x = rng.normal(size=(3500, 8)) * 30
    stream = StreamingSynthesizer(tr, mfcc_norm, voc, hop_s=0.25)
    pos = 0
    while pos < len(x):
        k = int(rng.uniform(100, 900))
        stream.feed(x[pos: pos + k])
        stream.audio()
        pos += k
    streamed = stream.audio(force=True)

    ex = featurize_raw_window(x)
    offline = np.asarray(
        voc(mfcc_norm.inverse(tr.predict(ex))), np.float32).reshape(-1)
    np.testing.assert_allclose(streamed, offline, rtol=1e-5, atol=1e-5)
