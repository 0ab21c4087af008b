"""Evaluation harness: ensembling, wav dumping, ASR plumbing, utilities."""

import os

import numpy as np
import pytest

import jax

from silent_speech_tpu.config import Config
from silent_speech_tpu.data.dataset import EMGDataset
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.dsp.audio_utils import (
    normalize_volume, splice_audio, frame_rms,
)
from silent_speech_tpu.eval.synthesis import EnsemblePredictor, save_output
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.train.transduction import TransductionTrainer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_eval"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=7)


@pytest.fixture(scope="module")
def trainers(corpus):
    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.data.fixed_shapes = False
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainset = EMGDataset(corpus, dev=False, test=False)
    out = []
    for seed in (0, 1):
        t = TransductionTrainer(cfg, mesh=mesh)
        batch = t._pack([trainset[0], trainset[1]])
        t.init_state(batch, seed=seed)
        out.append(t)
    return out


@pytest.mark.slow  # full train-step / heavy compile
def test_ensemble_of_one_matches_single(corpus, trainers):
    devset = EMGDataset(corpus, dev=True)
    single = trainers[0].evaluate(devset)
    ens = EnsemblePredictor([trainers[0]]).evaluate(devset)
    assert ens[0] == pytest.approx(single[0], rel=1e-4)
    assert ens[1] == pytest.approx(single[1], abs=1e-9)


@pytest.mark.slow  # full train-step / heavy compile
def test_ensemble_of_two_runs_and_averages(corpus, trainers):
    devset = EMGDataset(corpus, dev=True)
    ens = EnsemblePredictor(trainers)
    loss, acc, conf = ens.evaluate(devset)
    assert np.isfinite(loss)
    assert conf.shape == (48, 48)
    ex = devset[0]
    p0 = trainers[0].predict(ex)
    p1 = trainers[1].predict(ex)
    pe = ens.predict(ex)
    np.testing.assert_allclose(pe, (p0 + p1) / 2, atol=1e-5)


@pytest.mark.slow  # full train-step / heavy compile
def test_save_output_writes_wav(corpus, trainers, tmp_path):
    devset = EMGDataset(corpus, dev=True)

    class FakeVocoder:
        def __call__(self, mel):
            return np.zeros(mel.shape[0] * 256, dtype=np.float32)

    path = str(tmp_path / "out.wav")
    audio = save_output(trainers[0], devset[0], path, devset.mfcc_norm,
                        FakeVocoder())
    assert os.path.exists(path)
    assert audio.shape[0] == devset[0]["emg"].shape[0] * 256


def test_normalize_volume():
    t = np.arange(22050) / 22050
    loud = 0.8 * np.sin(2 * np.pi * 200 * t)
    out = normalize_volume(loud)
    # reference semantics: scale = 0.2 / (max_frame_rms + 0.01)
    assert frame_rms(out).max() == pytest.approx(0.2, rel=0.1)
    assert np.abs(out).max() <= 1.0
    # very quiet input: the +0.01 floor limits the boost (reference quirk)
    quiet = 0.001 * np.sin(2 * np.pi * 200 * t)
    out_q = normalize_volume(quiet)
    assert frame_rms(out_q).max() < 0.05


def test_splice_audio_crossfade():
    a = np.ones(100)
    b = np.ones(100)
    out = splice_audio([a, b], overlap=20)
    assert out.shape[0] == 180
    # crossfaded interior stays ~1 (ramps sum to 1)
    np.testing.assert_allclose(out[30:150], 1.0, atol=0.06)
    # edges fade (reference fades the result's ends too)
    assert out[0] == 0.0 and out[-1] == 0.0


def test_asr_interface_gating():
    from silent_speech_tpu.eval.asr import DeepSpeechASR

    with pytest.raises(ImportError):
        DeepSpeechASR()


@pytest.mark.slow  # full train-step / heavy compile
def test_transformers_asr_end_to_end(tmp_path):
    """Run the full ASR-judge path (TransformersASR.transcribe +
    evaluate()) against a tiny randomly-initialized wav2vec2 built
    offline — exercises resampling, CTC decode, normalization, and the
    corpus-WER driver (reference ``asr_evaluation.py:12-32``)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import json

    from silent_speech_tpu.eval.asr import TransformersASR, evaluate
    from silent_speech_tpu.utils.audio_io import write_wav

    vocab = {c: i for i, c in enumerate(
        ["<pad>", "<s>", "</s>", "<unk>", "|"]
        + [chr(ord("a") + i) for i in range(26)])}
    vocab_file = tmp_path / "vocab.json"
    vocab_file.write_text(json.dumps(vocab))
    tok = transformers.Wav2Vec2CTCTokenizer(
        str(vocab_file), pad_token="<pad>", word_delimiter_token="|")
    fe = transformers.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)
    processor = transformers.Wav2Vec2Processor(feature_extractor=fe,
                                               tokenizer=tok)
    cfg = transformers.Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_feat_extract_layers=2)
    torch.manual_seed(0)
    model = transformers.Wav2Vec2ForCTC(cfg).eval()

    asr = TransformersASR(model=model, processor=processor)
    rng = np.random.default_rng(0)
    text = asr.transcribe(rng.normal(size=16000).astype(np.float32) * 0.1,
                          16000)
    assert isinstance(text, str)
    # resample path (22.05 kHz input)
    text2 = asr.transcribe(
        rng.normal(size=22050).astype(np.float32) * 0.1, 22050)
    assert isinstance(text2, str)

    testset = [{"text": "hello world"}, {"text": "second utterance"}]
    for i in range(len(testset)):
        write_wav(str(tmp_path / f"example_output_{i}.wav"),
                  (rng.normal(size=8000) * 0.1).astype(np.float32), 16000)
    w = evaluate(testset, str(tmp_path), asr=asr)
    assert 0.0 <= w  # random model: garbage transcripts, valid WER
