"""On-device corpus featurization vs the host EMGDataset path.

The cache build featurizes with batched masked device DSP kernels
(data/jax_featurize.py); these tests pin the integrated path to the host
``EMGDataset.__getitem__`` featurization on a real synthetic corpus:
identical integer metadata (lengths, trims, pairing) and close signal
values (float32 device cascades vs float64 host scipy), plus
bit-level equivalence of the resulting DeviceCorpus layouts.
"""

import numpy as np
import pytest

from silent_speech_tpu.data.dataset import EMGDataset
from silent_speech_tpu.data.device_cache import DeviceCorpus
from silent_speech_tpu.data.jax_featurize import (
    build_device_corpus, featurize_on_device, mel_frames_len,
    subsample_len)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from silent_speech_tpu.data.synthetic import generate_corpus

    root = str(tmp_path_factory.mktemp("corpus_devfeat"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=21)


@pytest.fixture(scope="module")
def dataset(corpus):
    return EMGDataset(corpus, dev=False, test=False, limit_length=True)


def test_length_arithmetic_matches_host():
    from silent_speech_tpu.dsp.resample import subsample
    from silent_speech_tpu.dsp.mel import log_mel_spectrogram

    rng = np.random.default_rng(0)
    for n in (777, 1000, 1503, 2048, 4001):
        sig = rng.normal(size=(n, 2))
        assert subsample_len(n, 516.79) == subsample(sig, 516.79,
                                                     1000.0).shape[0]
        assert subsample_len(n, 689.06) == subsample(sig, 689.06,
                                                     1000.0).shape[0]
    for n in (25600, 44100, 100001):
        audio = rng.normal(size=n) * 0.1
        assert mel_frames_len(n) == log_mel_spectrogram(audio).shape[0]


@pytest.mark.slow  # full train-step / heavy compile
def test_examples_match_host_path(dataset):
    got = featurize_on_device(dataset)
    assert len(got) == len(dataset)
    for i in range(len(dataset)):
        want = dataset[i]
        g = got[i]
        # integer/metadata parity is EXACT
        assert g["raw_emg"].shape == want["raw_emg"].shape, i
        assert g["audio_features"].shape == want["audio_features"].shape
        assert g["silent"] == want["silent"]
        assert g["text"] == want["text"]
        np.testing.assert_array_equal(g["text_int"], want["text_int"])
        np.testing.assert_array_equal(g["session_ids"],
                                      want["session_ids"])
        np.testing.assert_array_equal(g["phonemes"], want["phonemes"])
        assert g["audio_file"] == want["audio_file"]
        if want["silent"]:
            assert (g["parallel_voiced_audio_features"].shape
                    == want["parallel_voiced_audio_features"].shape)
        # signal parity: f32 device cascade vs f64 host scipy
        np.testing.assert_allclose(g["raw_emg"], want["raw_emg"],
                                   atol=5e-2)
        corr = np.corrcoef(g["raw_emg"].ravel(),
                           want["raw_emg"].ravel())[0, 1]
        assert corr > 0.999, (i, corr)
        np.testing.assert_allclose(g["audio_features"],
                                   want["audio_features"], atol=2e-2)
        if want["silent"]:
            np.testing.assert_allclose(
                g["parallel_voiced_audio_features"],
                want["parallel_voiced_audio_features"], atol=2e-2)


@pytest.mark.slow  # full train-step / heavy compile
def test_device_corpus_from_jax_pipeline(dataset):
    """build_device_corpus('jax') yields the same corpus layout as the
    host path; arrays agree within the float32 pipeline tolerance."""
    jax_corpus = build_device_corpus(dataset, featurize="jax")
    host_corpus = DeviceCorpus.build(
        [dataset[i] for i in range(len(dataset))])

    assert jax_corpus.num_examples == host_corpus.num_examples
    np.testing.assert_array_equal(jax_corpus.feat_len_host,
                                  host_corpus.feat_len_host)
    np.testing.assert_array_equal(jax_corpus.tgt_len_host,
                                  host_corpus.tgt_len_host)
    np.testing.assert_array_equal(jax_corpus.text_len_host,
                                  host_corpus.text_len_host)
    np.testing.assert_array_equal(jax_corpus.silent_mask,
                                  host_corpus.silent_mask)
    a, b = jax_corpus.arrays, host_corpus.arrays
    np.testing.assert_array_equal(np.asarray(a.text_flat),
                                  np.asarray(b.text_flat))
    np.testing.assert_array_equal(np.asarray(a.phon_flat),
                                  np.asarray(b.phon_flat))
    np.testing.assert_allclose(np.asarray(a.raw_frames),
                               np.asarray(b.raw_frames), atol=5e-2)
    np.testing.assert_allclose(np.asarray(a.tgt_flat),
                               np.asarray(b.tgt_flat), atol=2e-2)


@pytest.mark.slow  # full train-step / heavy compile
def test_training_step_on_jax_featurized_corpus(corpus, dataset):
    """End-to-end: a transduction cache step over the device-featurized
    corpus runs and matches the host-featurized corpus loss closely."""
    import jax

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.model.shift_augment = False
    cfg.data.t_cap = 256
    cfg.data.utt_cap = 8
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    examples = [dataset[i] for i in range(min(4, len(dataset)))]
    trainer.init_state(trainer._pack(examples), seed=0)

    losses = []
    for feat in ("jax", "host"):
        trainer.init_state(trainer._pack(examples), seed=0)
        c = build_device_corpus(dataset, featurize=feat)
        m = trainer.cache_scan_ids(
            c, [list(range(min(4, len(dataset))))],
            jax.random.PRNGKey(0), [1e-4])
        assert m is not None
        losses.append(float(np.asarray(m["loss"])[-1]))
    assert losses[0] == pytest.approx(losses[1], rel=2e-3)
