"""Learnable synthetic-corpus mode (data/synthetic.py learnable=True).

The head-to-head harness (tools/headtohead.py) needs a corpus where
dev-set generalization is possible: EMG burst amplitudes and audio
harmonics must deterministically encode the character sequence. These
tests pin that property without any model training.
"""

import numpy as np
import pytest

from silent_speech_tpu.data.synthetic import (
    _synth_audio_learnable, _synth_emg_learnable, generate_corpus)


def _frame_rms(x, w=50):
    t = x.shape[0] // w * w
    return np.sqrt((x[:t].reshape(-1, w, x.shape[1]) ** 2).mean(1))


def test_same_text_emg_is_correlated_different_is_not():
    rng = np.random.default_rng(0)
    a1 = _synth_emg_learnable(rng, 1.5, "hello world")
    a2 = _synth_emg_learnable(rng, 1.5, "hello world")
    b = _synth_emg_learnable(rng, 1.5, "zzz qqq xxx")
    c_same = np.corrcoef(_frame_rms(a1).ravel(),
                         _frame_rms(a2).ravel())[0, 1]
    c_diff = np.corrcoef(_frame_rms(a1).ravel(),
                         _frame_rms(b).ravel())[0, 1]
    assert c_same > 0.6, c_same
    assert c_diff < 0.5, c_diff
    assert a1.shape == (1500, 8)


def test_learnable_audio_encodes_text():
    rng = np.random.default_rng(0)
    a1 = _synth_audio_learnable(rng, 1.0, "abc abc")
    a2 = _synth_audio_learnable(rng, 1.0, "abc abc")
    b = _synth_audio_learnable(rng, 1.0, "xyz xyz")
    # compare magnitude spectra of aligned halves (phase is rng-free here
    # but noise differs)
    f1 = np.abs(np.fft.rfft(a1[:11025]))
    f2 = np.abs(np.fft.rfft(a2[:11025]))
    fb = np.abs(np.fft.rfft(b[:11025]))
    c_same = np.corrcoef(f1, f2)[0, 1]
    c_diff = np.corrcoef(f1, fb)[0, 1]
    assert c_same > 0.95, c_same
    assert c_diff < c_same, (c_diff, c_same)
    silent = _synth_audio_learnable(rng, 1.0, "abc", voiced=False)
    assert np.abs(silent).max() < 0.01


def test_learnable_corpus_loads_through_dataset(tmp_path):
    from silent_speech_tpu.data.dataset import EMGDataset

    cfg = generate_corpus(str(tmp_path / "c"), n_voiced_sessions=1,
                          n_silent_sessions=1, utterances_per_session=4,
                          seed=7, learnable=True)
    ds = EMGDataset(cfg, dev=False, test=False)
    assert len(ds) >= 4
    e = ds[0]
    assert e["emg"].shape[1] == 112
    assert e["raw_emg"].shape[0] == e["emg"].shape[0] * 8
    # features must carry text information: framewise feature variance
    # across the utterance should be far from constant (the per-char
    # envelope switches patterns)
    ch_energy = np.abs(np.asarray(e["emg"], np.float32)).mean(axis=1)
    assert ch_energy.std() > 0
