"""On-device featurization pipeline vs the host (scipy/numpy) path."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from silent_speech_tpu.dsp.jax_filters import jax_filtfilt, jax_lfilter, \
    lfilter_zi
from silent_speech_tpu.dsp.jax_pipeline import (
    featurize_utterance_jax, jax_clean_emg, jax_subsample,
)
from silent_speech_tpu.dsp.filters import clean_emg
from silent_speech_tpu.dsp.resample import subsample
from silent_speech_tpu.dsp.emg_features import get_emg_features


def test_lfilter_zi_matches_scipy():
    b, a = scipy.signal.butter(3, 0.2)
    np.testing.assert_allclose(lfilter_zi(b, a),
                               scipy.signal.lfilter_zi(b, a), atol=1e-10)


def test_jax_lfilter_matches_scipy():
    rng = np.random.default_rng(0)
    b, a = scipy.signal.butter(3, 0.15)
    x = rng.normal(size=(300, 2))
    zi = np.stack([scipy.signal.lfilter_zi(b, a)] * 2, axis=1) * 0.0
    got = np.asarray(jax_lfilter(b, a, jnp.asarray(x), jnp.asarray(zi)))
    expected, _ = scipy.signal.lfilter(
        b, a, x, axis=0, zi=np.zeros((len(a) - 1, 2)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("design", ["butter", "notch"])
def test_jax_filtfilt_matches_scipy(design):
    rng = np.random.default_rng(1)
    if design == "butter":
        b, a = scipy.signal.butter(3, 2, "highpass", fs=1000)
    else:
        b, a = scipy.signal.iirnotch(60, 30, 1000)
    x = rng.normal(size=(800, 3))
    got = np.asarray(jax_filtfilt(b, a, jnp.asarray(x)))
    expected = scipy.signal.filtfilt(b, a, x, axis=0)
    # float32 recursive IIR accumulation vs scipy float64: small absolute
    # drift is expected (highpass filters are ill-conditioned near DC)
    np.testing.assert_allclose(got, expected, atol=5e-2)
    assert np.corrcoef(got.ravel(), expected.ravel())[0, 1] > 0.9999


def test_jax_clean_emg_matches_host():
    rng = np.random.default_rng(2)
    t = np.arange(1500) / 1000
    x = (rng.normal(size=(1500, 4))
         + 5 * np.sin(2 * np.pi * 60 * t)[:, None])
    got = np.asarray(jax_clean_emg(jnp.asarray(x, jnp.float32)))
    expected = clean_emg(x)
    # float32 scan vs float64 filtfilt over 8 cascaded filters
    np.testing.assert_allclose(got, expected, atol=5e-2)


def test_jax_subsample_matches_numpy():
    rng = np.random.default_rng(3)
    sig = rng.normal(size=(1000, 2))
    for rate in (689.06, 516.79):
        got = np.asarray(jax_subsample(jnp.asarray(sig), rate, 1000.0))
        expected = subsample(sig, rate, 1000.0)
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, atol=5e-4)  # f32 interp


def test_full_jax_featurization_close_to_host():
    rng = np.random.default_rng(4)
    t = np.arange(2000) / 1000
    raw = 30 * rng.normal(size=(2000, 8)) \
        + 5 * np.sin(2 * np.pi * 60 * t)[:, None]
    audio = (0.3 * np.sin(2 * np.pi * 220 * np.arange(44100) / 22050)) \
        .astype(np.float32)

    raw_out, feats, mel = featurize_utterance_jax(
        jnp.asarray(raw, jnp.float32), jnp.asarray(audio))

    # host reference: clean → resample → features
    x = clean_emg(raw)
    emg = subsample(x, 516.79, 1000.0)
    host_feats = get_emg_features(emg)
    n = min(feats.shape[0], host_feats.shape[0])
    # correlation check (float32 cascades drift absolute values slightly)
    a = np.asarray(feats)[:n].ravel()
    b = host_feats[:n].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.999, corr
    assert raw_out.shape == (8 * feats.shape[0], 8)
    assert mel.shape[1] == 80
