import numpy as np
import pytest

import jax.numpy as jnp

from silent_speech_tpu.dsp import (
    mel_filterbank, log_mel_spectrogram, MelConfig,
    double_average, get_emg_features, subsample,
)
from silent_speech_tpu.dsp.mel import (
    hann_window, jax_log_mel_spectrogram, stft_magnitude,
)
from silent_speech_tpu.dsp.emg_features import jax_get_emg_features
from silent_speech_tpu.dsp.filters import clean_emg, notch, remove_drift


def test_hann_window_periodic():
    import torch
    w = hann_window(1024)
    tw = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, tw, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # each filter has some support; triangles overlap neighbours
    assert (fb.sum(axis=1) > 0).all()
    # no energy above fmax bin
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs > 8000.0 + 50].sum() == 0


def test_log_mel_matches_torch_stft_reference():
    """Golden test against the reference's torch.stft pipeline
    (data_utils.py:39-62) re-run here with torch on CPU."""
    import torch

    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.8, 0.8, size=22050).astype(np.float32)

    # torch reference computation (HiFi-GAN mel, center=False)
    y = torch.tensor(audio).unsqueeze(0)
    n_fft, hop, win = 1024, 256, 1024
    pad = int((n_fft - hop) / 2)
    yp = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode='reflect')
    yp = yp.squeeze(1)
    spec = torch.stft(yp, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      normalized=False, onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    mag = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.tensor(mel_filterbank(22050, n_fft, 80, 0, 8000))
    mel = torch.matmul(fb, mag.squeeze(0))
    ref = torch.log(torch.clamp(mel, min=1e-5)).numpy().T  # (T, 80)

    ours = log_mel_spectrogram(audio, MelConfig())
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_jax_log_mel_matches_numpy():
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, size=11025).astype(np.float32)
    np_mel = log_mel_spectrogram(audio)
    jx_mel = np.asarray(jax_log_mel_spectrogram(jnp.asarray(audio)))
    assert np_mel.shape == jx_mel.shape
    # numpy path runs in float64, JAX path in float32 → small log-domain gaps
    np.testing.assert_allclose(np_mel, jx_mel, atol=2e-2)


def test_mel_frame_count():
    # hop-multiple length input → len/hop frames (matches reference framing)
    audio = np.zeros(256 * 40, dtype=np.float32)
    mel = log_mel_spectrogram(audio)
    assert mel.shape == (40, 80)
    # silence → log floor
    np.testing.assert_allclose(mel, np.log(1e-5), atol=1e-3)


def test_double_average():
    x = np.ones(100)
    w = double_average(x)
    # interior of a double moving average over ones is still ~1
    np.testing.assert_allclose(w[20:80], 1.0, atol=1e-12)
    # matches explicit two-pass convolution
    f = np.ones(9) / 9
    expected = np.convolve(np.convolve(x, f, 'same'), f, 'same')
    np.testing.assert_allclose(w, expected)


def test_emg_features_shape_and_order():
    rng = np.random.default_rng(2)
    emg = rng.normal(size=(1000, 8))
    feats = get_emg_features(emg)
    n_frames = 1 + (1000 - 16) // 6
    assert feats.shape == (n_frames, 112)
    assert feats.dtype == np.float32
    # channel blocks: [5 scalar feats, 9 stft bins] x 8
    # zero a channel -> its block becomes deterministic
    emg2 = emg.copy()
    emg2[:, 3] = 0.0
    feats2 = get_emg_features(emg2)
    block = feats2[:, 3 * 14: 4 * 14]
    np.testing.assert_allclose(block[:, :3], 0.0, atol=1e-12)  # means/rms
    # other channel blocks unchanged
    np.testing.assert_allclose(feats2[:, :3 * 14], feats[:, :3 * 14],
                               atol=1e-5)


def test_emg_features_zcr_range():
    rng = np.random.default_rng(3)
    emg = rng.normal(size=(500, 8))
    feats = get_emg_features(emg)
    zcr = feats[:, 3::14]  # z_p is the 4th scalar feature of each channel
    assert (zcr >= 0).all() and (zcr <= 1).all()
    assert zcr.std() > 0  # non-degenerate


def test_jax_emg_features_match_numpy():
    rng = np.random.default_rng(4)
    emg = rng.normal(size=(700, 8))
    np_feats = get_emg_features(emg)
    jx_feats = np.asarray(jax_get_emg_features(jnp.asarray(emg)))
    assert np_feats.shape == jx_feats.shape
    # float32 on-device vs float64 host accumulation
    np.testing.assert_allclose(np_feats, jx_feats, atol=1e-2)


def test_subsample_matches_reference_semantics():
    rng = np.random.default_rng(5)
    sig = rng.normal(size=(1000, 3))
    out = subsample(sig, 516.79, 1000.0)
    # per-channel np.interp equivalence
    times = np.arange(1000) / 1000.0
    sample_times = np.arange(0, times[-1], 1 / 516.79)
    for c in range(3):
        np.testing.assert_allclose(out[:, c],
                                   np.interp(sample_times, times, sig[:, c]))
    assert out.shape[0] == len(sample_times)


def test_filters_attenuate_targets():
    fs = 1000.0
    t = np.arange(2000) / fs
    hum = np.sin(2 * np.pi * 60 * t)
    drift = 0.5 * np.sin(2 * np.pi * 0.3 * t)
    signal = np.sin(2 * np.pi * 25 * t)
    x = (signal + hum + drift)[:, None]
    cleaned = clean_emg(x, fs)[:, 0]
    # 60 Hz and drift strongly attenuated, 25 Hz band preserved
    spec = np.abs(np.fft.rfft(cleaned[500:1500]))
    freqs = np.fft.rfftfreq(1000, 1 / fs)
    p60 = spec[np.argmin(np.abs(freqs - 60))]
    p25 = spec[np.argmin(np.abs(freqs - 25))]
    pdrift = spec[np.argmin(np.abs(freqs - 0.3))]
    assert p60 < 0.05 * p25
    assert pdrift < 0.05 * p25
    assert p25 > 100  # signal retained


def test_filtfilt_zero_phase():
    # zero-phase: a pure in-band sine keeps its phase after remove_drift
    fs = 1000.0
    t = np.arange(4000) / fs
    x = np.sin(2 * np.pi * 50 * t)[:, None]
    y = remove_drift(x, fs)[:, 0]
    mid = slice(1000, 3000)
    corr = np.corrcoef(x[mid, 0], y[mid])[0, 1]
    assert corr > 0.9999
