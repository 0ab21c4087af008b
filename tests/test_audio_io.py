import os

import numpy as np
import pytest

from silent_speech_tpu.utils import audio_io
from silent_speech_tpu.utils import flac as flac_mod


def _sine(n=22050, sr=22050, freq=440.0):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_wav_roundtrip(tmp_path):
    path = str(tmp_path / "x.wav")
    audio = _sine(8000)
    audio_io.write_wav(path, audio, 22050)
    back, rate = audio_io.read_wav(path)
    assert rate == 22050
    assert back.shape == audio.shape
    assert np.abs(back - audio).max() < 2e-4  # 16-bit quantization


def test_flac_roundtrip_mono(tmp_path):
    path = str(tmp_path / "x.flac")
    audio = _sine(10000)
    flac_mod.write_flac(path, audio, 22050)
    back, rate = flac_mod.read_flac(path)
    assert rate == 22050
    assert back.shape[0] == audio.shape[0]
    assert np.abs(back - audio).max() < 2e-4


def test_flac_roundtrip_noise_multiblock(tmp_path):
    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.9, 0.9, size=9001)
    path = str(tmp_path / "n.flac")
    flac_mod.write_flac(path, audio, 16000, blocksize=2048)
    back, rate = flac_mod.read_flac(path)
    assert rate == 16000
    assert back.shape[0] == 9001
    assert np.abs(back - audio).max() < 2e-4


def test_flac_stereo(tmp_path):
    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, size=(5000, 2))
    path = str(tmp_path / "s.flac")
    flac_mod.write_flac(path, audio, 22050)
    back, rate = flac_mod.read_flac(path)
    assert back.shape == (5000, 2)
    assert np.abs(back - audio).max() < 2e-4


def test_read_audio_flac_fallback_to_wav(tmp_path):
    audio = _sine(4000)
    audio_io.write_wav(str(tmp_path / "7_audio_clean.wav"), audio, 22050)
    back, rate = audio_io.read_audio(str(tmp_path / "7_audio_clean.flac"))
    assert rate == 22050
    assert back.shape == audio.shape


def test_read_audio_stereo_mono_select(tmp_path):
    audio = np.stack([_sine(4000), 0.1 * _sine(4000)], axis=1)
    path = str(tmp_path / "st.wav")
    audio_io.write_wav(path, audio, 22050)
    back, _ = audio_io.read_audio(path)
    assert back.ndim == 1
    assert np.abs(back - audio[:, 0]).max() < 2e-4
