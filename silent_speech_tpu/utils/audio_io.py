"""Audio file IO without libsndfile.

The reference reads ``{i}_audio_clean.flac`` via soundfile and writes eval
wavs via ``sf.write`` (``data_utils.py:64-65``, ``transduction_model.py:71``).
This environment has no libsndfile, so we provide:

- WAV read/write (PCM16/24/32 + float32) on scipy/stdlib,
- FLAC read via our pure-Python decoder (:mod:`.flac`), with a C++
  fast path when the native extension is built.

``read_audio`` dispatches on extension and falls back to a sibling ``.wav``
when a ``.flac`` is absent (convenient for synthetic datasets).
"""

from __future__ import annotations

import os
import struct
import wave
from typing import Optional, Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a wav file → (float32 samples in [-1, 1] (frames, channels) or
    (frames,), sample_rate)."""
    import scipy.io.wavfile as siw

    rate, data = siw.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, rate


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float audio as PCM16 wav (matches sf.write's default subtype
    for the eval wavs consumed by DeepSpeech)."""
    audio = np.asarray(audio)
    if audio.dtype.kind == "f":
        clipped = np.clip(audio, -1.0, 1.0)
        pcm = (clipped * 32767.0).astype("<i2")
    else:
        pcm = audio.astype("<i2")
    n_channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    with wave.open(path, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    from . import flac

    return flac.read_flac(path)


def read_audio(path: str, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Read wav or flac; if a .flac path does not exist but a sibling .wav
    does, read that instead. Selects the first channel of stereo input when
    ``mono`` (reference ``data_utils.py:67-68``)."""
    base, ext = os.path.splitext(path)
    if not os.path.exists(path):
        for alt_ext in (".wav", ".flac"):
            alt = base + alt_ext
            if alt != path and os.path.exists(alt):
                path, ext = alt, alt_ext
                break
    ext = ext.lower()
    if ext == ".flac":
        audio, rate = read_flac(path)
    elif ext == ".wav":
        audio, rate = read_wav(path)
    else:
        raise ValueError(f"unsupported audio format: {path}")
    if mono and audio.ndim > 1:
        audio = audio[:, 0]
    return audio, rate
