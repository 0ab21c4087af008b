"""Offline per-session audio cleaning: denoise + volume normalization.

Reference: ``data_collection/clean_audio.py`` — for each session directory,
denoise every clip against the session's silence profile (clip 0), resample
to 22.05 kHz, normalize volume with per-clip gains smoothed across
neighboring clips, and write ``{i}_audio_clean.flac`` — the file the
training loaders read.
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

from ..dsp.denoise import spectral_gate
from ..dsp.resample import resample_poly_audio
from ..utils import flac as flac_mod
from ..utils.audio_io import read_audio

TARGET_RMS = 0.2


def _clip_rms(audio: np.ndarray, frame: int = 2048, hop: int = 512
              ) -> float:
    """Peak frame RMS (the scale normalize_volume keys on,
    ``data_utils.py:19-27``)."""
    if len(audio) < frame:
        return float(np.sqrt(np.mean(audio ** 2) + 1e-12))
    n = 1 + (len(audio) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return float(np.sqrt((audio[idx] ** 2).mean(axis=1)).max())


def clean_session(session_dir: str, noise_clip_index: int = 0,
                  smooth_neighbors: int = 2,
                  denoise: bool = True) -> List[str]:
    """Clean every ``{i}_audio.flac``/``.wav`` in a session directory;
    returns the written paths."""
    indices = sorted(
        int(m.group(1)) for f in os.listdir(session_dir)
        if (m := re.match(r"(\d+)_audio\.(flac|wav)$", f)))
    assert indices, f"no raw audio clips in {session_dir}"

    clips = {}
    rates = {}
    for i in indices:
        base = os.path.join(session_dir, f"{i}_audio.flac")
        audio, rate = read_audio(base)
        clips[i], rates[i] = np.asarray(audio, dtype=np.float64), rate

    noise = clips.get(noise_clip_index, next(iter(clips.values())))

    # denoise + resample
    for i in indices:
        audio = clips[i]
        if denoise:
            audio = spectral_gate(audio, noise, sample_rate=rates[i])
        if rates[i] != 22050:
            audio = resample_poly_audio(audio, rates[i], 22050)
        clips[i] = np.clip(audio, -1, 1)

    # smoothed volume normalization across neighboring clips
    rms = np.array([_clip_rms(clips[i]) for i in indices])
    gains = TARGET_RMS / (rms + 0.01)
    if smooth_neighbors > 0 and len(indices) > 1:
        k = np.ones(2 * smooth_neighbors + 1)
        k /= k.sum()
        gains = np.convolve(np.pad(gains, smooth_neighbors, mode="edge"),
                            k, mode="valid")

    written = []
    for gi, i in enumerate(indices):
        audio = clips[i] * gains[gi]
        peak = np.abs(audio).max()
        if peak > 1.0:
            audio = audio / peak
        out = os.path.join(session_dir, f"{i}_audio_clean.flac")
        flac_mod.write_flac(out, audio.astype(np.float32), 22050)
        written.append(out)
    return written


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("session_dirs", nargs="+")
    p.add_argument("--no_denoise", action="store_true")
    args = p.parse_args()
    for d in args.session_dirs:
        paths = clean_session(d, denoise=not args.no_denoise)
        print(f"{d}: wrote {len(paths)} cleaned clips")


if __name__ == "__main__":
    main()
