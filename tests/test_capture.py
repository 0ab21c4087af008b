"""Capture tooling: book splitting, synthetic recording session, cleaning."""

import json
import os

import numpy as np
import pytest

from silent_speech_tpu.capture.book import Book, split_sentences
from silent_speech_tpu.capture.clean_audio import clean_session
from silent_speech_tpu.capture.recorder import Recorder, SyntheticBoard
from silent_speech_tpu.capture.session import record_utterance, run_session
from silent_speech_tpu.dsp.denoise import spectral_gate
from silent_speech_tpu.utils import flac as flac_mod
from silent_speech_tpu.utils.audio_io import read_audio


def test_split_sentences():
    text = ("Mr. Smith went to Washington. He arrived at 3 p.m.! "
            "\"Was it raining?\" Nobody knew.")
    sents = split_sentences(text)
    assert sents[0] == "Mr. Smith went to Washington."
    assert any(s.startswith('"Was it raining?"') or
               s.startswith("Nobody") for s in sents)
    assert all(s.strip() for s in sents)


def test_book_bookmark_resume(tmp_path):
    p = tmp_path / "book.txt"
    p.write_text("One sentence here. Another one follows. A third ends.")
    b = Book(str(p))
    assert len(b) == 3
    assert b.current_sentence_index() == 0
    b.advance()
    # a new Book resumes from the bookmark
    b2 = Book(str(p))
    assert b2.current_sentence_index() == 1


def test_synthetic_recorder_shapes():
    rec = Recorder(debug=True)
    emg, audio, button = rec.record(0.15)
    assert emg.shape[1] == 8
    assert emg.shape[0] > 50          # ~150 samples at 1 kHz
    assert button.shape[0] == emg.shape[0]
    assert audio.ndim == 1


def test_record_utterance_schema(tmp_path):
    rec = Recorder(debug=True)
    out = str(tmp_path / "sess")
    info = record_utterance(rec, out, 0, "hello world", "book", 5, 0.12)
    assert os.path.exists(os.path.join(out, "0_emg.npy"))
    assert os.path.exists(os.path.join(out, "0_audio.flac"))
    assert os.path.exists(os.path.join(out, "0_button.npy"))
    with open(os.path.join(out, "0_info.json")) as f:
        saved = json.load(f)
    assert saved["text"] == "hello world"
    assert saved["book"] == "book"
    assert saved["sentence_index"] == 5
    emg_len = saved["chunks"][0][0]
    assert np.load(os.path.join(out, "0_emg.npy")).shape == (emg_len, 8)
    # overwrite protection (reference record_reading.py:36)
    with pytest.raises(AssertionError):
        record_utterance(rec, out, 0, "again", "book", 6, 0.05)


def test_run_session_noninteractive(tmp_path):
    book = tmp_path / "b.txt"
    book.write_text("First phrase here. Second phrase there. Third one.")
    out = str(tmp_path / "sess")
    n = run_session(out, str(book), debug=True, seconds_per_sentence=0.05,
                    max_sentences=2, interactive=False)
    assert n == 2
    assert os.path.exists(os.path.join(out, "1_info.json"))


def test_spectral_gate_reduces_noise():
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr) / sr
    clean = 0.4 * np.sin(2 * np.pi * 440 * t)
    noise = 0.05 * rng.normal(size=sr)
    noisy = clean + noise
    profile = 0.05 * rng.normal(size=sr // 2)
    denoised = spectral_gate(noisy, profile, sample_rate=sr)
    # noise floor outside the tone band should drop
    def band_energy(x, lo, hi):
        spec = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), 1 / sr)
        return spec[(freqs > lo) & (freqs < hi)].sum()
    assert band_energy(denoised, 2000, 7000) < \
        0.3 * band_energy(noisy, 2000, 7000)
    # the tone survives
    assert band_energy(denoised, 400, 480) > \
        0.7 * band_energy(noisy, 400, 480)


def test_clean_session(tmp_path):
    rng = np.random.default_rng(1)
    sess = str(tmp_path / "sess")
    os.makedirs(sess)
    sr = 16000
    for i in range(3):
        if i == 0:
            audio = 0.02 * rng.normal(size=sr // 2)  # silence profile
        else:
            t = np.arange(sr) / sr
            audio = (0.1 * i) * np.sin(2 * np.pi * 300 * t) \
                + 0.02 * rng.normal(size=sr)
        flac_mod.write_flac(os.path.join(sess, f"{i}_audio.flac"),
                            audio.astype(np.float32), sr)
    written = clean_session(sess)
    assert len(written) == 3
    for i in range(3):
        audio, rate = read_audio(os.path.join(sess,
                                              f"{i}_audio_clean.flac"))
        assert rate == 22050
        assert np.abs(audio).max() <= 1.0


def test_streaming_recorder_chunks():
    """Context-managed streaming: update() accumulates per-pump chunks;
    get_data() returns-and-clears with matching chunk_info (reference
    record_data.py:132-170)."""
    import time

    from silent_speech_tpu.capture.recorder import Recorder

    with Recorder(debug=True) as r:
        for _ in range(10):
            time.sleep(0.01)
            r.update()
        emg, audio, button, chunks = r.get_data()
        assert emg.shape[1] == 8
        assert emg.shape[0] > 0 and audio.shape[0] > 0
        assert button.dtype == bool and button.shape[0] == emg.shape[0]
        assert sum(c[0] for c in chunks) == emg.shape[0]
        assert sum(c[1] for c in chunks) == audio.shape[0]
        # cleared after get_data
        emg2, audio2, _, chunks2 = r.get_data()
        assert emg2.shape[0] == 0 and not chunks2


def test_reading_session_protocol(tmp_path):
    """The full reference key protocol: begin -> n (silence idx0) ->
    n (sentence) -> r (restart: 2 edge-silence segments) -> n -> q
    (record_reading.py:64-123)."""
    import json as _json
    import time

    import numpy as np

    from silent_speech_tpu.capture.book import Book
    from silent_speech_tpu.capture.recorder import Recorder
    from silent_speech_tpu.capture.session import ReadingSession

    bf = tmp_path / "book.txt"
    bf.write_text("First sentence here. Second sentence here. "
                  "Third sentence here.")
    out = str(tmp_path / "session")

    def pump(r, n=8):
        for _ in range(n):
            time.sleep(0.012)
            r.update()

    with Recorder(debug=True) as r, Book(str(bf)) as book:
        s = ReadingSession(r, book, out)
        assert s.current_prompt() == "<Press any key to begin.>"
        pump(r)
        s.handle_key("x")          # begin
        assert s.recording and s.current_prompt() == "<silence>"
        pump(r)
        s.handle_key("n")          # idx0: leading silence
        assert s.current_prompt() == "First sentence here."
        pump(r)
        s.handle_key(" ")          # idx1: first sentence
        assert s.current_prompt() == "Second sentence here."
        pump(r, 80)                # need >=500 EMG samples for edges
        s.handle_key("r")          # idx2+idx3: edge silences, re-prompt
        assert s.current_prompt() == "Second sentence here."
        pump(r)
        s.handle_key("n")          # idx4: second sentence
        pump(r, 80)
        s.handle_key("q")          # idx5: trailing silence, stop
        assert s.done

    def info(i):
        return _json.load(open(os.path.join(out, f"{i}_info.json")))

    # schema + semantics of each segment
    assert info(0) == {"book": "", "sentence_index": -1, "text": "",
                       "chunks": info(0)["chunks"]}
    assert info(1)["text"] == "First sentence here."
    assert info(1)["book"] == "book"
    assert info(2)["sentence_index"] == -1  # restart edge silences
    assert info(3)["sentence_index"] == -1
    assert info(4)["text"] == "Second sentence here."
    assert info(4)["sentence_index"] == 1
    assert info(5)["sentence_index"] == -1
    # multi-chunk streaming recording (the round-1 gap):
    assert len(info(1)["chunks"]) > 1
    emg1 = np.load(os.path.join(out, "1_emg.npy"))
    assert emg1.shape[0] == sum(c[0] for c in info(1)["chunks"])
    # restart did not advance the book; bookmark persisted on exit
    assert open(str(bf) + ".bookmark").read() == "2"
