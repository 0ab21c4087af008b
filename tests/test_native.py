"""Native C++ runtime (cpp/libssp_native.so): FLAC decode, CTC beam, DTW.

The library is built on demand with the in-repo Makefile; tests verify the
native implementations agree with the pure-Python/JAX ones.
"""

import numpy as np
import pytest

from silent_speech_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.build():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_native_flac_matches_python(lib, tmp_path):
    from silent_speech_tpu.utils import flac as pyflac

    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.8, 0.8, size=22050)
    path = str(tmp_path / "t.flac")
    pyflac.write_flac(path, audio, 22050, blocksize=4096)

    got, rate = native.read_flac(path)
    assert rate == 22050
    with open(path, "rb") as f:
        expected, _ = pyflac.read_flac_bytes(f.read())
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_native_flac_stereo(lib, tmp_path):
    from silent_speech_tpu.utils import flac as pyflac

    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, size=(9000, 2))
    path = str(tmp_path / "s.flac")
    pyflac.write_flac(path, audio, 16000)
    got, rate = native.read_flac(path)
    assert rate == 16000
    assert got.shape == (9000, 2)
    np.testing.assert_allclose(got, audio, atol=2e-4)


def test_native_beam_matches_python(lib):
    from silent_speech_tpu.eval.decode import beam_ctc_decode

    chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    blank = len(chars)
    rng = np.random.default_rng(2)
    for trial in range(5):
        logits = rng.normal(size=(30, blank + 1)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        native_ids = native.ctc_beam_decode(lp, chars, blank,
                                            beam_width=16, beta=1.85)
        # Python fallback (force by bypassing the native path)
        from silent_speech_tpu.eval import decode as dec

        orig = dec._try_native_beam
        dec._try_native_beam = lambda *a, **k: None
        try:
            py_ids = beam_ctc_decode(lp, chars, blank, beam_width=16,
                                     beta=1.85)
        finally:
            dec._try_native_beam = orig
        assert native_ids == py_ids, f"trial {trial}"


def test_native_dtw_matches_oracle(lib):
    from silent_speech_tpu.ops.dtw import align_from_distances_numpy

    rng = np.random.default_rng(3)
    costs = rng.uniform(0.5, 2.0, size=(50, 64)).astype(np.float32)
    align, cost = native.dtw_align_host(costs)
    expected = align_from_distances_numpy(costs)
    assert align == expected
    assert np.isfinite(cost)


ARPA = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.0\t</s>
-0.8\tthe\t-0.4
-1.2\tcat\t-0.3
-1.5\tdog\t-0.2

\\2-grams:
-0.3\tthe cat
-0.9\tthe dog
-0.6\t<s> the

\\end\\
"""


@pytest.fixture()
def arpa_path(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return str(p)


def test_native_lm_scores_match_python(lib, arpa_path):
    from silent_speech_tpu.eval.decode import ArpaLM

    py = ArpaLM(arpa_path)
    cases = [
        (["the"], "cat"), (["<s>"], "the"), (["cat"], "dog"),
        ([], "zebra"), (["dog", "the"], "cat"),
    ]
    for ctx, word in cases:
        got = native.lm_score_word(arpa_path, ctx, word)
        expected = py.score_word(ctx, word)
        assert got == pytest.approx(expected, rel=1e-6), (ctx, word)


def test_native_lm_beam_matches_python(lib, arpa_path):
    from silent_speech_tpu.eval import decode as dec
    from silent_speech_tpu.eval.decode import ArpaLM, beam_ctc_decode

    chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    blank = len(chars)
    lm = ArpaLM(arpa_path)
    rng = np.random.default_rng(5)
    for trial in range(4):
        logits = rng.normal(size=(24, blank + 1)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        native_ids = native.ctc_beam_decode_lm(
            lp, chars, blank, arpa_path, beam_width=12, alpha=1.5,
            beta=1.85)
        orig = dec._try_native_beam
        dec._try_native_beam = lambda *a, **k: None
        try:
            py_ids = beam_ctc_decode(lp, chars, blank, beam_width=12,
                                     lm=lm, alpha=1.5, beta=1.85)
        finally:
            dec._try_native_beam = orig
        assert native_ids == py_ids, f"trial {trial}"


def test_native_lm_steers_decode(lib, arpa_path):
    """Same crafted case as the Python test: LM flips 'caq' to 'cat'."""
    import math

    from silent_speech_tpu.eval.decode import beam_ctc_decode, ArpaLM

    chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    blank = len(chars)
    ids = [chars.index(c) for c in "the cat"]
    t = len(ids)
    logits = np.full((t, blank + 1), -20.0)
    for i, s in enumerate(ids):
        logits[i, s] = 8.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lp[-1, :] = -20.0
    lp[-1, chars.index("t")] = math.log(0.49)
    lp[-1, chars.index("q")] = math.log(0.51)
    lm = ArpaLM(arpa_path)
    # goes through the native path (lm.path set, lib loaded)
    out = beam_ctc_decode(lp, chars, blank, beam_width=16, lm=lm,
                          alpha=1.5, beta=1.85)
    assert "".join(chars[i] for i in out) == "the cat"
