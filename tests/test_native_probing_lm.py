"""Native KenLM probing-binary decode path (cpp/probing_lm.cc).

The reference's canonical eval decodes with ``lm.binary``
(``recognition_model.py:34-35``); these tests pin the native mmap-backed
scorer and the LM-fused beam to the tested pure-Python implementations.
"""

import ctypes

import numpy as np
import pytest

from silent_speech_tpu.eval.decode import ArpaLM, beam_ctc_decode, \
    native_beam_usable
from silent_speech_tpu.eval.kenlm_binary import KenLMBinary
from silent_speech_tpu.utils import native

from test_kenlm_binary import ARPA, write_probing_binary

SCORE_CASES = [
    ([], "the"), ([], "cat"), (["the"], "cat"), (["the"], "dog"),
    (["<s>"], "the"), (["<s>", "the"], "cat"),
    (["the", "cat"], "</s>"),
    (["cat"], "dog"),
    (["dog", "the"], "cat"),
    ([], "zebra"),
    (["zebra"], "the"),
]


@pytest.fixture(scope="module")
def lib():
    if not native.build():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


@pytest.fixture()
def binary_lm(tmp_path):
    p = tmp_path / "lm.binary"
    write_probing_binary(str(p), ARPA)
    return KenLMBinary(str(p))


def test_native_score_word_matches_python(lib, binary_lm):
    handle = native.lm_load_probing(binary_lm)
    assert handle != 0
    for ctx, w in SCORE_CASES:
        got = lib.ssp_lm_score_word(
            handle, " ".join(ctx).encode(), w.encode())
        want = binary_lm.score_word(ctx, w)
        assert got == pytest.approx(want, abs=1e-5), (ctx, w)


def test_native_beam_usable_for_binary(lib, binary_lm):
    assert native_beam_usable(binary_lm)


def test_native_binary_beam_matches_python(lib, binary_lm, monkeypatch):
    """Native LM-fused beam with the probing binary == the pure-Python
    beam with the same (tested) Python LM object, over random inputs."""
    from silent_speech_tpu.text import TextTransform

    chars = TextTransform().chars
    blank = len(chars)
    rng = np.random.default_rng(7)
    for _ in range(4):
        logits = rng.normal(size=(40, blank + 1)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        got = beam_ctc_decode(lp, chars, blank, beam_width=16,
                              lm=binary_lm, alpha=1.5, beta=1.85)

        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "get_lib", lambda: None)
            want = beam_ctc_decode(lp, chars, blank, beam_width=16,
                                   lm=binary_lm, alpha=1.5, beta=1.85)
        assert got == want


def test_native_binary_beam_matches_native_arpa(lib, binary_lm, tmp_path):
    """Same model through both native LM backends → identical decodes."""
    arpa_path = tmp_path / "m.arpa"
    arpa_path.write_text(ARPA)
    arpa = ArpaLM(str(arpa_path))

    chars = "abcdefghijklmnopqrstuvwxyz "
    blank = len(chars)
    rng = np.random.default_rng(11)
    for _ in range(4):
        logits = rng.normal(size=(50, blank + 1)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        got_bin = beam_ctc_decode(lp, chars, blank, beam_width=24,
                                  lm=binary_lm, alpha=1.5, beta=1.85)
        got_arpa = beam_ctc_decode(lp, chars, blank, beam_width=24,
                                   lm=arpa, alpha=1.5, beta=1.85)
        assert got_bin == got_arpa


def test_native_load_rejects_bad_layout(lib, binary_lm):
    """Out-of-bounds section offsets must fail the load, not segfault."""
    lay = dict(binary_lm.layout)

    class FakeLM:
        binary_path = binary_lm.binary_path
        order = binary_lm.order
        layout = lay

    lay["longest_off"] = 1 << 40  # past EOF
    with pytest.raises(ValueError, match="native KenLM-binary load"):
        # bypass the per-path cache with a distinct key
        FakeLM.binary_path = binary_lm.binary_path + ""
        native._LM_HANDLES.pop(FakeLM.binary_path, None)
        native.lm_load_probing(FakeLM)
    native._LM_HANDLES.pop(FakeLM.binary_path, None)
