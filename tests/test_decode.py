import math

import numpy as np
import pytest

from silent_speech_tpu.eval.decode import (
    greedy_ctc_decode, beam_ctc_decode, ArpaLM,
)

CHARS = "abcdefghijklmnopqrstuvwxyz0123456789 "
BLANK = len(CHARS)


def _logp_from_ids(ids, n_symbols=38, peak=8.0):
    """Frame log-probs strongly peaked on the given symbol sequence."""
    t = len(ids)
    logits = np.zeros((t, n_symbols), dtype=np.float64)
    for i, s in enumerate(ids):
        logits[i, s] = peak
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_greedy_collapse_and_blank():
    # c a a _ t -> "cat"
    ids = [2, 0, 0, BLANK, 19]
    lp = _logp_from_ids(ids)
    out = greedy_ctc_decode(lp, BLANK)
    assert "".join(CHARS[i] for i in out) == "cat"


def test_greedy_repeat_needs_blank():
    # l l _ l -> "ll"
    ids = [11, 11, BLANK, 11]
    out = greedy_ctc_decode(_logp_from_ids(ids), BLANK)
    assert "".join(CHARS[i] for i in out) == "ll"


def test_beam_matches_greedy_on_peaked_input():
    ids = [7, 4, BLANK, 11, 11, BLANK, 11, 14]  # hello
    lp = _logp_from_ids(ids)
    beam_out = beam_ctc_decode(lp, CHARS, BLANK, beam_width=20)
    assert "".join(CHARS[i] for i in beam_out) == "hello"


def test_beam_sums_paths_better_than_greedy():
    """Classic case: two paths for 'a' outweigh one stronger path for 'b'."""
    n = 3
    lp = np.log(np.array([
        # symbols: a(0), b(1), blank(2)
        [0.4, 0.6, 0.0001],
        [0.4, 0.0001, 0.6],
    ]) + 1e-9)
    lp = np.pad(lp, ((0, 0), (0, 35)), constant_values=-20.0)
    # greedy picks b then blank → "b";
    # beam: P(a) = 0.4*0.6(+a,blank) + 0.4*0.4(aa) + 0.6*0.4(blank? no...)
    out = beam_ctc_decode(lp, CHARS, 2, beam_width=10)
    text = "".join(CHARS[i] for i in out)
    greedy = greedy_ctc_decode(lp, 2)
    assert "".join(CHARS[i] for i in greedy) == "b"
    assert text == "a"


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
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


def test_arpa_direct_ngram(lm):
    lg = math.log(10.0)
    assert lm.score_word(["the"], "cat") == pytest.approx(-0.3 * lg)
    assert lm.score_word(["<s>"], "the") == pytest.approx(-0.6 * lg)


def test_arpa_backoff(lm):
    lg = math.log(10.0)
    # "cat dog": no bigram → backoff(cat) + unigram(dog)
    assert lm.score_word(["cat"], "dog") == pytest.approx(
        (-0.3 + -1.5) * lg)


def test_arpa_unknown_word(lm):
    assert lm.score_word([], "zebra") <= -10.0


def test_beam_lm_steers_ambiguous_decode(lm):
    """LM should break a near-tie between 'the cat' and 'the caq'."""
    text_ids = [CHARS.index(c) for c in "the cat"]
    lp = _logp_from_ids(text_ids, peak=8.0)
    # make final 't' ambiguous with 'q'
    ti = CHARS.index("t")
    qi = CHARS.index("q")
    lp[-1, :] = -20.0
    lp[-1, ti] = math.log(0.49)
    lp[-1, qi] = math.log(0.51)
    no_lm = beam_ctc_decode(lp, CHARS, BLANK, beam_width=20)
    with_lm = beam_ctc_decode(lp, CHARS, BLANK, beam_width=20, lm=lm,
                              alpha=1.5, beta=1.85)
    assert "".join(CHARS[i] for i in no_lm) == "the caq"
    assert "".join(CHARS[i] for i in with_lm) == "the cat"


def test_python_fallback_warns_once(monkeypatch, caplog):
    """A missing native decoder must be loud (VERDICT round-1 item 10):
    per-epoch beam validation is ~50x slower on the Python path."""
    import logging as _logging

    import silent_speech_tpu.eval.decode as dec
    from silent_speech_tpu.utils import native

    monkeypatch.setattr(native, "get_lib", lambda: None)
    monkeypatch.setattr(dec, "_WARNED_FALLBACK", False)
    lp = np.log(np.full((4, 38), 1e-6))
    lp[:, 0] = np.log(0.9)
    with caplog.at_level(_logging.WARNING):
        beam_ctc_decode(lp, CHARS + "x" * (38 - len(CHARS) - 1), 37,
                        beam_width=4)
    assert any("libssp_native" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(_logging.WARNING):
        beam_ctc_decode(lp, CHARS + "x" * (38 - len(CHARS) - 1), 37,
                        beam_width=4)
    assert not any("libssp_native" in r.message for r in caplog.records)


def test_native_lm_order_guard(tmp_path):
    """The native LM-fused decoder keeps only a 9-word context ring —
    exact for order <= 10. Higher orders must be refused natively
    (ValueError) and transparently served by the Python decoder."""
    import numpy as np
    from silent_speech_tpu.eval.decode import (
        beam_ctc_decode, native_beam_usable, ArpaLM)
    from silent_speech_tpu.utils import native

    if native.get_lib() is None:
        pytest.skip("native library not built")

    order = 11
    lines = ["\\data\\"]
    lines += [f"ngram {n}={1 if n > 1 else 3}" for n in range(1, order + 1)]
    lines.append("")
    words = ["w%d" % i for i in range(order)]
    lines += ["\\1-grams:", "-0.5\t<s>\t-0.3", "-0.7\ta\t-0.3",
              "-2.0\t<unk>", ""]
    for n in range(2, order + 1):
        lines += [f"\\{n}-grams:",
                  "-0.5\t" + " ".join(words[:n]) + ("\t-0.2"
                                                    if n < order else ""),
                  ""]
    lines.append("\\end\\")
    path = tmp_path / "big.arpa"
    path.write_text("\n".join(lines))

    with pytest.raises(ValueError):
        native.ctc_beam_decode_lm(
            np.log(np.full((5, 4), 0.25)), "ab ", 3, str(path))

    # the public API falls back to the Python decoder and still decodes
    lm = ArpaLM(str(path))
    rng = np.random.default_rng(0)
    lp = rng.normal(size=(12, 4))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    ids = beam_ctc_decode(lp, "ab ", 3, beam_width=8, lm=lm)
    assert isinstance(ids, list)
    assert native_beam_usable(None)
    assert not native_beam_usable(lm)  # ring too small -> stay serial
