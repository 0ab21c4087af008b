"""Cross-validate the KenLM-binary reader against the independent writer.

The reader (eval/kenlm_binary.py) and the original fixture writer
(test_kenlm_binary.py) were written against the same layout notes; a shared
misunderstanding would pass both (VERDICT round-2 item 6). The writer in
kenlm_independent_writer.py re-derives every constant from simulated C
struct layouts and KenLM's own size arithmetic — these tests require the
two derivations to agree bit-for-bit and the reader to load/score the
independent output exactly.
"""

import numpy as np
import pytest

from silent_speech_tpu.eval.decode import ArpaLM
from silent_speech_tpu.eval.kenlm_binary import (
    KenLMBinary, KenLMBinaryError)

import kenlm_independent_writer as IW
from test_kenlm_binary import ARPA, parse_arpa, write_probing_binary


def test_derived_struct_constants():
    """The sizes the reader documents must fall out of C layout rules."""
    from silent_speech_tpu.eval import kenlm_binary as KB

    assert IW.SANITY_SIZE == KB._SANITY_SIZE == 88
    assert IW.PARAMS_SIZE == KB._PARAMS_SIZE == 20
    assert IW.SANITY_OFFS["one_uint64"] == 80
    assert IW.VOCAB_ENTRY_SIZE == 12       # pack(4): u64 + u32
    assert IW.MIDDLE_ENTRY_SIZE == 16
    assert IW.LONGEST_ENTRY_SIZE == 12
    # without pack(4) these would be 16/16/16 — the pragma matters
    assert IW._layout([("k", 8, 8), ("v", 4, 4)])[1] == 16


def test_writers_agree_byte_for_byte(tmp_path):
    """Original fixture writer and independent writer → identical files."""
    order, counts, ngrams = parse_arpa(ARPA)
    ngrams_t = {n: dict(d) for n, d in ngrams.items()}
    a = tmp_path / "a.binary"
    b = tmp_path / "b.binary"
    write_probing_binary(str(a), ARPA)
    IW.write_binary(str(b), order, counts, ngrams_t)
    assert a.read_bytes() == b.read_bytes()


def _random_model(rng, order):
    letters = list("abcdefghijklmnopqrstuvwxyz")
    vocab = sorted({"".join(rng.choice(letters, size=rng.integers(1, 7)))
                    for _ in range(rng.integers(5, 40))})
    ngrams = {1: {}}
    ngrams[1][("<unk>",)] = (float(rng.uniform(-5, -2)), 0.0)
    ngrams[1][("<s>",)] = (float(rng.uniform(-3, -1)),
                           float(rng.uniform(-1, 0)))
    ngrams[1][("</s>",)] = (float(rng.uniform(-3, -1)), 0.0)
    for w in vocab:
        ngrams[1][(w,)] = (float(rng.uniform(-4, -0.5)),
                           float(rng.uniform(-1, 0)))
    pool = vocab + ["<s>", "</s>"]
    for n in range(2, order + 1):
        ngrams[n] = {}
        for _ in range(rng.integers(1, 4 * len(vocab))):
            words = tuple(pool[rng.integers(len(pool))]
                          for _ in range(n))
            bo = float(rng.uniform(-1, 0)) if n < order else 0.0
            ngrams[n][words] = (float(rng.uniform(-3, -0.2)), bo)
    counts = [len(ngrams[n]) for n in range(1, order + 1)]
    return counts, ngrams


def _ngrams_to_arpa(order, counts, ngrams):
    lines = ["\\data\\"]
    for n in range(1, order + 1):
        lines.append(f"ngram {n}={counts[n - 1]}")
    lines.append("")
    for n in range(1, order + 1):
        lines.append(f"\\{n}-grams:")
        for words, (p, bo) in ngrams[n].items():
            row = f"{p:.6f}\t{' '.join(words)}"
            if bo != 0.0:
                row += f"\t{bo:.6f}"
            lines.append(row)
        lines.append("")
    lines.append("\\end\\")
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("order", [1, 2, 3, 5])
def test_reader_loads_independent_output(tmp_path, order):
    """Fuzzed models: reader layout == writer layout; scores == ARPA."""
    rng = np.random.default_rng(100 + order)
    for trial in range(3):
        counts, ngrams = _random_model(rng, order)
        p = tmp_path / f"m{order}_{trial}.binary"
        wl = IW.write_binary(str(p), order, counts, ngrams)
        lm = KenLMBinary(str(p))
        assert lm.order == order
        assert lm.counts == counts
        # the reader's independently solved layout must equal the
        # writer's computed one, section by section
        assert lm.layout["vocab_off"] == wl["vocab_off"]
        assert lm.layout["vocab_buckets"] == wl["vocab_buckets"]
        assert lm.layout["uni_off"] == wl["uni_off"]
        assert lm.layout["uni_entries"] == wl["uni_entries"]
        assert lm.layout["mid"] == wl["mid"]
        assert lm.layout["longest_off"] == wl["longest_off"]
        assert lm.layout["longest_buckets"] == wl["longest_buckets"]

        log10 = 2.302585092994046
        arpa = ArpaLM.__new__(ArpaLM)
        arpa.ngrams = {
            n: {w: (pr * log10, bo * log10)
                for w, (pr, bo) in ngrams[n].items()}
            for n in ngrams
        }
        arpa.order = order
        arpa.unk_floor = -10.0 * log10
        arpa.path = None

        words = [w[0] for w in ngrams[1]] + ["qqqq"]
        for _ in range(40):
            k = int(rng.integers(0, 3))
            ctx = [words[rng.integers(len(words))] for _ in range(k)]
            w = words[rng.integers(len(words))]
            assert lm.score_word(ctx, w) == pytest.approx(
                arpa.score_word(ctx, w), abs=1e-4), (ctx, w)


def test_arpa_roundtrip_through_independent_writer(tmp_path):
    """ARPA text → independent binary → reader scores == ArpaLM text
    parse (end-to-end through real file parsing on both sides)."""
    order, counts, ngrams = parse_arpa(ARPA)
    p = tmp_path / "rt.binary"
    IW.write_binary(str(p), order, counts,
                    {n: dict(d) for n, d in ngrams.items()})
    lm = KenLMBinary(str(p))
    ap = tmp_path / "rt.arpa"
    ap.write_text(ARPA)
    arpa = ArpaLM(str(ap))
    cases = [([], "the"), (["the"], "cat"), (["<s>", "the"], "cat"),
             (["cat"], "dog"), ([], "zebra")]
    for ctx, w in cases:
        assert lm.score_word(ctx, w) == pytest.approx(
            arpa.score_word(ctx, w), abs=1e-5)


def test_padding_fuzz_raises(tmp_path):
    """Files whose section arithmetic fits NO historical layout variant
    must raise, never mis-parse."""
    order, counts, ngrams = parse_arpa(ARPA)
    p = tmp_path / "f.binary"
    IW.write_binary(str(p), order, counts,
                    {n: dict(d) for n, d in ngrams.items()},
                    with_strings=False)
    data = p.read_bytes()
    for delta in (-13, -5, 7, 21):   # break the exact-size match
        q = tmp_path / f"f{delta}.binary"
        q.write_bytes(data[:delta] if delta < 0 else data + b"\x7f" * delta)
        with pytest.raises(KenLMBinaryError):
            KenLMBinary(str(q))
