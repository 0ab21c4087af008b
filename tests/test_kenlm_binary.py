"""KenLM binary (probing) reader: load-or-error contract.

The fixture writer below emits the probing layout documented in
``silent_speech_tpu/eval/kenlm_binary.py`` (it emulates KenLM's
``build_binary`` output structure: sanity header, fixed params, vocab
probing table, unigram array, middle/longest n-gram tables, word strings).
Scores from the binary must match the ARPA text model exactly; malformed
files must raise, never silently decode LM-free (VERDICT round-1 item 4;
reference ``recognition_model.py:34-35``).
"""

import math
import struct

import numpy as np
import pytest

from silent_speech_tpu.eval.decode import ArpaLM
from silent_speech_tpu.eval.kenlm_binary import (
    KenLMBinary, KenLMBinaryError, MAGIC_V5, load_lm, murmur_hash64a,
    ngram_hash, _buckets, _align8,
)

ARPA = """\\data\\
ngram 1=6
ngram 2=4
ngram 3=2

\\1-grams:
-2.5\t<unk>
-1.0\t<s>\t-0.5
-1.0\t</s>
-0.8\tthe\t-0.4
-1.2\tcat\t-0.3
-1.5\tdog\t-0.2

\\2-grams:
-0.3\tthe cat\t-0.1
-0.9\tthe dog
-0.6\t<s> the\t-0.05
-1.1\tcat </s>

\\3-grams:
-0.2\t<s> the cat
-0.7\tthe cat </s>

\\end\\
"""


def parse_arpa(text):
    """(order, counts, {n: {(words...): (log10 p, log10 bo)}}) from ARPA."""
    ngrams = {}
    counts = []
    section = 0
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("ngram "):
            counts.append(int(line.split("=")[1]))
            continue
        if line.startswith("\\") and "-grams:" in line:
            section = int(line[1:line.index("-")])
            ngrams[section] = {}
            continue
        if line.startswith("\\") or section == 0:
            continue
        parts = line.split("\t")
        logp = float(parts[0])
        words = tuple(parts[1].split())
        bo = float(parts[2]) if len(parts) > 2 else 0.0
        ngrams[section][words] = (logp, bo)
    return len(counts), counts, ngrams


def write_probing_binary(path, arpa_text, multiplier=1.5,
                         with_strings=True):
    """Emit a KenLM probing-format v5 binary for the given ARPA model."""
    order, counts, ngrams = parse_arpa(arpa_text)

    # word ids: <unk> → 0 (not stored); others sequential in ARPA order
    word_ids = {}
    next_id = 1
    uni_order = []
    for words in ngrams[1]:
        w = words[0]
        uni_order.append(w)
        if w in ("<unk>", "<UNK>"):
            word_ids[w] = 0
        else:
            word_ids[w] = next_id
            next_id += 1

    def insert(keys_arr, vals, key, value):
        n = len(keys_arr)
        i = key % n
        while keys_arr[i] != 0:
            i = (i + 1) % n
        keys_arr[i] = key
        vals[i] = value

    # ---- header
    magic = MAGIC_V5 + b"\x00" * (56 - len(MAGIC_V5))
    sanity = magic + struct.pack("<fff", 0.0, 1.0, -0.5) \
        + struct.pack("<II", 1, 0xFFFFFFFF) + b"\x00" * 4 \
        + struct.pack("<Q", 1)
    params = struct.pack("<B3xfi B3x I", order, multiplier, 0, 1, 0)
    header = sanity + params + struct.pack(f"<{order}Q", *counts)
    header += b"\x00" * (_align8(len(header)) - len(header))

    # ---- vocab table
    vb = _buckets(counts[0], multiplier)
    vkeys = np.zeros(vb, np.uint64)
    vvals = np.zeros(vb, np.uint32)
    for w, wid in word_ids.items():
        if wid == 0:
            continue
        insert(vkeys, vvals, murmur_hash64a(w.encode()), wid)
    vocab = struct.pack("<Q", next_id)  # header: bound
    ventries = b"".join(struct.pack("<QI", int(k), int(v))
                        for k, v in zip(vkeys, vvals))
    vocab += ventries
    vocab += b"\x00" * (_align8(len(vocab) + len(header))
                        - (len(vocab) + len(header)))

    # ---- unigram array (+1 trailing slot, KenLM Unigram::Size)
    uni = np.zeros((counts[0] + 1, 2), np.float32)
    for words, (p, bo) in ngrams[1].items():
        uni[word_ids[words[0]]] = (p, bo)
    body = uni.tobytes()

    # ---- middle tables
    for n in range(2, order):
        b = _buckets(counts[n - 1], multiplier)
        keys = np.zeros(b, np.uint64)
        vals = np.zeros((b, 2), np.float32)
        for words, (p, bo) in ngrams[n].items():
            ids = [word_ids[w] for w in words]
            insert(keys, vals, ngram_hash(ids), (p, bo))
        body += b"".join(
            struct.pack("<Qff", int(k), float(v[0]), float(v[1]))
            for k, v in zip(keys, vals))

    # ---- longest table
    if order >= 2:
        b = _buckets(counts[order - 1], multiplier)
        keys = np.zeros(b, np.uint64)
        vals = np.zeros(b, np.float32)
        for words, (p, _bo) in ngrams[order].items():
            ids = [word_ids[w] for w in words]
            insert(keys, vals, ngram_hash(ids), p)
        body += b"".join(struct.pack("<Qf", int(k), float(v))
                         for k, v in zip(keys, vals))

    blob = header + vocab + body
    if with_strings:
        blob += b"\x00".join(w.encode() for w in uni_order) + b"\x00"
    with open(path, "wb") as f:
        f.write(blob)
    return path


@pytest.fixture()
def binary_lm(tmp_path):
    p = tmp_path / "lm.binary"
    write_probing_binary(str(p), ARPA)
    return KenLMBinary(str(p))


@pytest.fixture()
def arpa_lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p))


def test_loads_and_metadata(binary_lm):
    assert binary_lm.order == 3
    assert binary_lm.counts == [6, 4, 2]


def test_scores_match_arpa(binary_lm, arpa_lm):
    cases = [
        ([], "the"), ([], "cat"), (["the"], "cat"), (["the"], "dog"),
        (["<s>"], "the"), (["<s>", "the"], "cat"),  # trigram hit
        (["the", "cat"], "</s>"),                   # trigram hit
        (["cat"], "dog"),                           # backoff
        (["dog", "the"], "cat"),                    # context truncation
        ([], "zebra"),                              # OOV → <unk>
        (["zebra"], "the"),                         # OOV context
    ]
    for ctx, w in cases:
        assert binary_lm.score_word(ctx, w) == pytest.approx(
            arpa_lm.score_word(ctx, w), abs=1e-5), (ctx, w)


def test_score_sentence_matches(binary_lm, arpa_lm):
    s = ["the", "cat"]
    assert binary_lm.score_sentence(s) == pytest.approx(
        arpa_lm.score_sentence(s), abs=1e-5)


def test_truncated_file_raises(tmp_path):
    p = tmp_path / "lm.binary"
    write_probing_binary(str(p), ARPA, with_strings=False)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 64])
    with pytest.raises(KenLMBinaryError, match="file size"):
        KenLMBinary(str(p))


def test_trie_model_type_raises(tmp_path):
    p = tmp_path / "lm.binary"
    write_probing_binary(str(p), ARPA)
    data = bytearray(p.read_bytes())
    struct.pack_into("<i", data, 88 + 8, 2)  # model_type = TRIE
    p.write_bytes(bytes(data))
    with pytest.raises(KenLMBinaryError, match="TRIE"):
        KenLMBinary(str(p))


def test_garbage_magic_raises(tmp_path):
    p = tmp_path / "lm.binary"
    p.write_bytes(b"definitely not a kenlm file" * 10)
    with pytest.raises(KenLMBinaryError, match="magic"):
        KenLMBinary(str(p))


def test_load_lm_dispatch(tmp_path, binary_lm):
    arpa = tmp_path / "m.arpa"
    arpa.write_text(ARPA)
    assert isinstance(load_lm(str(arpa)), ArpaLM)
    assert isinstance(load_lm(binary_lm.path), KenLMBinary)
    with pytest.raises(FileNotFoundError):
        load_lm(str(tmp_path / "missing.binary"))
    bad = tmp_path / "bad.arpa"
    bad.write_text("not an arpa file\n")
    with pytest.raises(KenLMBinaryError):
        load_lm(str(bad))


def test_binary_lm_in_beam_decode(binary_lm, arpa_lm):
    """The binary LM steers the beam exactly like the ARPA twin."""
    from silent_speech_tpu.eval.decode import beam_ctc_decode
    from silent_speech_tpu.text import TextTransform

    chars = TextTransform().chars
    rng = np.random.default_rng(0)
    text = "the cat"
    ids = [chars.index(c) for c in text]
    T = 3 * len(ids)
    blank = len(chars)
    lp = np.full((T, len(chars) + 1), -15.0)
    for i, s in enumerate(ids):
        lp[3 * i, s] = -0.05
        lp[3 * i + 1, s] = -0.05
        lp[3 * i + 2, blank] = -0.05
    lp += rng.normal(0, 0.01, lp.shape)
    out_bin = beam_ctc_decode(lp, chars, blank, beam_width=20,
                              lm=binary_lm, alpha=1.5, beta=1.85)
    out_arpa = beam_ctc_decode(lp, chars, blank, beam_width=20,
                               lm=arpa_lm, alpha=1.5, beta=1.85)
    assert out_bin == out_arpa
    assert "".join(chars[i] for i in out_bin) == text


def test_trainer_get_lm_contract(tmp_path, monkeypatch):
    """_get_lm: default-missing path warns+None; explicit bad path raises;
    valid binary loads (reference recognition_model.py:34-35)."""
    from silent_speech_tpu.config import Config
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    cfg = Config()
    cfg.model.model_size = 8
    cfg.model.num_layers = 1
    cfg.model.dim_feedforward = 16
    cfg.model.num_heads = 2
    trainer = RecognitionTrainer.__new__(RecognitionTrainer)  # no jit setup
    trainer.cfg = cfg
    trainer._lm = None

    monkeypatch.chdir(tmp_path)  # default 'lm.binary' does not exist
    assert trainer._get_lm() is None

    cfg.recognition.lm_path = str(tmp_path / "nope.binary")
    with pytest.raises(FileNotFoundError):
        trainer._get_lm()

    good = tmp_path / "real.binary"
    write_probing_binary(str(good), ARPA)
    cfg.recognition.lm_path = str(good)
    assert isinstance(trainer._get_lm(), KenLMBinary)
