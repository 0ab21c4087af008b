"""CTC beam-decode throughput at validation-realistic sizes.

The reference decodes every dev utterance per epoch with
beam_width=100 over a 37-char vocabulary and a KenLM binary word LM
(``recognition_model.py:34``, ``data_utils.py:157``). This measures the
native C++ decoder (no-LM, ARPA-LM, KenLM-binary-LM) and the pure-Python
fallback on the same logits so every configuration's cost is a recorded
number, not a surprise.

Run: python tools/bench_decode.py [n_utts] [t]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from silent_speech_tpu.eval import decode as D
from silent_speech_tpu.eval.kenlm_binary import KenLMBinary
from silent_speech_tpu.text import TextTransform


def make_logits(rng, t, vocab):
    """Peaked-but-noisy log-probs resembling a trained CTC head."""
    x = rng.normal(size=(t, vocab)) * 1.5
    x[np.arange(t), rng.integers(0, vocab, size=t)] += 4.0
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x.astype(np.float32)


def make_lm_files(tmpdir, n_words=2000, n_bi=20000, n_tri=20000, seed=3):
    """Synthetic 3-gram ARPA + its probing-binary twin at a realistic
    vocabulary scale."""
    rng = np.random.default_rng(seed)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = {"".join(rng.choice(list(letters),
                                size=rng.integers(2, 9)))
             for _ in range(n_words)}
    words = sorted(words)
    uni = [("<unk>",), ("<s>",), ("</s>",)] + [(w,) for w in words]
    bis, tris = set(), set()
    for _ in range(n_bi):
        bis.add((words[rng.integers(len(words))],
                 words[rng.integers(len(words))]))
    for _ in range(n_tri):
        tris.add((words[rng.integers(len(words))],
                  words[rng.integers(len(words))],
                  words[rng.integers(len(words))]))
    lines = ["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bis)}",
             f"ngram 3={len(tris)}", "", "\\1-grams:"]
    for w in uni:
        lines.append(f"{rng.uniform(-4, -1):.4f}\t{w[0]}\t-0.4")
    lines.append("")
    lines.append("\\2-grams:")
    for b in sorted(bis):
        lines.append(f"{rng.uniform(-3, -0.5):.4f}\t{' '.join(b)}\t-0.2")
    lines.append("")
    lines.append("\\3-grams:")
    for tr in sorted(tris):
        lines.append(f"{rng.uniform(-2, -0.3):.4f}\t{' '.join(tr)}")
    lines += ["", "\\end\\", ""]
    arpa = os.path.join(tmpdir, "bench.arpa")
    with open(arpa, "w") as f:
        f.write("\n".join(lines))
    from test_kenlm_binary import write_probing_binary
    binary = os.path.join(tmpdir, "bench.binary")
    write_probing_binary(binary, "\n".join(lines))
    return arpa, binary


def bench(name, logits, charset, lm, force_python=False):
    vocab = len(charset) + 1
    orig = None
    if force_python:
        orig = D._try_native_beam
        D._try_native_beam = lambda *a, **k: None
    try:
        D.beam_ctc_decode(logits[0], charset, blank_id=vocab - 1,
                          beam_width=100, lm=lm)
        t0 = time.time()
        for lp in logits:
            D.beam_ctc_decode(lp, charset, blank_id=vocab - 1,
                              beam_width=100, lm=lm)
        dt = time.time() - t0
        n, t = len(logits), logits[0].shape[0]
        print(f"{name:18s} {n} utts x T={t}, beam=100: "
              f"{dt/n*1000:8.1f} ms/utt  ({n/dt:6.2f} utt/s)",
              flush=True)
    finally:
        if orig is not None:
            D._try_native_beam = orig


def main():
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    charset = TextTransform().chars
    vocab = len(charset) + 1
    rng = np.random.default_rng(0)
    logits = [make_logits(rng, t, vocab) for _ in range(n)]

    from silent_speech_tpu.utils.native import get_lib
    have_native = get_lib() is not None

    with tempfile.TemporaryDirectory() as td:
        arpa_path, bin_path = make_lm_files(td)
        arpa = D.ArpaLM(arpa_path)
        blm = KenLMBinary(bin_path)
        prefix = "native" if have_native else "python(no .so)"
        bench(f"{prefix} no-LM", logits, charset, None)
        bench(f"{prefix} arpa", logits, charset, arpa)
        bench(f"{prefix} binary", logits, charset, blm)
        if have_native:
            few = logits[: max(2, n // 10)]
            bench("python no-LM", few, charset, None, force_python=True)
            bench("python binary", few, charset, blm, force_python=True)


if __name__ == "__main__":
    main()
