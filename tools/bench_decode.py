"""CTC beam-decode throughput at validation-realistic sizes.

The reference decodes every dev utterance per epoch with
beam_width=100 over a 37-char vocabulary (``recognition_model.py:34``,
``data_utils.py:157``). This measures both the native C++ decoder and
the pure-Python fallback on the same logits so the fallback's cost is a
recorded number, not a surprise.

Run: python tools/bench_decode.py [n_utts] [t]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from silent_speech_tpu.eval import decode as D
from silent_speech_tpu.text import TextTransform


def make_logits(rng, t, vocab):
    """Peaked-but-noisy log-probs resembling a trained CTC head."""
    x = rng.normal(size=(t, vocab)) * 1.5
    x[np.arange(t), rng.integers(0, vocab, size=t)] += 4.0
    x = x - np.log(np.exp(x).sum(-1, keepdims=True))
    return x.astype(np.float32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    charset = TextTransform().chars
    vocab = len(charset) + 1
    rng = np.random.default_rng(0)
    logits = [make_logits(rng, t, vocab) for _ in range(n)]

    from silent_speech_tpu.utils.native import get_lib
    have_native = get_lib() is not None
    variants = [("native" if have_native else "python(no .so)", dict())]
    if have_native:
        variants.append(("python", dict(force_python=True)))

    for name, kw in variants:
        force = kw.get("force_python", False)
        orig = None
        if force:
            orig = D._try_native_beam
            D._try_native_beam = lambda *a, **k: None
        try:
            # warmup
            D.beam_ctc_decode(logits[0], charset, blank_id=vocab - 1,
                              beam_width=100)
            t0 = time.time()
            for lp in logits:
                D.beam_ctc_decode(lp, charset, blank_id=vocab - 1, beam_width=100)
            dt = time.time() - t0
            print(f"{name:16s} {n} utts x T={t}, beam=100: "
                  f"{dt/n*1000:8.1f} ms/utt  ({n/dt:6.2f} utt/s)",
                  flush=True)
        finally:
            if orig is not None:
                D._try_native_beam = orig


if __name__ == "__main__":
    main()
