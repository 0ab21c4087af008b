"""CTC decoding: greedy (on-device) and LM-fused prefix beam search (host).

Replaces the reference's third-party ``ctcdecode`` C++ beam decoder + KenLM
(``recognition_model.py:6,34-35``; α=1.5, β=1.85 word-insertion weights).
Decoding is eval-only — never in the training hot loop — so the beam search
runs on the host: a C++ implementation (``cpp/ctc_beam.cc``) is used when the
native library is built, with this pure-Python prefix beam search as the
always-available fallback. The language model is a word n-gram with back-off
loaded from either an ARPA text file (this module) or a KenLM probing
``.binary`` (:mod:`.kenlm_binary` — the reference's canonical eval LM); both
kinds decode through the native beam (``cpp/arpa_lm.cc`` /
``cpp/probing_lm.cc``).
"""

from __future__ import annotations

import gzip
import math
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

LOG10 = math.log(10.0)
NEG_INF = -float("inf")


def greedy_ctc_decode(log_probs: np.ndarray, blank_id: int,
                      length: Optional[int] = None) -> List[int]:
    """Best-path decode of one utterance: argmax, collapse, strip blanks."""
    ids = np.asarray(log_probs).argmax(axis=-1)
    if length is not None:
        ids = ids[:length]
    out: List[int] = []
    prev = -1
    for i in ids.tolist():
        if i != prev and i != blank_id:
            out.append(i)
        prev = i
    return out


class ArpaLM:
    """Word n-gram LM with back-off, loaded from an ARPA file (.arpa/.gz).

    Scores are natural-log (ARPA stores log10). Unknown words fall back to
    ``<unk>`` if present, else a floor score.
    """

    def __init__(self, path: str, unk_floor: float = -10.0 * LOG10):
        self.ngrams: Dict[int, Dict[Tuple[str, ...],
                                    Tuple[float, float]]] = {}
        self.order = 0
        self.unk_floor = unk_floor
        self.path = path  # lets the native decoder load the same model
        self._load(path)

    def _load(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            section = 0
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line.startswith("\\") and "-grams:" in line:
                    section = int(line[1:line.index("-")])
                    self.order = max(self.order, section)
                    self.ngrams.setdefault(section, {})
                    continue
                if line.startswith("\\") or line.startswith("ngram ") \
                        or line == "\\data\\":
                    if line == "\\end\\":
                        break
                    continue
                if section == 0:
                    continue
                parts = line.split("\t")
                if len(parts) < 2:
                    parts = line.split()
                    if len(parts) < section + 1:
                        continue
                    logp = float(parts[0])
                    words = tuple(parts[1: 1 + section])
                    backoff = float(parts[1 + section]) \
                        if len(parts) > 1 + section else 0.0
                else:
                    logp = float(parts[0])
                    words = tuple(parts[1].split())
                    backoff = float(parts[2]) if len(parts) > 2 else 0.0
                self.ngrams[section][words] = (logp * LOG10,
                                               backoff * LOG10)

    def score_word(self, context: Sequence[str], word: str) -> float:
        """log P(word | context) with Katz back-off."""
        context = tuple(context)[-(self.order - 1):] if self.order > 1 \
            else ()
        while True:
            ngram = tuple(context) + (word,)
            entry = self.ngrams.get(len(ngram), {}).get(ngram)
            if entry is not None:
                return entry[0]
            if not context:
                uni = self.ngrams.get(1, {})
                if (word,) in uni:
                    return uni[(word,)][0]
                if ("<unk>",) in uni:
                    return uni[("<unk>",)][0]
                return self.unk_floor
            # back-off: weight of the context ngram + shorter context
            boff = self.ngrams.get(len(context), {}).get(tuple(context))
            backoff_w = boff[1] if boff is not None else 0.0
            return backoff_w + self.score_word(context[1:], word)

    def score_sentence(self, words: Sequence[str]) -> float:
        ctx: List[str] = ["<s>"]
        total = 0.0
        for w in words:
            total += self.score_word(ctx, w)
            ctx.append(w)
        return total


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def beam_ctc_decode(log_probs: np.ndarray, charset: str, blank_id: int,
                    beam_width: int = 100, lm: Optional[ArpaLM] = None,
                    alpha: float = 1.5, beta: float = 1.85,
                    space: str = " ", length: Optional[int] = None,
                    prune_logp: float = -18.0) -> List[int]:
    """Prefix beam search with word-boundary LM fusion.

    Follows the ctcdecode/parlance scoring convention the reference uses
    (``recognition_model.py:34-35``): when a prefix completes a word (space
    emitted or end of utterance), add ``alpha·logP_lm(word|ctx) + beta``.
    Tries the native C++ decoder first; falls back to Python.
    """
    lp = np.asarray(log_probs, dtype=np.float64)
    if length is not None:
        lp = lp[:length]

    native = _try_native_beam(lp, charset, blank_id, beam_width, lm, alpha,
                              beta)
    if native is not None:
        return native
    _warn_python_fallback_once()

    def lm_word_bonus(words: Tuple[str, ...], word: str) -> float:
        if lm is None or not word:
            return beta if word else 0.0
        ctx = ("<s>",) + words
        return alpha * lm.score_word(ctx, word) + beta

    # beams: prefix(tuple ints) -> (p_blank, p_nonblank, words, cur_word)
    Beam = Tuple[float, float, Tuple[str, ...], str]
    beams: Dict[Tuple[int, ...], Beam] = {
        (): (0.0, NEG_INF, (), "")}

    for t in range(lp.shape[0]):
        frame = lp[t]
        # prune candidate symbols for speed
        cand = np.where(frame >= frame.max() + prune_logp)[0]
        new_beams: Dict[Tuple[int, ...], Beam] = {}

        def merge(prefix, pb, pnb, words, cur):
            old = new_beams.get(prefix)
            if old is None:
                new_beams[prefix] = (pb, pnb, words, cur)
            else:
                new_beams[prefix] = (
                    _logsumexp2(old[0], pb), _logsumexp2(old[1], pnb),
                    old[2], old[3])

        for prefix, (pb, pnb, words, cur) in beams.items():
            p_total = _logsumexp2(pb, pnb)
            for s in cand.tolist():
                p = float(frame[s])
                if s == blank_id:
                    merge(prefix, p_total + p, NEG_INF, words, cur)
                    continue
                ch = charset[s]
                last = prefix[-1] if prefix else None
                if s == last:
                    # repeat: extend only from blank; stay only from nonblank
                    merge(prefix, NEG_INF, pnb + p, words, cur)
                    new_prefix = prefix + (s,)
                    merge(new_prefix, NEG_INF, pb + p, words, cur + ch)
                else:
                    new_prefix = prefix + (s,)
                    if ch == space:
                        bonus = lm_word_bonus(words, cur)
                        merge(new_prefix, NEG_INF, p_total + p + bonus,
                              words + ((cur,) if cur else ()), "")
                    else:
                        merge(new_prefix, NEG_INF, p_total + p, words,
                              cur + ch)

        scored = sorted(
            new_beams.items(),
            key=lambda kv: -_logsumexp2(kv[1][0], kv[1][1]))
        beams = dict(scored[:beam_width])

    def final_score(entry):
        prefix, (pb, pnb, words, cur) = entry
        s = _logsumexp2(pb, pnb)
        if cur:  # close the trailing word
            s += lm_word_bonus(words, cur)
        return s

    best = max(beams.items(), key=final_score)
    return list(best[0])


_WARNED_FALLBACK = False


def _warn_python_fallback_once() -> None:
    """The C++ decoder is ~50× the Python fallback at beam_width=100; a
    silently missing ``libssp_native.so`` would turn per-epoch validation
    into minutes — say so once."""
    global _WARNED_FALLBACK
    if _WARNED_FALLBACK:
        return
    _WARNED_FALLBACK = True
    import logging

    from ..utils import native

    if native.get_lib() is None:
        logging.warning(
            "native beam decoder unavailable (libssp_native.so not "
            "built) — falling back to the pure-Python prefix beam "
            "search, which is dramatically slower at realistic beam "
            "widths. Build it with `make -C cpp`.")


def native_beam_usable(lm) -> bool:
    """True iff ``beam_ctc_decode`` would take the native C++ path for
    this LM — the signal callers use to decide whether threading the
    decode across cores pays off (the native call releases the GIL;
    the Python fallback is GIL-bound)."""
    from ..utils import native

    lib = native.get_lib()
    if lib is None:
        return False
    if lm is None:
        return True
    # both LM kinds decode natively when they expose a path AND fit the
    # native context ring (order <= 10 — cpp/arpa_lm.cc kMaxCtx); KenLM
    # probing binaries additionally need the solved layout
    # (cpp/probing_lm.cc mmaps the file at those offsets)
    if getattr(lm, "binary_path", None) is not None:
        return (getattr(lm, "layout", None) is not None
                and getattr(lm, "order", 0) <= 10
                and hasattr(lib, "ssp_lm_load_probing"))
    return (getattr(lm, "path", None) is not None
            and getattr(lm, "order", 0) <= 10)


def _try_native_beam(lp, charset, blank_id, beam_width, lm, alpha, beta):
    try:
        from ..utils import native

        lib = native.get_lib()
        if lib is None:
            return None
        if lm is None:
            return native.ctc_beam_decode(lp, charset, blank_id,
                                          beam_width, alpha, beta)
        if not native_beam_usable(lm):
            return None
        return native.ctc_beam_decode_lm(lp, charset, blank_id, lm,
                                         beam_width, alpha, beta)
    except Exception:
        return None
