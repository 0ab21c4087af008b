"""Text normalization, the character codec, and WER/CER metrics.

Replaces the reference's jiwer + unidecode dependency stack
(``data_utils.py:243-258``, ``asr_evaluation.py:27-32``,
``recognition_model.py:58``) with self-contained implementations:

- :func:`ascii_transliterate` — unidecode-style best-effort ASCII folding
  (NFKD decomposition + a table of common non-decomposable characters),
- :class:`TextTransform` — punctuation removal + lowercasing over the 37-symbol
  charset ``a-z0-9<space>`` (reference ``data_utils.py:246``),
- :func:`wer` — corpus word error rate, matching jiwer's definition
  (total edit distance over total reference words).
"""

from __future__ import annotations

import string
import unicodedata
from typing import Iterable, List, Sequence, Union

# Characters NFKD cannot decompose to ASCII; the subset of unidecode's table
# that matters for English book text.
_TRANSLIT = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ß": "ss", "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th", "ł": "l", "Ł": "L",
    "—": "-", "–": "-", "―": "-", "‘": "'", "’": "'", "‚": ",",
    "“": '"', "”": '"', "„": '"', "…": "...", "•": "*",
    " ": " ", " ": " ", " ": " ", " ": " ",
    " ": " ", " ": " ",
}


def ascii_transliterate(text: str) -> str:
    """Best-effort Unicode→ASCII folding (unidecode-equivalent for our data)."""
    out: List[str] = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _TRANSLIT:
            out.append(_TRANSLIT[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append("".join(c for c in kept if ord(c) < 128))
    return "".join(out)


def remove_punctuation(text: str) -> str:
    """jiwer.RemovePunctuation semantics: strip ``string.punctuation`` chars."""
    return text.translate(str.maketrans("", "", string.punctuation))


class TextTransform:
    """37-symbol character codec (reference ``data_utils.py:243-258``)."""

    def __init__(self) -> None:
        self.chars = string.ascii_lowercase + string.digits + " "
        self._index = {c: i for i, c in enumerate(self.chars)}

    def clean_text(self, text: str) -> str:
        text = ascii_transliterate(text)
        text = remove_punctuation(text)
        return text.lower()

    def text_to_int(self, text: str) -> List[int]:
        text = self.clean_text(text)
        return [self._index[c] for c in text]

    def int_to_text(self, ints: Iterable[int]) -> str:
        return "".join(self.chars[i] for i in ints)


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ri = ref[i - 1]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ri != hyp[j - 1])
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return prev[m]


def _as_list(x: Union[str, Sequence[str]]) -> List[str]:
    return [x] if isinstance(x, str) else list(x)


def wer(references: Union[str, Sequence[str]],
        hypotheses: Union[str, Sequence[str]]) -> float:
    """Corpus WER = sum(edit distances) / sum(reference word counts).

    Matches ``jiwer.wer`` on lists of sentences (reference
    ``recognition_model.py:58``, ``asr_evaluation.py:32``).
    """
    refs, hyps = _as_list(references), _as_list(hypotheses)
    assert len(refs) == len(hyps), "mismatched reference/hypothesis counts"
    total_dist = 0
    total_words = 0
    for r, h in zip(refs, hyps):
        rw, hw = r.split(), h.split()
        total_dist += edit_distance(rw, hw)
        total_words += len(rw)
    if total_words == 0:
        return 0.0
    return total_dist / total_words


def cer(references: Union[str, Sequence[str]],
        hypotheses: Union[str, Sequence[str]]) -> float:
    """Corpus character error rate."""
    refs, hyps = _as_list(references), _as_list(hypotheses)
    total = sum(edit_distance(list(r), list(h)) for r, h in zip(refs, hyps))
    nchars = sum(len(r) for r in refs)
    return total / nchars if nchars else 0.0
