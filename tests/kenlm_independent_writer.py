"""Independent KenLM probing-binary writer (cross-check for the reader).

``tests/test_kenlm_binary.py::write_probing_binary`` emits the layout the
reader documents — a shared misunderstanding would pass both. This module
re-derives the layout the way KenLM's own sources do (VERDICT round-2
item 6): every section size comes from a simulated C struct layout
(natural alignment rules, plus KenLM's ``#pragma pack(4)`` on its
mmap-entry structs) and the size arithmetic of ``lm/binary_format.cc`` /
``lm/vocab.cc`` / ``lm/search_hashed.hh`` / ``util/probing_hash_table.hh``,
not from the reader's documented offsets:

- ``util::ProbingHashTable::Size(entries, mult)`` =
  ``max(entries + 1, ceil-free float multiply) * sizeof(Entry)``
- ``lm/binary_format.cc TotalHeaderSize(order)`` =
  ``ALIGN8(sizeof(Sanity) + sizeof(FixedWidthParameters) + 8 * order)``
- ``lm/vocab.cc ProbingVocabulary::Size`` =
  ``ALIGN8(sizeof(ProbingVocabularyHeader)) + Lookup::Size(...)`` and the
  vocab region is padded to 8 before the search tables (``vocab_pad_``)
- ``lm/search_hashed.hh Unigram::Size`` = ``(count + 1) * 8`` (the +1 is
  KenLM's end-pointer slot)

The only shared code with the reader is the hash pair
(MurmurHash64A / CombineWordHash) — those are cross-validated separately
against the independent C++ implementations in ``cpp/probing_lm.cc``.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

MAGIC_STRING = b"mmap lm http://kheafield.com/code format version 5\n\x00"


# ---------------------------------------------------------------------------
# struct-layout calculator: sizes/offsets from C alignment rules, so the
# numbers 88/20/12/16 are DERIVED here, not copied from the reader.
def _layout(fields: List[Tuple[str, int, int]], pack: int = 0
            ) -> Tuple[Dict[str, int], int]:
    """fields = [(name, size, natural_align)]; pack>0 caps alignment the
    way ``#pragma pack(n)`` does. Returns ({name: offset}, sizeof)."""
    offs = {}
    off = 0
    max_align = 1
    for name, size, align in fields:
        if pack:
            align = min(align, pack)
        max_align = max(max_align, align)
        off = -(-off // align) * align
        offs[name] = off
        off += size
    return offs, -(-off // max_align) * max_align


def _align8(x: int) -> int:
    return -(-x // 8) * 8


# lm/binary_format.hh struct Sanity
_SANITY_FIELDS = [
    ("magic", _align8(len(MAGIC_STRING)), 1),  # char[ALIGN8(53)]
    ("zero_f", 4, 4), ("one_f", 4, 4), ("minus_half_f", 4, 4),
    ("one_word_index", 4, 4), ("max_word_index", 4, 4),
    ("one_uint64", 8, 8),
]
SANITY_OFFS, SANITY_SIZE = _layout(_SANITY_FIELDS)

# lm/binary_format.hh struct FixedWidthParameters
_PARAMS_FIELDS = [
    ("order", 1, 1),
    ("probing_multiplier", 4, 4),
    ("model_type", 4, 4),          # enum -> int
    ("has_vocabulary", 1, 1),
    ("search_version", 4, 4),
]
PARAMS_OFFS, PARAMS_SIZE = _layout(_PARAMS_FIELDS)

# mmap entry structs (#pragma pack(4) in lm/vocab.hh, lm/search_hashed.hh)
_, VOCAB_ENTRY_SIZE = _layout(
    [("key", 8, 8), ("value", 4, 4)], pack=4)           # u64 hash, u32 id
_, MIDDLE_ENTRY_SIZE = _layout(
    [("key", 8, 8), ("prob", 4, 4), ("backoff", 4, 4)], pack=4)
_, LONGEST_ENTRY_SIZE = _layout(
    [("key", 8, 8), ("prob", 4, 4)], pack=4)
_, PROB_BACKOFF_SIZE = _layout([("prob", 4, 4), ("backoff", 4, 4)])
_, VOCAB_HEADER_SIZE = _layout([("bound", 8, 8)])


def probing_table_size(entries: int, multiplier: float,
                       entry_size: int) -> Tuple[int, int]:
    """util/probing_hash_table.hh Size(): buckets and byte size."""
    buckets = max(entries + 1, int(multiplier * float(entries)))
    return buckets, buckets * entry_size


def total_header_size(order: int) -> int:
    """lm/binary_format.cc TotalHeaderSize."""
    return _align8(SANITY_SIZE + PARAMS_SIZE + 8 * order)


# ---------------------------------------------------------------------------
# hashes (cross-validated against the independent C++ pair in
# cpp/probing_lm.cc by tests/test_native_probing_lm.py)
def murmur64a(data: bytes, seed: int = 0) -> int:
    m = 0xC6A4A7935BD1E995
    mask = (1 << 64) - 1
    h = (seed ^ ((len(data) * m) & mask)) & mask
    for i in range(0, len(data) - 7, 8):
        (k,) = struct.unpack_from("<Q", data, i)
        k = (k * m) & mask
        k ^= k >> 47
        k = (k * m) & mask
        h = ((h ^ k) * m) & mask
    tail = data[len(data) - (len(data) & 7):]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & mask
    h ^= h >> 47
    h = (h * m) & mask
    h ^= h >> 47
    return h


def chained_hash(ids: List[int]) -> int:
    mask = (1 << 64) - 1
    h = ids[-1] & mask
    for w in reversed(ids[:-1]):
        h = ((h * 8978948897894561157) & mask) \
            ^ (((1 + w) * 17894857484156487943) & mask)
    return h


# ---------------------------------------------------------------------------
def write_binary(path: str, order: int, counts: List[int],
                 ngrams: Dict[int, Dict[Tuple[str, ...],
                                        Tuple[float, float]]],
                 multiplier: float = 1.5,
                 with_strings: bool = True) -> Dict[str, int]:
    """Serialize an n-gram model to KenLM probing-binary v5 layout.

    Returns the section offsets it computed (for cross-checking against
    the reader's independently solved layout).
    """
    word_ids: Dict[str, int] = {}
    uni_order: List[str] = []
    next_id = 1
    for (w,) in ngrams[1]:
        uni_order.append(w)
        if w in ("<unk>", "<UNK>"):
            word_ids[w] = 0
        else:
            word_ids[w] = next_id
            next_id += 1

    blob = bytearray()

    # --- header: Sanity + FixedWidthParameters + counts, ALIGN8
    sanity = bytearray(SANITY_SIZE)
    sanity[SANITY_OFFS["magic"]:
           SANITY_OFFS["magic"] + len(MAGIC_STRING)] = MAGIC_STRING
    struct.pack_into("<f", sanity, SANITY_OFFS["zero_f"], 0.0)
    struct.pack_into("<f", sanity, SANITY_OFFS["one_f"], 1.0)
    struct.pack_into("<f", sanity, SANITY_OFFS["minus_half_f"], -0.5)
    struct.pack_into("<I", sanity, SANITY_OFFS["one_word_index"], 1)
    struct.pack_into("<I", sanity, SANITY_OFFS["max_word_index"],
                     0xFFFFFFFF)
    struct.pack_into("<Q", sanity, SANITY_OFFS["one_uint64"], 1)
    blob += sanity

    params = bytearray(PARAMS_SIZE)
    struct.pack_into("<B", params, PARAMS_OFFS["order"], order)
    struct.pack_into("<f", params, PARAMS_OFFS["probing_multiplier"],
                     multiplier)
    struct.pack_into("<i", params, PARAMS_OFFS["model_type"], 0)  # PROBING
    struct.pack_into("<B", params, PARAMS_OFFS["has_vocabulary"],
                     1 if with_strings else 0)
    struct.pack_into("<I", params, PARAMS_OFFS["search_version"], 0)
    blob += params

    blob += struct.pack(f"<{order}Q", *counts)
    blob += b"\x00" * (total_header_size(order) - len(blob))
    assert len(blob) == total_header_size(order)

    # --- vocab: ALIGN8(header) + probing table, region padded to 8
    layout = {}
    blob += struct.pack("<Q", next_id)          # ProbingVocabularyHeader
    blob += b"\x00" * (_align8(VOCAB_HEADER_SIZE) - VOCAB_HEADER_SIZE)
    layout["vocab_off"] = len(blob)
    vb, vsize = probing_table_size(counts[0], multiplier,
                                   VOCAB_ENTRY_SIZE)
    layout["vocab_buckets"] = vb
    vtab = bytearray(vsize)

    def insert(tab: bytearray, buckets: int, entry_size: int, key: int,
               payload: bytes) -> None:
        i = key % buckets
        while True:
            (k,) = struct.unpack_from("<Q", tab, i * entry_size)
            if k == 0:
                break
            i = (i + 1) % buckets
        struct.pack_into("<Q", tab, i * entry_size, key)
        tab[i * entry_size + 8: i * entry_size + entry_size] = payload

    for w, wid in word_ids.items():
        if wid == 0:
            continue
        insert(vtab, vb, VOCAB_ENTRY_SIZE, murmur64a(w.encode()),
               struct.pack("<I", wid))
    blob += vtab
    blob += b"\x00" * (_align8(len(blob)) - len(blob))   # vocab_pad_

    # --- unigram: (count + 1) ProbBackoff slots, by word id
    layout["uni_off"] = len(blob)
    layout["uni_entries"] = counts[0] + 1
    uni = np.zeros((counts[0] + 1, 2), np.float32)
    for (w,), (p, bo) in ngrams[1].items():
        uni[word_ids[w]] = (p, bo)
    assert PROB_BACKOFF_SIZE == 8
    blob += uni.tobytes()

    # --- middle tables (orders 2..order-1)
    layout["mid"] = []
    for n in range(2, order):
        b, size = probing_table_size(counts[n - 1], multiplier,
                                     MIDDLE_ENTRY_SIZE)
        layout["mid"].append((len(blob), b))
        tab = bytearray(size)
        for words, (p, bo) in ngrams.get(n, {}).items():
            ids = [word_ids[w] for w in words]
            insert(tab, b, MIDDLE_ENTRY_SIZE, chained_hash(ids),
                   struct.pack("<ff", p, bo))
        blob += tab

    # --- longest table
    if order >= 2:
        b, size = probing_table_size(counts[order - 1], multiplier,
                                     LONGEST_ENTRY_SIZE)
        layout["longest_off"] = len(blob)
        layout["longest_buckets"] = b
        tab = bytearray(size)
        for words, (p, _bo) in ngrams.get(order, {}).items():
            ids = [word_ids[w] for w in words]
            insert(tab, b, LONGEST_ENTRY_SIZE, chained_hash(ids),
                   struct.pack("<f", p))
        blob += tab
    else:
        layout["longest_off"] = 0
        layout["longest_buckets"] = 0

    if with_strings:
        blob += b"\x00".join(w.encode() for w in uni_order) + b"\x00"

    with open(path, "wb") as f:
        f.write(bytes(blob))
    return layout
