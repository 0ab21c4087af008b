"""Length-aware batch sampling.

Reference semantics (``read_emg.py:115-140``): shuffle example indices, pack
greedily into batches until the summed raw-recording EMG length (from each
example's ``info['chunks']``) would exceed ``max_len``; skip examples whose
text has no ASCII letters; drop the last partial batch. Our version reads the
lengths from the dataset's cached metadata instead of re-opening every
``info.json`` each epoch (the reference does one JSON read per example per
epoch on the hot path).
"""

from __future__ import annotations

import logging
import random
import string
from typing import Iterator, List


class SizeAwareSampler:
    def __init__(self, dataset, max_len: int, seed: int = None,
                 drop_last: bool = False):
        """``drop_last=True`` reproduces the reference exactly (the final
        partial batch is discarded, ``read_emg.py:140``); the default keeps
        it so small datasets still train."""
        self.dataset = dataset
        self.max_len = max_len
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def __iter__(self) -> Iterator[List[int]]:
        indices = list(range(len(self.dataset)))
        rng = random.Random(None if self.seed is None
                            else self.seed * 1000003 + self._epoch)
        rng.shuffle(indices)
        self._epoch += 1

        batch: List[int] = []
        batch_length = 0
        for idx in indices:
            meta = self.dataset.example_meta(idx)
            if not any(c in string.ascii_letters for c in meta["text"]):
                continue
            length = meta["emg_length"]
            if length > self.max_len:
                logging.warning(
                    "example %d cannot fit within desired batch length", idx)
            if length + batch_length > self.max_len:
                yield batch
                batch = []
                batch_length = 0
            batch.append(idx)
            batch_length += length
        if batch and not self.drop_last:
            yield batch
