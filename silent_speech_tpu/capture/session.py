"""Recording session: prompts sentences and writes the dataset schema.

Reference: ``data_collection/record_reading.py`` — a curses prompter that
writes, per utterance i: ``{i}_emg.npy``, ``{i}_audio.flac``,
``{i}_button.npy``, and ``{i}_info.json`` with
``{book, sentence_index, text, chunks}`` (``record_reading.py:30-52``) —
the exact schema ``EMGDataset`` consumes. The interactive UI is optional;
:func:`record_utterance` is the programmatic core (used by tests with the
synthetic board).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..utils import flac as flac_mod
from .book import Book
from .recorder import Recorder


def record_utterance(recorder: Recorder, output_directory: str, index: int,
                     text: str, book_name: str, sentence_index: int,
                     seconds: float) -> dict:
    """Record one utterance and write the four schema files. Refuses to
    overwrite existing files (reference ``record_reading.py:36``)."""
    info_path = os.path.join(output_directory, f"{index}_info.json")
    assert not os.path.exists(info_path), \
        f"refusing to overwrite existing utterance {index}"
    os.makedirs(output_directory, exist_ok=True)

    emg, audio, button = recorder.record(seconds)
    np.save(os.path.join(output_directory, f"{index}_emg.npy"), emg)
    np.save(os.path.join(output_directory, f"{index}_button.npy"), button)
    flac_mod.write_flac(
        os.path.join(output_directory, f"{index}_audio.flac"),
        audio.astype(np.float32), recorder.microphone.sampling_rate)

    info = {
        "text": text,
        "book": book_name,
        "sentence_index": sentence_index,
        "chunks": [[int(emg.shape[0]), int(audio.shape[0]), 0]],
    }
    with open(info_path, "w") as f:
        json.dump(info, f)
    return info


def run_session(output_directory: str, book_file: str,
                debug: bool = True, seconds_per_sentence: float = 4.0,
                max_sentences: Optional[int] = None,
                interactive: bool = True) -> int:
    """Prompted recording loop. Returns the number of utterances recorded.

    Interactive control keys mirror the reference's: Enter = record next,
    ``r`` = re-record the previous sentence (new index, same sentence),
    ``q`` = quit.
    """
    book = Book(book_file)
    recorder = Recorder(debug=debug)
    os.makedirs(output_directory, exist_ok=True)
    existing = [int(f.split("_")[0])
                for f in os.listdir(output_directory)
                if f.endswith("_info.json")]
    index = max(existing) + 1 if existing else 0
    recorded = 0

    while not book.done():
        if max_sentences is not None and recorded >= max_sentences:
            break
        text = book.current_sentence()
        if interactive:
            print(f"\n[{book.current_sentence_index()}] {text}")
            cmd = input("Enter=record  r=redo-prev  q=quit > ").strip()
            if cmd == "q":
                break
            if cmd == "r" and recorded > 0:
                # re-record the previous sentence under a fresh index
                book.position = max(book.position - 1, 0)
                text = book.current_sentence()
        record_utterance(
            recorder, output_directory, index, text, book.name,
            book.current_sentence_index(), seconds_per_sentence)
        index += 1
        recorded += 1
        book.advance()
    return recorded


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--book_file", required=True)
    p.add_argument("--debug", action="store_true",
                   help="use the synthetic board (no hardware)")
    p.add_argument("--seconds", type=float, default=4.0)
    args = p.parse_args()
    run_session(args.output_directory, args.book_file, debug=args.debug,
                seconds_per_sentence=args.seconds)


if __name__ == "__main__":
    main()
