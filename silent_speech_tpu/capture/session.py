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


# --------------- chunk-streamed session (reference record_reading.py) ---


def save_chunked(output_directory: str, output_idx: int, data,
                 book=None) -> None:
    """Write one captured segment in the reference schema
    (``record_reading.py:30-52``). ``book=None`` marks a silence segment
    (book '', sentence_index −1, empty text)."""
    emg, audio, button, chunk_info = data
    emg_file = os.path.join(output_directory, f"{output_idx}_emg.npy")
    assert not os.path.exists(emg_file), \
        "trying to overwrite existing file"
    np.save(emg_file, emg)
    flac_mod.write_flac(
        os.path.join(output_directory, f"{output_idx}_audio.flac"),
        np.asarray(audio, np.float32), 16000)
    np.save(os.path.join(output_directory, f"{output_idx}_button.npy"),
            np.asarray(button, bool))
    if book is None:
        bf, bi, t = "", -1, ""
    else:
        bf, bi, t = book.name, book.current_sentence_index(), \
            book.current_sentence()
    with open(os.path.join(output_directory,
                           f"{output_idx}_info.json"), "w") as f:
        json.dump({"book": bf, "sentence_index": bi, "text": t,
                   "chunks": [list(c) for c in chunk_info]}, f)


def edge_silence_segments(data):
    """First/last 500 EMG samples as silence segments
    (``record_reading.py:56-62``)."""
    emg, audio, button, chunk_info = data
    dummy_audio = np.zeros(8000, np.float32)
    dummy_button = np.zeros(500, bool)
    ci = [(500, 8000, 500)]
    return ((emg[:500], dummy_audio, dummy_button, ci),
            (emg[-500:], dummy_audio, dummy_button, ci))


class ReadingSession:
    """Key-event controller for the chunk-streamed prompter — the exact
    protocol of the reference curses UI (``record_reading.py:64-123``):

    - first keypress starts recording (a leading-silence segment),
    - ``n``/space: save the segment read since the last key (index 0 is
      the silence segment, book=None), advance the book,
    - ``r``: restart — save the edge silences, re-prompt the sentence,
    - ``q``: save the leading edge as silence and stop.

    The curses shell is a thin renderer around this class so the protocol
    is testable without a terminal.
    """

    def __init__(self, recorder, book, output_directory: str):
        self.recorder = recorder
        self.book = book
        self.output_directory = output_directory
        os.makedirs(output_directory, exist_ok=True)
        self.output_idx = 0
        self.recording = False
        self.done = False

    def current_prompt(self) -> str:
        if not self.recording:
            return "<Press any key to begin.>"
        if self.output_idx == 0:
            return "<silence>"
        return self.book.current_sentence()

    def handle_key(self, key: str) -> None:
        if self.done:
            return
        if not self.recording:
            self.recording = True
            self.recorder.get_data()  # clear the pre-roll
            return
        if key == "q":
            start, _end = edge_silence_segments(self.recorder.get_data())
            save_chunked(self.output_directory, self.output_idx, start)
            self.done = True
        elif key in ("n", " "):
            data = self.recorder.get_data()
            if self.output_idx == 0:
                save_chunked(self.output_directory, 0, data)
            else:
                save_chunked(self.output_directory, self.output_idx, data,
                             self.book)
                self.book.advance()
            self.output_idx += 1
        elif key == "r":
            if self.output_idx == 0:
                self.recorder.get_data()
            else:
                start, end = edge_silence_segments(
                    self.recorder.get_data())
                save_chunked(self.output_directory, self.output_idx, start)
                self.output_idx += 1
                save_chunked(self.output_directory, self.output_idx, end)
                self.output_idx += 1


def run_curses_session(output_directory: str, book_file: str,
                       debug: bool = True, display: bool = False) -> int:
    """The interactive curses prompter (reference record_reading.py)."""
    import curses
    import textwrap

    from .recorder import Recorder

    def loop(stdscr):
        curses.curs_set(False)
        stdscr.nodelay(True)
        text_win = curses.newwin(curses.LINES - 1, curses.COLS, 0, 0)

        def show(sentence):
            height, width = text_win.getmaxyx()
            text_win.clear()
            for i, line in enumerate(textwrap.wrap(sentence, width)):
                if i >= height:
                    break
                text_win.addstr(i, 0, line)
            text_win.refresh()

        with Recorder(debug=debug, display=display) as recorder, \
                Book(book_file) as book:
            session = ReadingSession(recorder, book, output_directory)
            stdscr.clear()
            stdscr.addstr(0, 0, session.current_prompt())
            stdscr.refresh()
            while not session.done and not book.done():
                recorder.update()
                c = stdscr.getch()
                if c < 0:
                    continue
                was_recording = session.recording
                session.handle_key(chr(c) if 0 <= c < 256 else "")
                if not was_recording and session.recording:
                    stdscr.addstr(
                        curses.LINES - 1, 0,
                        "Type 'q' to quit, 'n' or ' ' for next, "
                        "'r' to restart segment")
                show(session.current_prompt())
                stdscr.refresh()
            return session.output_idx

    return curses.wrapper(loop)


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_directory", required=True)
    p.add_argument("--book_file", required=True)
    p.add_argument("--debug", action="store_true",
                   help="use the synthetic board (no hardware)")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--curses", action="store_true",
                   help="reference-style curses prompter with "
                        "button-marked chunked recording")
    p.add_argument("--display", action="store_true",
                   help="live signal scope (matplotlib)")
    args = p.parse_args()
    if args.curses:
        run_curses_session(args.output_directory, args.book_file,
                           debug=args.debug, display=args.display)
    else:
        run_session(args.output_directory, args.book_file,
                    debug=args.debug,
                    seconds_per_sentence=args.seconds)


if __name__ == "__main__":
    main()
