"""EMG + microphone capture.

Reference: ``data_collection/record_data.py`` — an OpenBCI Cyton board via
BrainFlow (WiFi 1 kHz / serial 250 Hz / synthetic debug board) pumped
alongside a 16 kHz microphone stream, with sample-drop detection and a
button-press channel. Hardware SDKs are optional here; the synthetic board
(the reference's ``debug=True`` backend, ``record_data.py:63-65``) is always
available so the full capture→clean→train pipeline can be exercised without
hardware.
"""

from __future__ import annotations

import logging
import time
from typing import List, Optional, Tuple

import numpy as np

EMG_CHANNELS = 8


class SyntheticBoard:
    """Fake EMG board: 1 kHz, 8 channels of shaped noise + mains hum,
    plus a button channel (mirrors BrainFlow's synthetic board role)."""

    def __init__(self, sampling_rate: int = 1000, seed: int = 0):
        self.sampling_rate = sampling_rate
        self._rng = np.random.default_rng(seed)
        self._t0: Optional[float] = None
        self._consumed = 0

    def start_stream(self) -> None:
        self._t0 = time.monotonic()
        self._consumed = 0

    def stop_stream(self) -> None:
        self._t0 = None

    def get_board_data(self) -> np.ndarray:
        """(channels+1, n_new) — EMG rows then the button row."""
        assert self._t0 is not None, "stream not started"
        avail = int((time.monotonic() - self._t0) * self.sampling_rate)
        n = max(avail - self._consumed, 0)
        self._consumed += n
        t = (np.arange(n) + self._consumed) / self.sampling_rate
        emg = self._rng.normal(size=(EMG_CHANNELS, n)) * 30
        emg += 5 * np.sin(2 * np.pi * 60 * t)[None, :]
        button = np.zeros((1, n))
        return np.concatenate([emg, button], axis=0)


class BrainFlowBoard:
    """Real OpenBCI capture via BrainFlow (optional dependency).

    ``mode``: 'wifi' (1 kHz Cyton+WiFi shield), 'serial' (250 Hz dongle).
    """

    def __init__(self, mode: str = "wifi", ip_port: int = 6677,
                 serial_port: str = "/dev/ttyUSB0"):
        try:
            from brainflow.board_shim import (  # type: ignore
                BoardShim, BrainFlowInputParams, BoardIds,
            )
        except ImportError as e:
            raise ImportError(
                "brainflow is not installed; use SyntheticBoard for "
                "hardware-free capture") from e
        params = BrainFlowInputParams()
        if mode == "wifi":
            params.ip_port = ip_port
            board_id = BoardIds.CYTON_WIFI_BOARD.value
            self.sampling_rate = 1000
        else:
            params.serial_port = serial_port
            board_id = BoardIds.CYTON_BOARD.value
            self.sampling_rate = 250
        self._shim = BoardShim(board_id, params)
        self._shim.prepare_session()
        from brainflow.board_shim import BoardShim as BS

        self._emg_rows = BS.get_emg_channels(board_id)[:EMG_CHANNELS]
        self._analog_rows = BS.get_analog_channels(board_id)[:1]

    def start_stream(self) -> None:
        self._shim.start_stream()

    def stop_stream(self) -> None:
        self._shim.stop_stream()
        self._shim.release_session()

    def get_board_data(self) -> np.ndarray:
        data = self._shim.get_board_data()
        rows = list(self._emg_rows) + list(self._analog_rows)
        return data[rows]


class Microphone:
    """16 kHz mono microphone via sounddevice (optional dependency)."""

    def __init__(self, sampling_rate: int = 16000):
        import sounddevice as sd  # type: ignore

        self.sampling_rate = sampling_rate
        self._chunks: List[np.ndarray] = []
        self._stream = sd.InputStream(
            samplerate=sampling_rate, channels=1,
            callback=self._on_audio)

    def _on_audio(self, indata, frames, time_info, status):
        if status:
            logging.warning("audio status: %s", status)
        self._chunks.append(indata[:, 0].copy())

    def start_stream(self):
        self._chunks = []
        self._stream.start()

    def stop_stream(self):
        self._stream.stop()

    def get_audio(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0, dtype=np.float32)
        out = np.concatenate(self._chunks)
        self._chunks = []
        return out


class SyntheticMicrophone:
    """Hardware-free microphone producing low-level noise."""

    sampling_rate = 16000

    def __init__(self, seed: int = 0):
        self._rng = np.random.default_rng(seed)
        self._t0: Optional[float] = None
        self._consumed = 0

    def start_stream(self):
        self._t0 = time.monotonic()
        self._consumed = 0

    def stop_stream(self):
        self._t0 = None

    def get_audio(self) -> np.ndarray:
        avail = int((time.monotonic() - self._t0) * self.sampling_rate)
        n = max(avail - self._consumed, 0)
        self._consumed += n
        return (0.01 * self._rng.normal(size=n)).astype(np.float32)


class Recorder:
    """Pumps EMG + audio streams for one utterance at a time.

    Reference ``Recorder`` behaviors kept: chunked draining of the board
    buffer, sample-drop detection against wall-clock expectation
    (``record_data.py:152-155``), and a button channel carried alongside
    the EMG rows.
    """

    def __init__(self, debug: bool = True, board=None, microphone=None):
        if board is None:
            board = SyntheticBoard() if debug else BrainFlowBoard()
        if microphone is None:
            microphone = SyntheticMicrophone() if debug else Microphone()
        self.board = board
        self.microphone = microphone
        self.emg_rate = board.sampling_rate

    def record(self, seconds: float
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Record for ``seconds``; returns (emg (T,8), audio (A,),
        button (T,))."""
        self.board.start_stream()
        self.microphone.start_stream()
        t0 = time.monotonic()
        emg_parts: List[np.ndarray] = []
        while time.monotonic() - t0 < seconds:
            time.sleep(0.02)
            emg_parts.append(self.board.get_board_data())
        emg_parts.append(self.board.get_board_data())
        audio = self.microphone.get_audio()
        self.microphone.stop_stream()
        self.board.stop_stream()

        data = np.concatenate([p for p in emg_parts if p.shape[1]], axis=1)
        emg = data[:EMG_CHANNELS].T
        button = data[EMG_CHANNELS] if data.shape[0] > EMG_CHANNELS \
            else np.zeros(emg.shape[0])

        expected = seconds * self.emg_rate
        if emg.shape[0] < 0.95 * expected:
            logging.warning(
                "possible dropped samples: got %d EMG samples, expected ~%d",
                emg.shape[0], int(expected))
        return emg, audio, button
