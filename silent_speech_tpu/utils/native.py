"""ctypes bindings to the native (C++) runtime library.

The reference's native compute lives in third-party deps (SURVEY.md §2.3:
numba DTW, ctcdecode C++ beam search, libsndfile); this framework carries its
own C++ runtime in ``cpp/`` — FLAC decode and CTC beam-search decoding —
built as a single shared library ``libssp_native.so`` and bound here via
ctypes (no pybind11 in this environment). Every entry point has a pure-Python
fallback, so the native library is a fast path, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import threading
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False
_REBUILT = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "cpp", "build", "libssp_native.so")


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED, _REBUILT
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.ssp_flac_decode.restype = ctypes.c_int64
            lib.ssp_flac_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),  # out sample_rate
                ctypes.POINTER(ctypes.c_int32),  # out channels
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.ssp_free.restype = None
            lib.ssp_free.argtypes = [ctypes.c_void_p]
            lib.ssp_ctc_beam_decode.restype = ctypes.c_int32
            lib.ssp_ctc_beam_decode.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.ssp_dtw_align.restype = ctypes.c_int32
            lib.ssp_dtw_align.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.ssp_lm_load.restype = ctypes.c_int64
            lib.ssp_lm_load.argtypes = [ctypes.c_char_p]
            lib.ssp_lm_free.restype = None
            lib.ssp_lm_free.argtypes = [ctypes.c_int64]
            lib.ssp_lm_score_word.restype = ctypes.c_double
            lib.ssp_lm_score_word.argtypes = [
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
            lib.ssp_lm_load_probing.restype = ctypes.c_int64
            lib.ssp_lm_load_probing.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.ssp_ctc_beam_decode_lm.restype = ctypes.c_int32
            lib.ssp_ctc_beam_decode_lm.argtypes = [
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
        except AttributeError:
            # a stale prebuilt .so predating newer entry points (build()
            # never rebuilds an existing library): rebuild once and
            # retry; stay on the Python twins if it is still stale
            _LIB = None
            if not _REBUILT:
                _REBUILT = True
                if build(force=True):
                    return _LIB
    return _LIB


def build(force: bool = False) -> bool:
    """Compile cpp/ into libssp_native.so (returns True on success)."""
    global _LIB, _LIB_TRIED
    import subprocess

    if os.path.exists(_lib_path()) and not force:
        return True
    cpp_dir = os.path.dirname(os.path.dirname(_lib_path()))
    try:
        subprocess.run(["make", "-C", cpp_dir], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    _LIB_TRIED = False
    _LIB = None
    return get_lib() is not None


def has_flac() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "ssp_flac_decode")


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    lib = get_lib()
    assert lib is not None
    with open(path, "rb") as f:
        data = f.read()
    rate = ctypes.c_int32(0)
    channels = ctypes.c_int32(0)
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    n = lib.ssp_flac_decode(data, len(data), ctypes.byref(rate),
                            ctypes.byref(channels), ctypes.byref(out_ptr))
    if n < 0:
        raise ValueError(f"native FLAC decode failed (code {n}) for {path}")
    try:
        buf = np.ctypeslib.as_array(out_ptr, shape=(n * channels.value,))
        audio = np.array(buf, dtype=np.float64)
    finally:
        lib.ssp_free(ctypes.cast(out_ptr, ctypes.c_void_p))
    if channels.value > 1:
        audio = audio.reshape(n, channels.value)
    return audio, rate.value


def ctc_beam_decode(log_probs: np.ndarray, charset: str, blank_id: int,
                    beam_width: int = 100, alpha: float = 0.0,
                    beta: float = 0.0, prune_logp: float = -18.0,
                    space: str = " "):
    """Native no-LM prefix beam search (word bonus ``beta`` at spaces)."""
    lib = get_lib()
    assert lib is not None
    lp = np.ascontiguousarray(log_probs, dtype=np.float64)
    t, k = lp.shape
    space_id = charset.index(space) if space in charset else -1
    out = np.zeros(t, dtype=np.int32)
    n = lib.ssp_ctc_beam_decode(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t, k, blank_id, beam_width, prune_logp, beta, space_id,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), t)
    return out[:n].tolist()


_LM_HANDLES = {}
_LM_LOCK = threading.Lock()


def lm_load(path: str) -> int:
    """Load an ARPA LM into the native library (cached per path; the
    lock keeps concurrent decode threads from double-loading)."""
    lib = get_lib()
    assert lib is not None
    with _LM_LOCK:
        if path not in _LM_HANDLES:
            handle = lib.ssp_lm_load(path.encode())
            if handle == 0:
                raise ValueError(f"native ARPA load failed for {path}")
            _LM_HANDLES[path] = handle
        return _LM_HANDLES[path]


def lm_load_probing(lm) -> int:
    """Load a KenLM probing ``.binary`` into the native library from the
    layout the (tested) Python reader solved — the native side mmaps the
    same file at those offsets (cached per path)."""
    lib = get_lib()
    assert lib is not None
    path = lm.binary_path
    with _LM_LOCK:
        if path not in _LM_HANDLES:
            lay = lm.layout
            n_mid = max(lm.order - 2, 0)
            mid_offs = (ctypes.c_int64 * max(n_mid, 1))(
                *(([o for (o, _b) in lay["mid"]]) or [0]))
            mid_buckets = (ctypes.c_int64 * max(n_mid, 1))(
                *(([b for (_o, b) in lay["mid"]]) or [0]))
            handle = lib.ssp_lm_load_probing(
                path.encode(), lm.order, lay["uni_entries"],
                lay["vocab_off"], lay["vocab_buckets"], lay["uni_off"],
                mid_offs, mid_buckets, lay["longest_off"],
                lay["longest_buckets"])
            if handle == 0:
                raise ValueError(
                    f"native KenLM-binary load failed for {path}")
            _LM_HANDLES[path] = handle
        return _LM_HANDLES[path]


def lm_handle(lm) -> int:
    """Native handle for any supported LM object (ARPA or KenLM binary)."""
    if getattr(lm, "binary_path", None) is not None:
        return lm_load_probing(lm)
    return lm_load(lm.path)


def lm_score_word(path: str, context, word: str) -> float:
    lib = get_lib()
    handle = lm_load(path)
    ctx = " ".join(context)
    return lib.ssp_lm_score_word(handle, ctx.encode(), word.encode())


def ctc_beam_decode_lm(log_probs: np.ndarray, charset: str, blank_id: int,
                       lm_or_path, beam_width: int = 100,
                       alpha: float = 1.5, beta: float = 1.85,
                       prune_logp: float = -18.0):
    """Native LM-fused prefix beam search (ARPA text or KenLM probing
    binary word n-gram; pass the LM object or an ARPA path)."""
    lib = get_lib()
    assert lib is not None
    handle = lm_load(lm_or_path) if isinstance(lm_or_path, str) \
        else lm_handle(lm_or_path)
    lp = np.ascontiguousarray(log_probs, dtype=np.float64)
    t, k = lp.shape
    out = np.zeros(t, dtype=np.int32)
    n = lib.ssp_ctc_beam_decode_lm(
        handle, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        t, k, blank_id, beam_width, prune_logp, alpha, beta,
        charset.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t)
    if n < 0:
        # e.g. LM order exceeds the native context ring — the caller
        # falls back to the full-history Python decoder
        raise ValueError(
            f"native LM-fused decode refused the model (code {n})")
    return out[:n].tolist()


def dtw_align_host(costs: np.ndarray):
    """Native host DTW (reference align.py semantics); returns
    (alignment list, path cost)."""
    lib = get_lib()
    assert lib is not None
    c = np.ascontiguousarray(costs, dtype=np.float32)
    t1, t2 = c.shape
    alignment = np.zeros(t1, dtype=np.int32)
    cost = ctypes.c_double(0.0)
    lib.ssp_dtw_align(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t1, t2,
        alignment.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(cost))
    return alignment.tolist(), cost.value
