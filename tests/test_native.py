"""Native C++ runtime (cpp/libssp_native.so): FLAC decode, CTC beam, DTW.

The library is built on demand with the in-repo Makefile; tests verify the
native implementations agree with the pure-Python/JAX ones.
"""

import numpy as np
import pytest

from silent_speech_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.build():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_native_flac_matches_python(lib, tmp_path):
    from silent_speech_tpu.utils import flac as pyflac

    rng = np.random.default_rng(0)
    audio = rng.uniform(-0.8, 0.8, size=22050)
    path = str(tmp_path / "t.flac")
    pyflac.write_flac(path, audio, 22050, blocksize=4096)

    got, rate = native.read_flac(path)
    assert rate == 22050
    with open(path, "rb") as f:
        expected, _ = pyflac.read_flac_bytes(f.read())
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_native_flac_stereo(lib, tmp_path):
    from silent_speech_tpu.utils import flac as pyflac

    rng = np.random.default_rng(1)
    audio = rng.uniform(-0.5, 0.5, size=(9000, 2))
    path = str(tmp_path / "s.flac")
    pyflac.write_flac(path, audio, 16000)
    got, rate = native.read_flac(path)
    assert rate == 16000
    assert got.shape == (9000, 2)
    np.testing.assert_allclose(got, audio, atol=2e-4)


def test_native_beam_matches_python(lib):
    from silent_speech_tpu.eval.decode import beam_ctc_decode

    chars = "abcdefghijklmnopqrstuvwxyz0123456789 "
    blank = len(chars)
    rng = np.random.default_rng(2)
    for trial in range(5):
        logits = rng.normal(size=(30, blank + 1)) * 2.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        native_ids = native.ctc_beam_decode(lp, chars, blank,
                                            beam_width=16, beta=1.85)
        # Python fallback (force by bypassing the native path)
        from silent_speech_tpu.eval import decode as dec

        orig = dec._try_native_beam
        dec._try_native_beam = lambda *a, **k: None
        try:
            py_ids = beam_ctc_decode(lp, chars, blank, beam_width=16,
                                     beta=1.85)
        finally:
            dec._try_native_beam = orig
        assert native_ids == py_ids, f"trial {trial}"


def test_native_dtw_matches_oracle(lib):
    from silent_speech_tpu.ops.dtw import align_from_distances_numpy

    rng = np.random.default_rng(3)
    costs = rng.uniform(0.5, 2.0, size=(50, 64)).astype(np.float32)
    align, cost = native.dtw_align_host(costs)
    expected = align_from_distances_numpy(costs)
    assert align == expected
    assert np.isfinite(cost)
