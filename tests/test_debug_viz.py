"""Debug visualization equivalents of the reference's matplotlib modes
(``align.py:28-32``, ``data_utils.py:113-130``)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from silent_speech_tpu.utils.debug_viz import (  # noqa: E402
    plot_alignment, plot_emg_features)


def test_plot_alignment_binary_path(tmp_path):
    align = [0, 0, 1, 2, 2, 3]
    out = plot_alignment(align, save_path=str(tmp_path / "a.png"))
    assert (tmp_path / "a.png").stat().st_size > 0
    assert out == str(tmp_path / "a.png")


def test_plot_alignment_over_costs(tmp_path):
    rng = np.random.default_rng(0)
    costs = rng.uniform(size=(6, 5))
    align = [0, 1, 2, 3, 4, 4]
    plot_alignment(align, costs=costs, save_path=str(tmp_path / "c.png"))
    assert (tmp_path / "c.png").stat().st_size > 0


def test_plot_emg_features_multichannel(tmp_path):
    rng = np.random.default_rng(1)
    emg = rng.normal(size=(400, 8))
    plot_emg_features(emg, channel=3, save_path=str(tmp_path / "f.png"))
    assert (tmp_path / "f.png").stat().st_size > 0


def test_plot_emg_features_single_channel(tmp_path):
    rng = np.random.default_rng(2)
    plot_emg_features(rng.normal(size=300),
                      save_path=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").stat().st_size > 0
