"""The reference-compatible CLI entry points run end-to-end on the synthetic
corpus (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

from silent_speech_tpu.data.synthetic import generate_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_cli"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=5)


def _run(script, corpus, out_dir, extra=()):
    env = dict(os.environ)
    # JAX_PLATFORMS/XLA_FLAGS are consumed by sitecustomize before user code
    # runs in the child; SSTPU_FORCE_PLATFORM is honored by
    # config_from_flags() via the shared platform helper.
    env["SSTPU_FORCE_PLATFORM"] = "cpu:8"
    args = [
        sys.executable, os.path.join(REPO, script),
        "--silent_data_directories",
        ",".join(corpus.silent_data_directories),
        "--voiced_data_directories",
        ",".join(corpus.voiced_data_directories),
        "--testset_file", corpus.testset_file,
        "--text_align_directory", corpus.text_align_directory,
        "--normalizers_file", corpus.normalizers_file,
        "--output_directory", out_dir,
        "--model_size", "64", "--num_layers", "2",
        "--epochs", "1", "--dropout", "0.0",
        "--max_batch_len", "8000", "--t_cap", "256", "--utt_cap", "8",
        *extra,
    ]
    return subprocess.run(args, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=900)


def test_transduction_cli(corpus, tmp_path):
    out = str(tmp_path / "trans_out")
    r = _run("transduction_model.py", corpus, out)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "log.txt"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "finished epoch 1" in log
    assert "validation loss" in log
    # the platform override must have actually taken effect in the child
    assert "devices: 8 x" in log, log[:2000]
    assert os.path.exists(os.path.join(out, "model.pt"))
    assert os.path.isdir(os.path.join(out, "checkpoint"))


def test_recognition_cli(corpus, tmp_path):
    out = str(tmp_path / "rec_out")
    r = _run("recognition_model.py", corpus, out)
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(out, "log.txt")).read()
    assert "validation WER" in log
    assert os.path.exists(os.path.join(out, "model.pt"))
