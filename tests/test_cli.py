"""The reference-compatible CLI entry points run end-to-end on the synthetic
corpus (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

from silent_speech_tpu.data.synthetic import generate_corpus

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas


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


@pytest.fixture(scope="module")
def trained(corpus, tmp_path_factory):
    """One transduction CLI run shared by the dependent-CLI tests."""
    out = str(tmp_path_factory.mktemp("trans_out"))
    r = _run("transduction_model.py", corpus, out)
    return out, r


def test_transduction_cli(corpus, trained):
    out, r = trained
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "log.txt"))
    log = open(os.path.join(out, "log.txt")).read()
    assert "finished epoch 1" in log
    assert "validation loss" in log
    # the platform override must have actually taken effect in the child
    assert "devices: 8 x" in log, log[:2000]
    assert os.path.exists(os.path.join(out, "model.pt"))
    assert os.path.isdir(os.path.join(out, "checkpoint"))


def test_evaluate_cli(corpus, trained, tmp_path):
    """evaluate.py end-to-end: ensemble of two copies of the trained
    checkpoint, dev split, no vocoder (gated WER path warns)."""
    out, r0 = trained
    assert r0.returncode == 0, r0.stderr[-3000:]
    model = os.path.join(out, "model.pt")
    eval_out = str(tmp_path / "eval_out")
    r = _run("evaluate.py", corpus, eval_out,
             extra=("--models", model, model, "--dev"))
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(eval_out, "eval_log.txt")).read()
    assert "phoneme accuracy" in log
    assert "skipping wav synthesis" in log  # no --hifigan_checkpoint


@pytest.fixture(scope="module")
def voc_trainset(corpus, trained, tmp_path_factory):
    """One make_vocoder_trainset.py run shared by the vocoder CLI tests."""
    out, r0 = trained
    assert r0.returncode == 0, r0.stderr[-3000:]
    voc_out = str(tmp_path_factory.mktemp("voc_out"))
    r = _run("make_vocoder_trainset.py", corpus, voc_out,
             extra=("--model", os.path.join(out, "model.pt")))
    return voc_out, r


def test_make_vocoder_trainset_cli(voc_trainset):
    """make_vocoder_trainset.py end-to-end: aligned predicted mels +
    22.05 kHz wavs + filelists (reference make_vocoder_trainset.py)."""
    voc_out, r = voc_trainset
    assert r.returncode == 0, r.stderr[-3000:]
    for fl in ("train_filelist.txt", "dev_filelist.txt"):
        path = os.path.join(voc_out, fl)
        assert os.path.exists(path)
        lines = open(path).read().strip().splitlines()
        assert lines
    import numpy as np
    mel = np.load(os.path.join(voc_out, "mels", "dev_output_0.npy"))
    assert mel.ndim == 3 and mel.shape[1] == 80


def test_finetune_vocoder_cli(corpus, voc_trainset, tmp_path):
    """finetune_vocoder.py end-to-end on the make_vocoder_trainset output:
    warm-start from a (tiny, random) checkpoint, a few GAN steps, export a
    reference-format finetuned generator (reference README.md:67-75)."""
    voc_out, r0 = voc_trainset
    assert r0.returncode == 0, r0.stderr[-3000:]
    from silent_speech_tpu.models.hifigan import HiFiGANConfig
    from hifigan_util import write_tiny_checkpoint

    # hop_length must stay 256 to match the hop-256 trainset mels
    cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=80)
    ckpt = write_tiny_checkpoint(str(tmp_path / "hifigan"), cfg)

    ft_out = str(tmp_path / "ft_out")
    r = _run("finetune_vocoder.py", corpus, ft_out,
             extra=("--data_directory", voc_out,
                    "--hifigan_checkpoint", ckpt,
                    "--steps", "2", "--vocoder_batch_size", "2",
                    "--vocoder_segment_frames", "8",
                    "--vocoder_disc_periods", "2,3"))
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(ft_out, "generator_finetuned.pt"))
    log = open(os.path.join(ft_out, "log.txt")).read()
    assert "finetune done" in log


def test_recognition_cli(corpus, tmp_path):
    out = str(tmp_path / "rec_out")
    r = _run("recognition_model.py", corpus, out)
    assert r.returncode == 0, r.stderr[-3000:]
    log = open(os.path.join(out, "log.txt")).read()
    assert "validation WER" in log
    assert os.path.exists(os.path.join(out, "model.pt"))


def test_evaluate_cli_full_vocoder_path(corpus, trained, tmp_path):
    """evaluate.py with a (tiny, random) HiFi-GAN checkpoint: vocodes
    every test utterance to example_output_{i}.wav and soft-skips the
    ASR judge when deepspeech isn't installed."""
    out, r0 = trained
    assert r0.returncode == 0, r0.stderr[-3000:]
    from silent_speech_tpu.models.hifigan import HiFiGANConfig
    from hifigan_util import write_tiny_checkpoint

    cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=80)
    ckpt = write_tiny_checkpoint(str(tmp_path / "hifigan"), cfg)

    eval_out = str(tmp_path / "eval_voc_out")
    r = _run("evaluate.py", corpus, eval_out,
             extra=("--models", os.path.join(out, "model.pt"),
                    "--hifigan_checkpoint", ckpt, "--dev"))
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(eval_out, "example_output_0.wav"))
    log = open(os.path.join(eval_out, "eval_log.txt")).read()
    assert "ASR WER skipped" in log  # deepspeech absent, wavs written
