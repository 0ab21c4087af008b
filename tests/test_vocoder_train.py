"""HiFi-GAN fine-tuning loop: discriminators, GAN step, data source."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.models.hifigan import HiFiGANConfig
from silent_speech_tpu.models.hifigan_discriminators import (
    HiFiGANDiscriminators, discriminator_loss, feature_matching_loss,
    generator_adversarial_loss,
)
from silent_speech_tpu.dsp.mel import MelConfig
from silent_speech_tpu.train.vocoder import (
    VocoderDataSource, VocoderTrainer, SEGMENT_FRAMES,
)
from silent_speech_tpu.utils.audio_io import write_wav

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas


TINY_GEN = HiFiGANConfig(
    resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),), num_mels=80)
TINY_MEL = MelConfig(n_fft=64, num_mels=80, hop_size=8, win_size=64,
                     fmax=8000.0)


def test_discriminators_shapes_and_losses():
    disc = HiFiGANDiscriminators(periods=(2, 3))
    audio = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1024)),
                        jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), audio)
    scores, fmaps = disc.apply(variables, audio)
    assert len(scores) == 2 + 3  # 2 periods + 3 scales
    assert len(fmaps) == len(scores)
    d = discriminator_loss(scores, scores)
    g = generator_adversarial_loss(scores)
    fm = feature_matching_loss(fmaps, fmaps)
    assert np.isfinite(float(d)) and np.isfinite(float(g))
    assert float(fm) == 0.0  # identical features


@pytest.fixture()
def wav_dir(tmp_path):
    rng = np.random.default_rng(1)
    d = str(tmp_path / "wavs")
    os.makedirs(d)
    for i in range(3):
        t = np.arange(22050) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t) \
            + 0.02 * rng.normal(size=22050)
        write_wav(os.path.join(d, f"{i}.wav"), audio.astype(np.float32),
                  22050)
    return d


def test_data_source_segments(wav_dir):
    src = VocoderDataSource(wav_dir)
    mels, audio = next(src.batches(batch_size=2, segment_frames=16))
    assert mels.shape == (2, 16, 80)
    assert audio.shape == (2, 16 * 256)
    assert np.isfinite(mels).all() and np.isfinite(audio).all()


def test_data_source_custom_mel_cfg(wav_dir):
    # gold-mel featurization follows the source's mel config, so a
    # non-default hop keeps mel frames and audio samples aligned
    cfg = MelConfig(n_fft=256, hop_size=64, win_size=256)
    src = VocoderDataSource(wav_dir, hop=64, mel_cfg=cfg)
    mels, audio = next(src.batches(batch_size=2, segment_frames=16))
    assert mels.shape == (2, 16, 80)
    assert audio.shape == (2, 16 * 64)
    assert np.isfinite(mels).all() and np.isfinite(audio).all()
    # a hop/mel_cfg mismatch would silently misalign segments: refuse it
    with pytest.raises(AssertionError):
        VocoderDataSource(wav_dir, hop=64)


def test_gan_training_step_runs_and_improves_mel(wav_dir, monkeypatch):
    # tiny generator (hop 8) + tiny mel so the test runs fast on CPU
    import silent_speech_tpu.train.vocoder as voc

    monkeypatch.setattr(voc, "SEGMENT_FRAMES", 16)
    trainer = VocoderTrainer(gen_cfg=TINY_GEN, mel_cfg=TINY_MEL,
                             learning_rate=1e-3, seed=0)

    rng = np.random.default_rng(2)
    b, frames = 2, 16
    hop = TINY_GEN.hop_length
    mels = rng.normal(size=(b, frames, 80)).astype(np.float32) * 0.1
    t = np.arange(frames * hop) / 22050
    audio = np.stack([0.3 * np.sin(2 * np.pi * 200 * t)] * b) \
        .astype(np.float32)

    mel_losses = []
    for i in range(4):
        (trainer.gen_params, trainer.disc_params, trainer.gen_opt,
         trainer.disc_opt, metrics) = trainer._step(
            trainer.gen_params, trainer.disc_params, trainer.gen_opt,
            trainer.disc_opt, jnp.asarray(mels), jnp.asarray(audio),
            np.float32(1e-3))
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m
        mel_losses.append(m["mel_l1"])
    assert mel_losses[-1] < mel_losses[0], mel_losses


def test_export_torch_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    trainer = VocoderTrainer(gen_cfg=TINY_GEN, mel_cfg=TINY_MEL, seed=3)
    path = str(tmp_path / "g.pt")
    trainer.export_torch(path)

    from silent_speech_tpu.models.hifigan import (
        generator_apply, hifigan_torch_to_params,
    )

    ckpt = torch.load(path)
    params = hifigan_torch_to_params(
        {k: v.numpy() for k, v in ckpt["generator"].items()}, TINY_GEN)
    mel = jnp.asarray(np.random.default_rng(4).normal(size=(1, 10, 80)),
                      jnp.float32)
    a = generator_apply(trainer.gen_params, mel, TINY_GEN)
    b = generator_apply(jax.tree_util.tree_map(jnp.asarray, params), mel,
                        TINY_GEN)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_save_load_state_resumes_exactly(wav_dir, tmp_path, monkeypatch):
    """Full-GAN-state checkpointing: save mid-run, restore into a fresh
    trainer, and the next step must match bit-for-bit (params AND both
    optimizer states ride the checkpoint) — the mechanism that splits the
    reference's 75k-step fine-tune (README.md:67-75) across sessions."""
    import silent_speech_tpu.train.vocoder as voc

    monkeypatch.setattr(voc, "SEGMENT_FRAMES", 16)
    ckpt = str(tmp_path / "state")

    def steps_from(trainer, n, start):
        # hop must match the tiny generator's upsampling (x8)
        src = VocoderDataSource(wav_dir, hop=TINY_GEN.hop_length,
                                mel_cfg=TINY_MEL)
        out = []
        trainer.train(src, steps=n, batch_size=2, log_every=0,
                      segment_frames=16, start_step=start,
                      on_step=lambda i, m: out.append(m["mel_l1"]))
        return out

    t1 = VocoderTrainer(gen_cfg=TINY_GEN, mel_cfg=TINY_MEL,
                        learning_rate=1e-3, seed=0, disc_periods=(2,),
                        disc_scales=1, disc_width_div=8)
    steps_from(t1, 2, 0)
    step = 2
    t1.save_state(ckpt, step=step)
    cont_ref = steps_from(t1, 2, step)

    t2 = VocoderTrainer(gen_cfg=TINY_GEN, mel_cfg=TINY_MEL,
                        learning_rate=1e-3, seed=99, disc_periods=(2,),
                        disc_scales=1, disc_width_div=8)
    assert VocoderTrainer.state_exists(ckpt)
    restored = t2.load_state(ckpt)
    assert restored == step
    cont_new = steps_from(t2, 2, restored)
    # the data source restarts its rng per call, so both continuations
    # see identical batches; state equality => identical losses
    np.testing.assert_allclose(cont_new, cont_ref, rtol=0, atol=0)
