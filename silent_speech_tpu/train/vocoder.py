"""HiFi-GAN vocoder fine-tuning, TPU-native.

The reference fine-tunes HiFi-GAN for 75k steps from the UNIVERSAL_V1
checkpoint using the external PyTorch repo, fed by ``make_vocoder_trainset``
(aligned *predicted* mels + ground-truth wavs — ``README.md:67-75``). This
module brings that training loop into the framework:

- published objective (arXiv:2010.05646): LSGAN adversarial loss against the
  MPD+MSD ensemble, ×2 feature matching, ×45 mel-spectrogram L1 (the mel of
  the generated audio is computed **on device** with the GEMM-native DFT, so
  the whole generator+discriminator update is one jit region),
- random aligned segments (32 mel frames ↔ 8192 samples) drawn per step,
- AdamW (β₁=0.8, β₂=0.99), lr 2e-4, ×0.999 exponential decay per epoch,
- consumes ``make_vocoder_trainset`` output directories, or (gold) mels
  computed from the wavs directly.
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..dsp.mel import MelConfig, jax_log_mel_spectrogram, \
    log_mel_spectrogram
from ..models.hifigan import (
    HiFiGANConfig, generator_apply, init_generator_params,
)
from ..models.hifigan_discriminators import (
    HiFiGANDiscriminators, discriminator_loss, feature_matching_loss,
    generator_adversarial_loss,
)
from ..utils.audio_io import read_audio

SEGMENT_FRAMES = 32


class VocoderDataSource:
    """Aligned (mel, audio) segments from a make_vocoder_trainset directory
    (``mels/{prefix}_output_{i}.npy`` (1, 80, T) + ``wavs/..._{i}.wav``) or
    straight from wavs with gold mels."""

    def __init__(self, directory: str, prefix: str = "train",
                 hop: int = 256, seed: int = 0,
                 mel_cfg: Optional[MelConfig] = None):
        self.hop = hop
        self.mel_cfg = mel_cfg or MelConfig()
        assert self.mel_cfg.hop_size == hop, (
            "gold-mel featurization must match the audio hop: "
            f"mel_cfg.hop_size={self.mel_cfg.hop_size} vs hop={hop}")
        self.items: List[Tuple[Optional[str], str]] = []
        filelist = os.path.join(directory, f"{prefix}_filelist.txt")
        if os.path.exists(filelist):
            with open(filelist) as f:
                names = [line.strip() for line in f if line.strip()]
            for name in names:
                mel_path = os.path.join(directory, "mels", f"{name}.npy")
                wav_path = os.path.join(directory, "wavs", f"{name}.wav")
                self.items.append((mel_path, wav_path))
        else:  # plain directory of wavs; gold mels
            for f_ in sorted(os.listdir(directory)):
                if f_.endswith((".wav", ".flac")):
                    self.items.append((None, os.path.join(directory, f_)))
        assert self.items, f"no vocoder training items in {directory}"
        self._rng = np.random.default_rng(seed)
        self._cache = {}

    def _load(self, idx: int):
        if idx not in self._cache:
            mel_path, wav_path = self.items[idx]
            audio, rate = read_audio(wav_path)
            assert rate == 22050, f"expected 22.05 kHz, got {rate}"
            if mel_path is not None:
                mel = np.load(mel_path)[0].T  # (1,80,T) → (T,80)
            else:
                mel = log_mel_spectrogram(audio.astype(np.float32),
                                          self.mel_cfg)
            n = min(mel.shape[0], len(audio) // self.hop)
            self._cache[idx] = (mel[:n].astype(np.float32),
                                audio[: n * self.hop].astype(np.float32))
        return self._cache[idx]

    def batches(self, batch_size: int = 16,
                segment_frames: int = SEGMENT_FRAMES
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Endless random (B, F, 80) mel / (B, F·hop) audio segments."""
        seg_samples = segment_frames * self.hop
        while True:
            mels = np.zeros((batch_size, segment_frames, 80), np.float32)
            auds = np.zeros((batch_size, seg_samples), np.float32)
            for b in range(batch_size):
                mel, audio = self._load(
                    int(self._rng.integers(len(self.items))))
                if mel.shape[0] <= segment_frames:
                    mels[b, : mel.shape[0]] = mel
                    auds[b, : len(audio)] = audio
                else:
                    start = int(self._rng.integers(
                        mel.shape[0] - segment_frames))
                    mels[b] = mel[start: start + segment_frames]
                    auds[b] = audio[start * self.hop:
                                    start * self.hop + seg_samples]
            yield mels, auds


class VocoderTrainer:
    def __init__(self, gen_cfg: HiFiGANConfig = HiFiGANConfig(),
                 mel_cfg: MelConfig = MelConfig(),
                 learning_rate: float = 2e-4, lr_decay: float = 0.999,
                 mel_weight: float = 45.0, fm_weight: float = 2.0,
                 seed: int = 0,
                 disc_periods: Tuple[int, ...] = (2, 3, 5, 7, 11),
                 disc_scales: int = 3, disc_width_div: int = 1,
                 mesh=None):
        """``mesh``: a ``jax.sharding.Mesh`` with a 'data' axis — the GAN
        step then runs data-parallel (params/optimizer replicated, the
        (B, …) mel/audio batch sharded over 'data'; XLA inserts the
        gradient all-reduces over ICI). The generator is ~14 M params, so
        DP is the right parallelism — there is nothing to shard
        model-wise. The batch size must be a multiple of the 'data'
        axis size (each device takes batch/data_axis examples)."""
        self.gen_cfg = gen_cfg
        self.mel_cfg = mel_cfg
        self.lr = learning_rate
        self.lr_decay = lr_decay
        self.mesh = mesh
        self.disc = HiFiGANDiscriminators(periods=disc_periods,
                                          n_scales=disc_scales,
                                          width_div=disc_width_div)

        key = jax.random.PRNGKey(seed)
        kg, kd = jax.random.split(key)
        self.gen_params = init_generator_params(kg, gen_cfg)
        dummy = jnp.zeros((1, SEGMENT_FRAMES * gen_cfg.hop_length))
        self.disc_params = self.disc.init(kd, dummy)["params"]

        self.gen_tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=0.8, b2=0.99, weight_decay=0.01)
        self.disc_tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=0.8, b2=0.99, weight_decay=0.01)
        self.gen_opt = self.gen_tx.init(self.gen_params)
        self.disc_opt = self.disc_tx.init(self.disc_params)

        self._step = self._build_step(mel_weight, fm_weight)

    def load_generator(self, checkpoint_path: str) -> None:
        """Warm start from a released torch checkpoint (fine-tuning)."""
        from ..models.hifigan import Vocoder

        self.gen_params = Vocoder(checkpoint_path).params
        self.gen_opt = self.gen_tx.init(self.gen_params)

    def _state_dict(self, step: int) -> dict:
        return {"gen_params": self.gen_params,
                "disc_params": self.disc_params,
                "gen_opt": self.gen_opt, "disc_opt": self.disc_opt,
                "step": step}

    def save_state(self, directory: str, step: int = 0) -> str:
        """Persist the FULL GAN state (both param trees + both optimizer
        states + step) with orbax, so the reference's 75k-step fine-tune
        budget (``README.md:67-75``) can be split across bounded sessions
        and resumed exactly — the external PyTorch HiFi-GAN repo the
        reference shells out to checkpoints g/do files the same way."""
        from .checkpoint import _checkpointer

        os.makedirs(directory, exist_ok=True)
        path = os.path.abspath(os.path.join(directory, "vocoder_state"))
        _checkpointer().save(path, jax.device_get(self._state_dict(step)),
                             force=True)
        return path

    def load_state(self, directory: str) -> int:
        """Inverse of :meth:`save_state`; returns the saved step."""
        from .checkpoint import _checkpointer

        path = os.path.abspath(os.path.join(directory, "vocoder_state"))
        r = _checkpointer().restore(
            path, item=jax.device_get(self._state_dict(0)))
        self.gen_params = r["gen_params"]
        self.disc_params = r["disc_params"]
        self.gen_opt = r["gen_opt"]
        self.disc_opt = r["disc_opt"]
        return int(r["step"])

    @staticmethod
    def state_exists(directory: str) -> bool:
        return os.path.isdir(os.path.join(directory, "vocoder_state"))

    def _build_step(self, mel_weight: float, fm_weight: float):
        gen_cfg, mel_cfg = self.gen_cfg, self.mel_cfg
        disc = self.disc

        def batch_mel(audio):  # (B, T) → (B, F, 80), differentiable
            return jax.vmap(
                lambda a: jax_log_mel_spectrogram(a, mel_cfg))(audio)

        def step(gen_params, disc_params, gen_opt, disc_opt, mels, audio,
                 lr):
            fake = generator_apply(gen_params, mels, gen_cfg)  # (B, T)

            # --- discriminator update (fake detached) -------------------
            def d_loss_fn(dp):
                real_s, _ = disc.apply({"params": dp}, audio)
                fake_s, _ = disc.apply({"params": dp},
                                       jax.lax.stop_gradient(fake))
                return discriminator_loss(real_s, fake_s)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
            d_updates, disc_opt = self.disc_tx.update(
                d_grads, _set_lr(disc_opt, lr), disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)

            # --- generator update ---------------------------------------
            def g_loss_fn(gp):
                fake_g = generator_apply(gp, mels, gen_cfg)
                fake_s, fake_f = disc.apply({"params": disc_params}, fake_g)
                _, real_f = disc.apply({"params": disc_params}, audio)
                adv = generator_adversarial_loss(fake_s)
                fm = feature_matching_loss(real_f, fake_f)
                mel_l1 = jnp.mean(jnp.abs(batch_mel(fake_g)
                                          - batch_mel(audio)))
                total = adv + fm_weight * fm + mel_weight * mel_l1
                return total, {"adv": adv, "fm": fm, "mel_l1": mel_l1}

            (g_loss, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gen_params)
            g_updates, gen_opt = self.gen_tx.update(
                g_grads, _set_lr(gen_opt, lr), gen_params)
            gen_params = optax.apply_updates(gen_params, g_updates)

            metrics = {"d_loss": d_loss, "g_loss": g_loss, **aux}
            return gen_params, disc_params, gen_opt, disc_opt, metrics

        if self.mesh is not None and self.mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(step, donate_argnums=(0, 1, 2, 3),
                           in_shardings=(repl, repl, repl, repl, data,
                                         data, repl))
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    def train(self, source: VocoderDataSource, steps: int,
              batch_size: int = 16, steps_per_epoch: int = 1000,
              log_every: int = 100,
              segment_frames: Optional[int] = None,
              on_step=None, start_step: int = 0,
              checkpoint_every: int = 0,
              checkpoint_dir: Optional[str] = None) -> dict:
        """Run the GAN loop; ``on_step(i, metrics_dict)`` (floats) is
        called after every step when given — the accuracy artifact uses it
        to record curves through this exact production loop.

        ``start_step`` (from :meth:`load_state`) keeps the per-epoch lr
        decay and step numbering continuous across resumed sessions;
        ``checkpoint_every``/``checkpoint_dir`` persist the full GAN
        state periodically (and at the end) via :meth:`save_state`.
        ``steps`` counts NEW steps to run this session."""
        if segment_frames is not None and segment_frames <= 0:
            raise ValueError(f"segment_frames must be > 0, "
                             f"got {segment_frames}")
        batches = source.batches(
            batch_size,
            SEGMENT_FRAMES if segment_frames is None else segment_frames)
        metrics = {}
        t0 = time.time()
        for i in range(start_step, start_step + steps):
            mels, audio = next(batches)
            lr = np.float32(self.lr * (self.lr_decay
                                       ** (i // steps_per_epoch)))
            (self.gen_params, self.disc_params, self.gen_opt,
             self.disc_opt, metrics) = self._step(
                self.gen_params, self.disc_params, self.gen_opt,
                self.disc_opt, jnp.asarray(mels), jnp.asarray(audio), lr)
            if on_step is not None:
                on_step(i, {k: float(v) for k, v in metrics.items()})
            if log_every and (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                logging.info(
                    "vocoder step %d: g=%.3f d=%.3f mel=%.3f (%.2f it/s)",
                    i + 1, m["g_loss"], m["d_loss"], m["mel_l1"],
                    (i + 1 - start_step) / (time.time() - t0))
            if (checkpoint_every and checkpoint_dir
                    and (i + 1) % checkpoint_every == 0):
                self.save_state(checkpoint_dir, step=i + 1)
        if checkpoint_dir is not None:
            self.save_state(checkpoint_dir, step=start_step + steps)
        return {k: float(v) for k, v in metrics.items()}

    def export_torch(self, path: str) -> None:
        """Write the generator as an official-format checkpoint
        ({'generator': state_dict}) loadable by our Vocoder and the
        released PyTorch code."""
        import torch

        from ..models.hifigan import HiFiGANConfig  # noqa
        state = {}
        p = jax.device_get(self.gen_params)

        def put_conv(name, blk):
            state[f"{name}.weight"] = torch.tensor(
                np.transpose(np.asarray(blk["kernel"]), (2, 1, 0)))
            state[f"{name}.bias"] = torch.tensor(np.asarray(blk["bias"]))

        put_conv("conv_pre", p["conv_pre"])
        put_conv("conv_post", p["conv_post"])
        nk = len(self.gen_cfg.resblock_kernel_sizes)
        for i in range(len(self.gen_cfg.upsample_rates)):
            state[f"ups.{i}.weight"] = torch.tensor(
                np.asarray(p[f"ups_{i}"]["kernel"]))
            state[f"ups.{i}.bias"] = torch.tensor(
                np.asarray(p[f"ups_{i}"]["bias"]))
            for j in range(nk):
                r = i * nk + j
                blk = p[f"res_{i}_{j}"]
                for d_idx in range(
                        len(self.gen_cfg.resblock_dilation_sizes[j])):
                    if self.gen_cfg.resblock == "1":
                        put_conv(f"resblocks.{r}.convs1.{d_idx}",
                                 blk[f"convs1_{d_idx}"])
                        put_conv(f"resblocks.{r}.convs2.{d_idx}",
                                 blk[f"convs2_{d_idx}"])
                    else:
                        put_conv(f"resblocks.{r}.convs.{d_idx}",
                                 blk[f"convs_{d_idx}"])
        torch.save({"generator": state}, path)


def _set_lr(opt_state, lr):
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)
