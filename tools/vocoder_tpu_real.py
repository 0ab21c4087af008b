"""Real-geometry HiFi-GAN V1 GAN training on the TPU (VERDICT r3 item 4).

The accuracy artifact (tools/train_accuracy_vocoder.py) proved the GAN
loop LEARNS at CPU-scaled geometry; this measures the FULL V1
configuration on the chip — generator hop 256 / 512 channels, MPD periods
(2,3,5,7,11) + MSD, the production `VocoderTrainer.train` loop — and runs
a bounded fine-tune with the mel-L1 curve recorded:

- GAN train-step time (gen fwd + disc update + gen update + on-device mel
  L1, one jit region) at the reference segment size (32 frames ↔ 8192
  samples, batch 16 — the released config's batch),
- generator inference RTF at that geometry (cross-check of
  bench_vocoder.py),
- N-step fine-tune on a synthetic harmonic corpus with the mel-L1 curve
  (must decrease).

Writes docs/VOCODER_TPU.json. Run: python tools/vocoder_tpu_real.py [steps]
Reference: the upstream repo shells out to the released PyTorch HiFi-GAN
for this fine-tune (README.md:67-75); here it is in-framework.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def synth_corpus(d: str, n: int = 12, seconds: float = 3.0,
                 sr: int = 22050, seed: int = 0) -> None:
    """Harmonic wavs (the train_accuracy_vocoder corpus recipe)."""
    from silent_speech_tpu.utils.audio_io import write_wav

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        f0 = rng.uniform(100, 240)
        env = 0.3 * (0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
        sig = np.zeros_like(t)
        for h in range(1, 7):
            sig += np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.3)) / h
        sig = env * sig / np.abs(sig).max()
        sig += 0.002 * rng.normal(size=len(t))
        write_wav(os.path.join(d, f"utt_{i}.wav"),
                  sig.astype(np.float32), sr)


def main(steps: int = 300) -> None:
    from bench import _init_backend_or_die

    _init_backend_or_die()
    import jax

    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, generator_apply)
    from silent_speech_tpu.train.vocoder import (
        VocoderDataSource, VocoderTrainer)

    backend = jax.devices()[0].platform
    gen_cfg = HiFiGANConfig()  # full V1: hop 256, 512 ch
    trainer = VocoderTrainer(gen_cfg=gen_cfg, seed=0)  # periods 2,3,5,7,11

    work = tempfile.mkdtemp(prefix="voc_real_")
    synth_corpus(work)
    source = VocoderDataSource(work)

    out = {"backend": backend,
           "geometry": {"hop": gen_cfg.hop_length,
                        "upsample_initial_channel":
                            gen_cfg.upsample_initial_channel,
                        "resblock_kernel_sizes":
                            list(gen_cfg.resblock_kernel_sizes),
                        "mpd_periods": [2, 3, 5, 7, 11],
                        "segment_frames": 32, "batch_size": 16}}

    # ---- step time: timed through the production loop ------------------
    # the first/last-10 windows must not overlap or the decreasing
    # verdict compares shared samples
    if steps < 20:
        raise SystemExit(f"steps must be >= 20 (got {steps})")
    curve = []
    t_after_compile = {}

    def on_step(i, m):
        curve.append(round(m["mel_l1"], 4))
        if i == 0:
            t_after_compile["t0"] = time.time()

    t_start = time.time()
    trainer.train(source, steps=steps, batch_size=16, log_every=50,
                  on_step=on_step)
    total = time.time() - t_start
    steady = (time.time() - t_after_compile["t0"]) / max(steps - 1, 1)
    out["gan_step_ms"] = round(steady * 1e3, 2)
    out["steps"] = steps
    out["compile_plus_first_step_s"] = round(total - steady * (steps - 1),
                                             1)
    k = max(steps // 10, 1)
    out["mel_l1_curve_decimated"] = curve[::k] + [curve[-1]]
    out["mel_l1_first_vs_last_10_mean"] = {
        "first": round(float(np.mean(curve[:10])), 4),
        "last": round(float(np.mean(curve[-10:])), 4)}
    out["mel_l1_decreasing"] = bool(np.mean(curve[-10:])
                                    < np.mean(curve[:10]))

    # ---- inference RTF at the trained geometry --------------------------
    frames = 1024  # ~11.9 s of audio at hop 256
    mel = np.zeros((1, frames, 80), np.float32)
    fwd = jax.jit(lambda p, m: generator_apply(p, m, gen_cfg))
    wav = fwd(trainer.gen_params, mel)
    jax.block_until_ready(wav)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(trainer.gen_params, mel))
        ts.append(time.perf_counter() - t0)
    audio_s = frames * gen_cfg.hop_length / 22050.0
    out["inference_rtf_t1024"] = round(audio_s / np.median(ts), 1)

    os.makedirs("docs", exist_ok=True)
    with open("docs/VOCODER_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
