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
- N-step fine-tune on a synthetic harmonic corpus with the mel-L1 AND
  gen/disc loss curves (mel must decrease; disc must stay bounded —
  the multi-thousand-step stability evidence VERDICT r4 item 5 asks
  for against the reference's 75k-step budget).

Writes docs/VOCODER_TPU.json. Run:
    python tools/vocoder_tpu_real.py [steps] [work_dir]
Pass a persistent ``work_dir`` to split a long run across bounded
sessions: the full GAN state checkpoints there every 500 steps
(``VocoderTrainer.save_state``) and the loss curves accumulate in
``work_dir/curve.json``; re-running resumes and extends them.
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


def main(steps: int = 300, work: str = None) -> None:
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

    work = work or tempfile.mkdtemp(prefix="voc_real_")
    os.makedirs(work, exist_ok=True)
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir):
        os.makedirs(corpus_dir)
        synth_corpus(corpus_dir)
    source = VocoderDataSource(corpus_dir)

    # resume: full GAN state + accumulated curves live in `work`
    start_step = 0
    curve_path = os.path.join(work, "curve.json")
    hist = {"mel_l1": [], "g_loss": [], "d_loss": []}
    if trainer.state_exists(work):
        start_step = trainer.load_state(work)
        if os.path.exists(curve_path):
            with open(curve_path) as f:
                hist = json.load(f)
        print(f"resumed at step {start_step} "
              f"({len(hist['mel_l1'])} curve points)", flush=True)

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
    t_after_compile = {}

    def on_step(i, m):
        hist["mel_l1"].append(round(m["mel_l1"], 4))
        hist["g_loss"].append(round(m["g_loss"], 4))
        hist["d_loss"].append(round(m["d_loss"], 4))
        if i == start_step:
            t_after_compile["t0"] = time.time()

    t_start = time.time()
    trainer.train(source, steps=steps, batch_size=16, log_every=50,
                  on_step=on_step, start_step=start_step,
                  checkpoint_every=500, checkpoint_dir=work)
    total = time.time() - t_start
    with open(curve_path, "w") as f:
        json.dump(hist, f)
    steady = (time.time() - t_after_compile["t0"]) / max(steps - 1, 1)
    curve = hist["mel_l1"]
    total_steps = start_step + steps
    out["gan_step_ms"] = round(steady * 1e3, 2)
    out["steps"] = total_steps
    out["steps_this_session"] = steps
    out["compile_plus_first_step_s"] = round(total - steady * (steps - 1),
                                             1)
    k = max(len(curve) // 20, 1)
    out["mel_l1_curve_decimated"] = curve[::k] + [curve[-1]]
    out["g_loss_curve_decimated"] = hist["g_loss"][::k] \
        + [hist["g_loss"][-1]]
    out["d_loss_curve_decimated"] = hist["d_loss"][::k] \
        + [hist["d_loss"][-1]]
    w = min(50, max(len(curve) // 10, 10))
    out["mel_l1_first_vs_last_window_mean"] = {
        "window": w,
        "first": round(float(np.mean(curve[:w])), 4),
        "last": round(float(np.mean(curve[-w:])), 4)}
    out["mel_l1_decreasing"] = bool(np.mean(curve[-w:])
                                    < np.mean(curve[:w]))
    d = np.asarray(hist["d_loss"], np.float64)
    g = np.asarray(hist["g_loss"], np.float64)
    # stability: every loss finite over the whole run, the discriminator
    # neither collapses to 0 (free wins → generator gradient starves)
    # nor diverges past its early ceiling
    out["gan_stable"] = bool(
        np.isfinite(d).all() and np.isfinite(g).all()
        and float(d[-w:].mean()) > 0.05
        and float(d[-w:].mean()) < max(4.0, 2.0 * float(d[:w].mean())))
    out["d_loss_first_vs_last_window_mean"] = {
        "first": round(float(d[:w].mean()), 4),
        "last": round(float(d[-w:].mean()), 4)}

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
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         sys.argv[2] if len(sys.argv) > 2 else None)
