"""Benchmark: HiFi-GAN vocoder real-time factor on TPU.

Measures mel→waveform generation throughput of the full V1 generator
(random weights unless --checkpoint is given; weights don't change FLOPs).
RTF = generated-audio-seconds per wall-second: >1 is faster than real time.

Prints ONE JSON line like bench.py (this is the secondary benchmark from
BASELINE.md; the driver runs bench.py).
"""

import json
import time

import numpy as np


def main(checkpoint: str = None, seconds: float = 10.0,
         batch: int = 8) -> None:
    from bench import _init_backend_or_die

    _init_backend_or_die()

    import jax
    import jax.numpy as jnp

    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, Vocoder, generator_apply, init_generator_params,
    )

    cfg = HiFiGANConfig()
    if checkpoint:
        params = Vocoder(checkpoint).params
    else:
        params = init_generator_params(jax.random.PRNGKey(0), cfg)

    frames = int(seconds * 22050) // cfg.hop_length
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, frames, 80)) * 0.5,
        jnp.float32)

    apply = jax.jit(lambda p, m: generator_apply(p, m, cfg))
    audio = apply(params, mel)
    float(np.asarray(audio).sum())  # forced host sync (compile + warmup)

    n = 5
    t0 = time.time()
    for _ in range(n):
        audio = apply(params, mel)
    float(np.asarray(audio).sum())
    dt = time.time() - t0

    audio_seconds = n * batch * frames * cfg.hop_length / 22050
    rtf = audio_seconds / dt
    print(json.dumps({
        "metric": "vocoder_rtf_hifigan_v1",
        "value": round(rtf, 1),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 1.0, 1),  # 1x = real time
    }))


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--batch", type=int, default=8)
    a = p.parse_args()
    main(a.checkpoint, a.seconds, a.batch)
