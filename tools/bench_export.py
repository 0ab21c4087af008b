"""Serving-bundle latency benchmark: exported StableHLO vs live jit.

Builds full-size serving bundles (transduction f32 + int8, vocoder) from
randomly-initialized flagship models, then measures batch-1 call latency
per bucket on the current backend: p50/p95 over N calls, int8 vs f32
delta (the weight stream is the HBM-bound term at batch 1), vocoder RTF
through the bundle. Prints one JSON line.

Run: python tools/bench_export.py [--tiny]   (tiny: CPU-mesh mechanics)
"""
import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _measure(fn, args, n=30, warmup=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {"p50_ms": round(1e3 * ts[len(ts) // 2], 3),
            "p95_ms": round(1e3 * ts[int(len(ts) * 0.95)], 3)}


def main(tiny: bool = False) -> None:
    if tiny:
        from silent_speech_tpu.utils.platform import force_cpu

        force_cpu(1)
    else:
        from bench import _init_backend_or_die

        _init_backend_or_die()
    import jax  # noqa: E402

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.eval.export import (
        ServingBundle, save_serving_bundle, save_vocoder_bundle,
    )
    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, init_generator_params,
    )
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = Config()
    if tiny:
        cfg.model.model_size = 64
        cfg.model.num_layers = 2
        cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    t_bucket = 128 if tiny else 1024  # ~12 s of speech at 86 fps
    n_calls = 10 if tiny else 30

    # a representative packed example to init the trainer state
    rng = np.random.default_rng(0)
    ex = {
        "emg": rng.normal(size=(t_bucket - 16, 112)).astype(np.float32),
        "raw_emg": rng.normal(size=((t_bucket - 16) * 8, 8)).astype(
            np.float32),
        "session_ids": np.zeros(t_bucket - 16, np.int64),
        "audio_features": rng.normal(size=(t_bucket - 16, 80)).astype(
            np.float32),
        "silent": False,
        "text": "bench",
        "text_int": rng.integers(0, 37, size=12).astype(np.int64),
        "phonemes": rng.integers(0, 48, size=t_bucket - 16).astype(
            np.int64),
    }
    trainer = TransductionTrainer(cfg, mesh=mesh)
    trainer.init_state(trainer._pack([ex]), seed=0)

    result = {"metric": "serving_latency", "t_bucket": t_bucket,
              "backend": jax.devices()[0].platform}

    work = tempfile.mkdtemp(prefix="bench_export_")
    for name, quant in (("f32", None), ("int8", "int8")):
        d = save_serving_bundle(trainer, "transduction",
                                f"{work}/trans_{name}",
                                t_buckets=(t_bucket,), quantize=quant)
        bundle = ServingBundle.load(d)
        fn = bundle._calls[t_bucket]
        args = (bundle.params, bundle.batch_stats,
                np.zeros((1, t_bucket, 112), np.float32),
                np.zeros((1, t_bucket * 8, 8), np.float32),
                np.zeros((1, t_bucket), np.int32),
                np.ones((1, t_bucket), np.int32))
        result[f"transduction_{name}"] = _measure(fn, args, n=n_calls)

    # live-jit reference point (same shapes, params resident)
    emg, raw, sess, seg = args[2:]
    live = lambda: trainer._forward(  # noqa: E731
        trainer.state.params, trainer.state.batch_stats, emg, raw, sess,
        seg)[0]
    result["transduction_live_jit"] = _measure(
        lambda *_: live(), (), n=n_calls)

    # vocoder bundle RTF at the same window
    gen_cfg = HiFiGANConfig() if not tiny else HiFiGANConfig(
        resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),))

    class V:
        pass

    v = V()
    v.params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    v.cfg = gen_cfg
    d = save_vocoder_bundle(v, f"{work}/voc", mel_buckets=(t_bucket,))
    voc = ServingBundle.load(d)
    m = _measure(voc._calls[t_bucket],
                 (voc.params, np.zeros((1, t_bucket, 80), np.float32)),
                 n=n_calls)
    audio_s = t_bucket * gen_cfg.hop_length / 22050.0
    m["rtf"] = round(audio_s / (m["p50_ms"] / 1e3), 1)
    result["vocoder"] = m

    print(json.dumps(result))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    main(tiny=ap.parse_args().tiny)
