"""Serving-latency benchmark: per-hop latency of the streaming surfaces.

Measures, on the current backend, the wall time of one transcript/audio
refresh (featurize window -> padded forward -> decode / vocode) for the
full-size model at several window lengths, reporting p50/p95 and the
synthesizer's real-time factor (audio-seconds per wall-second at the
longest window).

Run: python tools/bench_stream.py [--tiny]   (tiny: CPU-mesh mechanics)
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(tiny: bool = False) -> None:
    if tiny:
        from silent_speech_tpu.utils.platform import force_cpu

        force_cpu(1)
    import jax  # noqa: E402

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.normalizers import FeatureNormalizer
    from silent_speech_tpu.eval.streaming import (
        StreamingRecognizer, StreamingSynthesizer, featurize_raw_window,
    )
    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, generator_apply, init_generator_params,
    )
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.recognition import RecognitionTrainer
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = Config()
    if tiny:
        cfg.model.model_size = 64
        cfg.model.num_layers = 2
        cfg.model.dim_feedforward = 128
        cfg.model.dropout = 0.0
        cfg.model.compute_dtype = "float32"
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    rng = np.random.default_rng(0)
    warm = featurize_raw_window(rng.normal(size=(2000, 8)))
    n = warm["emg"].shape[0]
    base = {**warm, "silent": False, "text": "hi",
            "text_int": np.array([1, 2], np.int64),
            "phonemes": np.zeros(n, np.int64)}

    rec = RecognitionTrainer(cfg, mesh=mesh)
    rec.init_state(rec._pack([base]), seed=0)
    tra = TransductionTrainer(cfg, mesh=mesh)
    tra.init_state(tra._pack([{
        **base, "audio_features": np.zeros((n, 80), np.float32)}]), seed=0)

    hcfg = HiFiGANConfig()
    params = init_generator_params(jax.random.PRNGKey(0), hcfg)
    voc_fn = jax.jit(lambda p, m: generator_apply(p, m, hcfg))

    class JitVocoder:
        def __call__(self, mel):
            return np.asarray(voc_fn(params, mel[None]))[0]

    mfcc_norm = FeatureNormalizer([rng.normal(size=(50, 80))])

    out = {"windows": []}
    for window_s in (2.0, 5.0, 10.0):
        x = rng.normal(size=(int(window_s * 1000), 8)) * 30
        r = StreamingRecognizer(rec, hop_s=0.25)
        s = StreamingSynthesizer(tra, mfcc_norm, JitVocoder(), hop_s=0.25)
        r.feed(x)
        s.feed(x)
        r.transcript(force=True)  # compile
        s.audio(force=True)
        rec_t, syn_t = [], []
        for _ in range(10 if not tiny else 3):
            t0 = time.perf_counter()
            r.transcript(force=True)
            rec_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            audio = s.audio(force=True)
            syn_t.append(time.perf_counter() - t0)
        out["windows"].append({
            "window_s": window_s,
            "recognize_ms_p50": round(1e3 * float(np.median(rec_t)), 1),
            "recognize_ms_p95": round(
                1e3 * float(np.percentile(rec_t, 95)), 1),
            "synthesize_ms_p50": round(1e3 * float(np.median(syn_t)), 1),
            "synthesize_rtf": round(
                (len(audio) / 22050.0) / float(np.median(syn_t)), 1),
        })
        print(json.dumps(out["windows"][-1]), flush=True)
    print(json.dumps({"metric": "stream_hop_latency", **out}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiny", action="store_true")
    main(ap.parse_args().tiny)
