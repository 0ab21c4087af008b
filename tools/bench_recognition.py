"""Recognition (EMG→text CTC) training-step throughput on the real TPU.

Same harness shape as bench.py but at the recognition batch capacity
(the reference packs 128k raw samples per batch,
``recognition_model.py:62``) through RecognitionTrainer's HBM-cache
step.

Measures BOTH production dispatch modes and their ratio (VERDICT r4
item 5 — the scan-wave path landed in commit 69f9e14 with a parity test
but no on-chip number):

- ``per_step``: one ``cache_step_ids`` jit dispatch per optimizer step —
  each call pays the host→tunnel dispatch latency (~1 s through the
  remote-attached TPU; reference hot loop recognition_model.py:85-107),
- ``scan_wave``: ``cache_scan_ids`` runs W steps inside one
  ``lax.scan`` dispatch, amortizing that latency to 1/W.

Prints one JSON line per mode and writes
``docs/tpu_sweep/bench_recognition_ab.json``.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_examples  # noqa: E402

WAVE = 8


def main():
    import jax

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.device_cache import DeviceCorpus
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    cfg = Config()
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = RecognitionTrainer(cfg, mesh=mesh)

    # recognition batches cap at half the transduction capacity
    example_sets = [build_examples(np.random.default_rng(i),
                                   target_frames=11000)
                    for i in range(4)]
    all_examples = [e for s in example_sets for e in s]
    corpus = DeviceCorpus.build(all_examples)
    id_sets = []
    pos = 0
    for s in example_sets:
        id_sets.append(list(range(pos, pos + len(s))))
        pos += len(s)

    trainer.init_state(trainer._pack(example_sets[0]), seed=0)
    rng = jax.random.PRNGKey(0)

    # ---- A: per-step dispatch -----------------------------------------
    def one(i):
        m = trainer.cache_step_ids(corpus, id_sets[i % 4], rng, 3e-4)
        assert m is not None
        return m

    for i in range(10):
        m = one(i)
    float(m["loss"])
    n = 20
    t0 = time.time()
    for i in range(n):
        m = one(i)
    float(m["loss"])
    dt_step = time.time() - t0
    per_step = n / dt_step

    # ---- B: W-step scan waves (one dispatch = WAVE optimizer steps) ----
    waves = [id_sets[j % 4] for j in range(WAVE)]
    lrs = [3e-4] * WAVE

    def one_wave():
        m = trainer.cache_scan_ids(corpus, waves, rng, lrs)
        assert m is not None, "wave exceeded static caps"
        return m

    m = one_wave()  # compile
    np.asarray(m["loss"])
    n_waves = 6
    t0 = time.time()
    for _ in range(n_waves):
        m = one_wave()
    np.asarray(m["loss"])
    dt_wave = time.time() - t0
    scan_wave = n_waves * WAVE / dt_wave

    out = {
        "backend": jax.devices()[0].platform,
        "per_step": {"steps_per_sec": round(per_step, 3),
                     "ms_per_step": round(1000 * dt_step / n, 1),
                     "n": n},
        "scan_wave": {"W": WAVE,
                      "steps_per_sec": round(scan_wave, 3),
                      "ms_per_step": round(
                          1000 * dt_wave / (n_waves * WAVE), 1),
                      "ms_per_dispatch": round(1000 * dt_wave / n_waves,
                                               1),
                      "n_dispatches": n_waves},
        "wave_speedup": round(scan_wave / per_step, 2),
    }
    os.makedirs("docs/tpu_sweep", exist_ok=True)
    with open("docs/tpu_sweep/bench_recognition_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "train_steps_per_sec_ctc",
        "value": round(per_step, 3),
        "unit": "steps/s",
        "vs_baseline": round(per_step / 3.0, 2),
    }))
    print(json.dumps({
        "metric": "train_steps_per_sec_ctc_scanwave",
        "value": round(scan_wave, 3),
        "unit": "steps/s",
        "vs_baseline": round(scan_wave / 3.0, 2),
    }))


if __name__ == "__main__":
    main()
