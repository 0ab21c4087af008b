"""Recognition (EMG→text CTC) training-step throughput on the real TPU.

Same harness shape as bench.py but at the recognition batch capacity
(the reference packs 128k raw samples per batch,
``recognition_model.py:62``) through RecognitionTrainer's HBM-cache
step. Prints one JSON line.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_examples  # noqa: E402


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
    dt = time.time() - t0
    print(json.dumps({
        "metric": "train_steps_per_sec_ctc",
        "value": round(n / dt, 3),
        "unit": "steps/s",
        "vs_baseline": round(n / dt / 3.0, 2),
    }))


if __name__ == "__main__":
    main()
