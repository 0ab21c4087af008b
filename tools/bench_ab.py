import sys; sys.path.insert(0, ".")
import time, numpy as np, sys
import jax
from silent_speech_tpu.config import Config
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.train.transduction import TransductionTrainer
from silent_speech_tpu.data.device_cache import DeviceCorpus
from bench import build_examples

fused = sys.argv[1] == "fused"
t00 = time.time()
def log(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)

cfg = Config()
cfg.model.fused_attention = fused
mesh = make_mesh(1, 1, devices=jax.devices()[:1])
trainer = TransductionTrainer(cfg, mesh=mesh)
example_sets = [build_examples(np.random.default_rng(i)) for i in range(4)]
all_examples = [e for s_ in example_sets for e in s_]
corpus = DeviceCorpus.build(all_examples)
id_sets = []
pos = 0
for s_ in example_sets:
    id_sets.append(list(range(pos, pos + len(s_))))
    pos += len(s_)
log("corpus built")
trainer.init_state(trainer._pack(example_sets[0]), seed=0)
log("state init")
step_rng = jax.random.PRNGKey(0)
wave = 4
def one_wave(i):
    groups = [id_sets[(i + j) % 4] for j in range(wave)]
    return trainer.cache_scan_ids(corpus, groups, step_rng, [1e-3] * wave)
m = one_wave(0)
float(m["loss"][-1])
log("first wave done (compiled)")
for i in range(1, 8):
    m = one_wave(i)
float(m["loss"][-1])
log("warmup done")
t0 = time.time()
for i in range(8):
    m = one_wave(i)
float(m["loss"][-1])
dt = time.time() - t0
print(f"fused={fused}: {8*wave/dt:.2f} steps/s ({dt/8/wave*1000:.1f} ms/step)", flush=True)
