import sys; sys.path.insert(0, ".")
import time
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from silent_speech_tpu.config import Config
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.data.device_cache import DeviceCorpus
from silent_speech_tpu.ops.dropout import RegenDropout
from bench import build_examples

def run_variant(name, attn_cls=None):
    import silent_speech_tpu.train.transduction as tmod
    import silent_speech_tpu.models.transformer as tf
    orig = tf.RelativePositionalAttention
    if attn_cls is not None:
        tf.RelativePositionalAttention = attn_cls
    try:
        cfg = Config()
        mesh = make_mesh(1, 1, devices=jax.devices()[:1])
        trainer = tmod.TransductionTrainer(cfg, mesh=mesh)
        example_sets = [build_examples(np.random.default_rng(i)) for i in range(4)]
        all_examples = [e for s in example_sets for e in s]
        corpus = DeviceCorpus.build(all_examples)
        id_sets = []; pos = 0
        for s in example_sets:
            id_sets.append(list(range(pos, pos + len(s)))); pos += len(s)
        trainer.init_state(trainer._pack(example_sets[0]), seed=0)
        rng = jax.random.PRNGKey(0); wave = 4
        def one_wave(i):
            groups = [id_sets[(i + j) % 4] for j in range(wave)]
            return trainer.cache_scan_ids(corpus, groups, rng, [1e-3] * wave)
        for i in range(5): m = one_wave(i)
        float(m["loss"][-1])
        t0 = time.time(); n = 5
        for i in range(n): m = one_wave(i)
        float(m["loss"][-1])
        dt = time.time() - t0
        print(f"{name:44s} {dt/(n*wave)*1000:7.2f} ms/step ({n*wave/dt:5.2f} steps/s)", flush=True)
    finally:
        tf.RelativePositionalAttention = orig

import silent_speech_tpu.models.transformer as _tf


class PlainAttention(_tf.RelativePositionalAttention):
  @nn.compact
  def __call__(self, x, *, segment_ids=None, deterministic=True):
    d_head = self.d_model // self.n_head
    def proj_init(key, shape, dtype=jnp.float32):
        return nn.initializers.xavier_normal()(key, shape, dtype)
    w_q = self.param("w_q", proj_init, (self.n_head, self.d_model, d_head))
    w_k = self.param("w_k", proj_init, (self.n_head, self.d_model, d_head))
    w_v = self.param("w_v", proj_init, (self.n_head, self.d_model, d_head))
    w_o = self.param("w_o", proj_init, (self.n_head, d_head, self.d_model))
    self.param("rel_emb", nn.initializers.normal(stddev=d_head ** -0.5),
               (self.n_head, 2 * self.max_dist - 1, d_head))
    cdt = self.dtype
    xc = x.astype(cdt)
    q = jnp.einsum("btd,hda->bhta", xc, w_q.astype(cdt))
    k = jnp.einsum("btd,hda->bhta", xc, w_k.astype(cdt))
    v = jnp.einsum("btd,hda->bhta", xc, w_v.astype(cdt))
    logits = jnp.einsum("bhqa,bhka->bhqk", q, k) / jnp.asarray(d_head ** 0.5, cdt)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = RegenDropout(self.dropout)(probs, deterministic=deterministic)
    o = jnp.einsum("bhqk,bhka->bhqa", probs, v)
    out = jnp.einsum("bhta,haf->btf", o, w_o.astype(cdt))
    return out.astype(x.dtype)

class QKVOnlyAttention(_tf.RelativePositionalAttention):
  @nn.compact
  def __call__(self, x, *, segment_ids=None, deterministic=True):
    d_head = self.d_model // self.n_head
    def proj_init(key, shape, dtype=jnp.float32):
        return nn.initializers.xavier_normal()(key, shape, dtype)
    w_q = self.param("w_q", proj_init, (self.n_head, self.d_model, d_head))
    w_k = self.param("w_k", proj_init, (self.n_head, self.d_model, d_head))
    w_v = self.param("w_v", proj_init, (self.n_head, self.d_model, d_head))
    w_o = self.param("w_o", proj_init, (self.n_head, d_head, self.d_model))
    self.param("rel_emb", nn.initializers.normal(stddev=d_head ** -0.5),
               (self.n_head, 2 * self.max_dist - 1, d_head))
    cdt = self.dtype
    xc = x.astype(cdt)
    q = jnp.einsum("btd,hda->bhta", xc, w_q.astype(cdt))
    k = jnp.einsum("btd,hda->bhta", xc, w_k.astype(cdt))
    v = jnp.einsum("btd,hda->bhta", xc, w_v.astype(cdt))
    o = q + k + v
    out = jnp.einsum("bhta,haf->btf", o, w_o.astype(cdt))
    return out.astype(x.dtype)

import sys
which = sys.argv[1]
if which == "plain":
    run_variant("plain attention (no rel)", PlainAttention)
elif which == "qkv":
    run_variant("qkv projections only (no core)", QKVOnlyAttention)
