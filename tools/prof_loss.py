"""Component breakdown of the transduction loss at bench shapes.

Times fwd+bwd of the loss alone (pred/phone as differentiated inputs) in a
scanned jit, with knockouts for the DTW DP, the distance matrices, and the
gathers, to locate the 7.9 ms the full-step profile attributes to the loss.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from silent_speech_tpu.config import Config
from silent_speech_tpu.data.packing import pack_batch
from silent_speech_tpu.train import losses as L
from bench import build_examples

cfg = Config()
examples = build_examples(np.random.default_rng(0))
# silent-first like the trainer
examples.sort(key=lambda e: not e["silent"])
n_sil = sum(e["silent"] for e in examples)
n_silent = -(-n_sil // 4) * 4
batch = pack_batch(examples, seq_len=200, chunk_bucket=8, utt_bucket=8,
                   fixed_chunks=112, fixed_utts=64, fixed_t=1024)
db = batch.device_batch()
db = jax.device_put(db)
N, Lx = db.emg.shape[:2]
print(f"packed: chunks={N} utts={db.utt_gather_idx.shape[0]} "
      f"t_cap={db.utt_gather_idx.shape[1]} n_silent={n_silent}", flush=True)

pred0 = jnp.asarray(np.random.default_rng(1).normal(
    size=(N, Lx, 80)).astype(np.float32))
phone0 = jnp.asarray(np.random.default_rng(2).normal(
    size=(N, Lx, 48)).astype(np.float32))


def mk(loss_fn, steps):
    @jax.jit
    def run(pred, phone, db):
        def body(c, i):
            p, q = c

            def f(p, q):
                out = loss_fn(p, q, db)
                return out.loss
            l, (gp, gq) = jax.value_and_grad(f, argnums=(0, 1))(p, q)
            return (p - 1e-6 * gp, q - 1e-6 * gq), l
        (p, q), ls = jax.lax.scan(body, (pred, phone), jnp.arange(steps))
        return ls.sum()
    return run


def bench(loss_fn, name):
    r4, r16 = mk(loss_fn, 4), mk(loss_fn, 16)
    float(r4(pred0, phone0, db)); float(r16(pred0, phone0, db))
    t4 = time.time()
    for _ in range(3):
        float(r4(pred0, phone0, db))
    t4 = (time.time() - t4) / 3
    t16 = time.time()
    for _ in range(3):
        float(r16(pred0, phone0, db))
    t16 = (time.time() - t16) / 3
    print(f"{name:22s} {(t16 - t4) / 12 * 1000:7.3f} ms/loss-step",
          flush=True)


def full(p, q, db):
    return L.transduction_loss(p, q, db, 0.5, n_silent=n_silent)


def no_dtw(p, q, db):
    orig = L.dtw_align_batch

    def ident(costs, n1, n2):
        k, t1, t2 = costs.shape
        al = jnp.broadcast_to(jnp.arange(t1)[None, :], (k, t1))
        return jnp.minimum(al, (n2 - 1)[:, None]).astype(jnp.int32), \
            jnp.zeros((k,), costs.dtype)
    L.dtw_align_batch = ident
    try:
        return L.transduction_loss(p, q, db, 0.5, n_silent=n_silent)
    finally:
        L.dtw_align_batch = orig


def voiced_only(p, q, db):
    return L.transduction_loss(p, q, db, 0.5, n_silent=0)


if __name__ == "__main__":
    bench(full, "full")
    bench(no_dtw, "no_dtw(dists+gather)")
    bench(voiced_only, "voiced_only(no Ksl)")
