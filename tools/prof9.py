"""Knockout profile of the full train step (fused attention active).

Variants isolate: AdamW state traffic (sgd), DTW+phoneme loss (mse),
dropout, shift augmentation. Run: python tools/prof9.py <variant>...
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")
from silent_speech_tpu.config import Config
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.data.device_cache import DeviceCorpus
from bench import build_examples


def run_variant(name, mutate_cfg=None, mutate_trainer=None,
                patch_loss=False):
    import silent_speech_tpu.train.transduction as tmod
    orig_loss = tmod.transduction_loss
    if patch_loss:
        def mse_only(pred, phoneme_pred, batch, w=0.5, phoneme_eval=False,
                     n_silent=None, **kw):
            out = jnp.mean((pred.astype(jnp.float32)
                            - pred.shape[-1] * 0.01) ** 2)
            out = out + 1e-6 * jnp.mean(phoneme_pred.astype(jnp.float32)
                                        ** 2)
            from silent_speech_tpu.train.losses import TransductionLossOut
            z = jnp.zeros((), jnp.float32)
            return TransductionLossOut(loss=out, correct_phones=z,
                                       total_length=z + 1.0,
                                       confusion=None)
        tmod.transduction_loss = mse_only
    try:
        cfg = Config()
        if mutate_cfg:
            mutate_cfg(cfg)
        mesh = make_mesh(1, 1, devices=jax.devices()[:1])
        trainer = tmod.TransductionTrainer(cfg, mesh=mesh)
        if mutate_trainer:
            mutate_trainer(trainer)
        example_sets = [build_examples(np.random.default_rng(i))
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
        wave = 4

        def one_wave(i):
            groups = [id_sets[(i + j) % 4] for j in range(wave)]
            return trainer.cache_scan_ids(corpus, groups, rng,
                                          [1e-3] * wave)
        for i in range(6):
            m = one_wave(i)
        float(m["loss"][-1])
        t0 = time.time()
        n = 6
        for i in range(n):
            m = one_wave(i)
        float(m["loss"][-1])
        dt = time.time() - t0
        print(f"{name:40s} {dt/(n*wave)*1000:7.2f} ms/step", flush=True)
    finally:
        tmod.transduction_loss = orig_loss


def to_sgd(trainer):
    trainer.tx = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)


def no_drop(cfg):
    cfg.model.dropout = 0.0


def no_shift(cfg):
    cfg.model.shift_augment = False


VARIANTS = {
    "full": dict(),
    "nodp": dict(),
    "sgd": dict(mutate_trainer=to_sgd),
    "mse": dict(patch_loss=True),
    "nodrop": dict(mutate_cfg=no_drop),
    "noshift": dict(mutate_cfg=no_shift),
}


def _patch_identity_bn():
    """Replace flax BatchNorm with identity (isolates BN cost; convs stay)."""
    from flax import linen as nn

    class IdentityBN(nn.Module):
        use_running_average: bool = True
        momentum: float = 0.9
        epsilon: float = 1e-5
        axis_name: object = None
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            return x

    orig = nn.BatchNorm
    nn.BatchNorm = IdentityBN
    return orig


def _patch_identity_ln():
    """Replace flax LayerNorm with identity (isolates transformer LN cost)."""
    from flax import linen as nn

    class IdentityLN(nn.Module):
        dtype: object = None

        @nn.compact
        def __call__(self, x):
            return x

    orig = nn.LayerNorm
    nn.LayerNorm = IdentityLN
    return orig


def _patch_no_attn_dropout():
    """Disable only the fused attention kernel's in-kernel probs dropout."""
    import silent_speech_tpu.ops.pallas.rel_attention as ra
    orig = ra.fused_rel_attention

    def f(q, k, v, e, seed, m, thresh):
        return orig(q, k, v, e, seed, m, 0)
    ra.fused_rel_attention = f
    return ra, orig


def _patch_no_res_dropout():
    """Disable only the residual-site dropout inside FusedResidualNorm."""
    import silent_speech_tpu.ops.fused_norm as fnorm
    orig = fnorm.dropout_threshold
    fnorm.dropout_threshold = lambda r: 0
    return fnorm, orig


def _patch_no_ffn_dropout():
    """Disable only the FFN relu_dropout site (transformer module)."""
    import silent_speech_tpu.models.transformer as tf
    orig = tf.dropout_threshold
    tf.dropout_threshold = lambda r: 0
    return tf, orig


def _patch_cheap_conv():
    """Replace the ResBlock body with one stride-2 1x1 conv (+relu):
    isolates the full conv+BN downsampling stack's cost."""
    import silent_speech_tpu.models.encoder as enc
    from flax import linen as nn

    def cheap(self, x, train=False):
        h = nn.Conv(self.channels, kernel_size=(1,), strides=(self.stride,),
                    padding=[(0, 0)], dtype=self.dtype,
                    name="cheap_conv")(x)
        return nn.relu(h)

    orig = enc.ResBlock.__call__
    enc.ResBlock.__call__ = nn.compact(cheap)
    return enc, orig

def _patch_f32_loss():
    """Force the loss interior's matmul dtype to f32 (A/B for the round-3
    bf16-interior change, which inherits the trainer's compute dtype)."""
    import silent_speech_tpu.train.transduction as tmod

    orig = tmod.transduction_loss

    def f32(*a, **kw):
        kw["matmul_dtype"] = jnp.float32
        return orig(*a, **kw)

    tmod.transduction_loss = f32
    return tmod, orig


def _patch_identity_dp():
    import silent_speech_tpu.train.losses as L
    orig = L.dtw_align_batch

    def ident(costs, n1, n2):
        k, t1, t2 = costs.shape
        al = jnp.broadcast_to(jnp.arange(t1)[None, :], (k, t1))
        return jnp.minimum(al, (n2 - 1)[:, None]).astype(jnp.int32), \
            jnp.zeros((k,), costs.dtype)
    L.dtw_align_batch = ident
    return orig


if __name__ == "__main__":
    for name in sys.argv[1:]:
        if name == "nodp":
            orig = _patch_identity_dp()
            try:
                run_variant(name)
            finally:
                import silent_speech_tpu.train.losses as L
                L.dtw_align_batch = orig
        elif name == "nobn":
            orig = _patch_identity_bn()
            try:
                run_variant(name)
            finally:
                from flax import linen as nn
                nn.BatchNorm = orig
        elif name == "noln":
            orig = _patch_identity_ln()
            try:
                run_variant(name)
            finally:
                from flax import linen as nn
                nn.LayerNorm = orig
        elif name == "noconv":
            enc, orig = _patch_cheap_conv()
            try:
                run_variant(name)
            finally:
                enc.ResBlock.__call__ = orig
        elif name == "f32loss":
            mod, orig = _patch_f32_loss()
            try:
                run_variant(name)
            finally:
                mod.transduction_loss = orig
        elif name == "noattndrop":
            mod, orig = _patch_no_attn_dropout()
            try:
                run_variant(name)
            finally:
                mod.fused_rel_attention = orig
        elif name == "noresdrop":
            mod, orig = _patch_no_res_dropout()
            try:
                run_variant(name)
            finally:
                mod.dropout_threshold = orig
        elif name == "noffndrop":
            mod, orig = _patch_no_ffn_dropout()
            try:
                run_variant(name)
            finally:
                mod.dropout_threshold = orig
        else:
            run_variant(name, **VARIANTS[name])
