"""The shared EMG encoder: conv downsampling stack + transformer + heads.

Functional parity target: reference ``architecture.py`` — three stride-2
residual conv blocks take raw 8-channel EMG (≈689 Hz) down 8× to the
~86 fps frame rate, a linear layer feeds a 6-layer relative-position
transformer (d=768, h=8, ff=3072), and linear heads emit 80-dim mels (or 38
CTC symbols) plus optional 48-way phoneme logits. Train-time augmentation
shifts the raw signal left by a random 0–7 samples
(``architecture.py:64-68``), reproduced here with JAX PRNG under a ``shift``
rng collection instead of Python-global randomness.

TPU-first notes:
- convs are ``(B, L, C)`` feature-last, lowering to XLA's fused
  conv-batchnorm-relu pattern on the MXU; explicit (1,1) padding matches the
  reference's sample alignment,
- BatchNorm can sync batch statistics across the data mesh axis via
  ``axis_name`` (the reference is single-device; per-replica stats would
  silently change the math under data parallelism),
- the whole forward is shape-static: (N, 200·8, 8) raw chunks in,
  (N, 200, out) frames out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import TransformerEncoderLayer


class ResBlock(nn.Module):
    """conv-bn-relu → conv-bn (+ 1×1-conv-bn shortcut) → relu
    (reference ``architecture.py:14-40``)."""

    channels: int
    stride: int = 1
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            # f32 BN measured FASTER than dtype=self.dtype here (89.6 vs
            # 95.4 ms/step): bf16 BN still reduces stats in f32
            # (force_float32_reductions) so it only adds casts and breaks
            # the conv→BN→relu fusion XLA finds for the uniform-f32 chain
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.bn_axis_name if train else None,
                dtype=jnp.float32, name=name)

        residual = x
        h = nn.Conv(self.channels, kernel_size=(3,), strides=(self.stride,),
                    padding=[(1, 1)], dtype=self.dtype, name="conv1")(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.channels, kernel_size=(3,), strides=(1,),
                    padding=[(1, 1)], dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)

        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(self.channels, kernel_size=(1,),
                               strides=(self.stride,), padding=[(0, 0)],
                               dtype=self.dtype, name="residual_path")(x)
            residual = bn("res_norm")(residual)

        return nn.relu(h + residual)


class EMGEncoder(nn.Module):
    """Raw EMG → frame representations → output head(s).

    ``num_outs`` is 80 for transduction (mel bins) or 38 for recognition
    (chars + CTC blank); ``num_aux_outs=48`` adds the phoneme head
    (reference ``architecture.py:42-59``).
    """

    num_outs: int
    num_aux_outs: Optional[int] = None
    model_size: int = 768
    num_layers: int = 6
    num_heads: int = 8
    dim_feedforward: int = 3072
    dropout: float = 0.2
    max_dist: int = 100
    bn_axis_name: Optional[str] = None
    num_sessions: Optional[int] = None  # optional session embedding
    dtype: jnp.dtype = jnp.float32
    # train-time random raw shift (architecture.py:64-68); disable for
    # deterministic cross-framework training-parity runs
    shift_augment: bool = True
    # checkpoint each transformer layer (recompute in bwd instead of
    # saving residuals — wins when HBM bandwidth bounds the step)
    remat_layers: bool = False
    # fused Pallas rel-attention kernel (non-segment-masked calls)
    fused_attention: bool = True

    @nn.compact
    def __call__(self, x_feat: jnp.ndarray, x_raw: jnp.ndarray,
                 session_ids: Optional[jnp.ndarray] = None, *,
                 segment_ids: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """x_feat (B, T, 112) is accepted for API parity but — like the
        reference model (``architecture.py:61-75``) — unused: the encoder
        consumes only the raw signal. x_raw is (B, 8T, 8)."""
        del x_feat

        if train and self.shift_augment:
            # random left-shift 0..7 of the raw signal, one draw per batch
            r = jax.random.randint(self.make_rng("shift"), (), 0, 8)
            t = x_raw.shape[1]
            rolled = jnp.roll(x_raw, -r, axis=1)
            keep = (jnp.arange(t) < t - r)[None, :, None]
            x_raw = jnp.where(keep, rolled, 0.0)

        h = x_raw
        for i in range(3):
            h = ResBlock(self.model_size, stride=2,
                         bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                         name=f"res{i}")(h, train=train)
        h = nn.Dense(self.model_size, dtype=self.dtype, name="w_raw_in")(h)

        if self.num_sessions is not None and session_ids is not None:
            emb = nn.Embed(self.num_sessions, self.model_size,
                           name="session_embed")(session_ids)
            h = h + emb

        run_layer = None
        if self.remat_layers:
            # bind the static/bool kwargs via closure: only the activation
            # flows through the checkpoint boundary
            run_layer = nn.remat(
                lambda mdl, x: mdl(x, segment_ids=segment_ids,
                                   deterministic=not train),
                policy=jax.checkpoint_policies.nothing_saveable)
        for i in range(self.num_layers):
            layer = TransformerEncoderLayer(
                d_model=self.model_size, n_head=self.num_heads,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                max_dist=self.max_dist, dtype=self.dtype,
                fused=self.fused_attention, name=f"layer{i}")
            h = (run_layer(layer, h) if run_layer is not None
                 else layer(h, segment_ids=segment_ids,
                            deterministic=not train))

        # heads matmul in the compute dtype (bf16 operands run the MXU at
        # full rate and skip an f32 upcast pass of h); results are emitted
        # in f32 for the losses/eval consumers
        out = nn.Dense(self.num_outs, dtype=self.dtype,
                       name="w_out")(h).astype(jnp.float32)
        if self.num_aux_outs is not None:
            aux = nn.Dense(self.num_aux_outs, dtype=self.dtype,
                           name="w_aux")(h).astype(jnp.float32)
            return out, aux
        return out
