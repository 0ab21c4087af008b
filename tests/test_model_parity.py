"""Golden parity: our Flax encoder vs the reference PyTorch model.

The reference's ``transformer.py``/``architecture.py`` are importable here
(torch-only deps), so we instantiate the actual reference model with random
weights, convert them with ``models.convert``, and require matching forward
outputs. This is the strongest possible check that the TPU reimplementation
computes the same function (SURVEY.md §7 stage 3 golden test).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas


REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture  # noqa
    import transformer as ref_transformer  # noqa

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["test"])
    return ref_architecture, ref_transformer, torch


def _patch_torch2_compat(ref_model):
    """torch>=2 fast-path introspection expects attrs the reference's custom
    attention lacks; stub them so nn.TransformerEncoder takes the slow path."""
    for layer in ref_model.transformer.layers:
        layer.self_attn.batch_first = False
        layer.self_attn._qkv_same_embed_dim = True
        layer.self_attn.in_proj_bias = None
        layer.self_attn.in_proj_weight = None
        layer.norm_first = False


def _small_flags(ref_architecture, model_size=64, num_layers=2, dropout=0.0):
    from absl import flags

    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = dropout


def _forward_pair(ref_modules, seq_t, model_size=64, num_layers=2,
                  num_outs=80, num_aux=48):
    """Build ref torch model + converted flax model; return both outputs."""
    ref_architecture, _, torch = ref_modules
    _small_flags(ref_architecture, model_size, num_layers)

    torch.manual_seed(0)
    ref_model = ref_architecture.Model(112, num_outs, num_aux)
    ref_model.eval()
    _patch_torch2_compat(ref_model)

    b = 2
    rng = np.random.default_rng(0)
    x_raw = rng.normal(size=(b, seq_t * 8, 8)).astype(np.float32)
    x_feat = rng.normal(size=(b, seq_t, 112)).astype(np.float32)
    sess = np.zeros((b, seq_t), dtype=np.int64)

    with torch.no_grad():
        t_out, t_aux = ref_model(
            torch.tensor(x_feat), torch.tensor(x_raw), torch.tensor(sess))

    state = {k: v.detach().numpy()
             for k, v in ref_model.state_dict().items()}

    from silent_speech_tpu.models.convert import torch_to_flax
    from silent_speech_tpu.models.encoder import EMGEncoder

    params, stats = torch_to_flax(state, num_layers=num_layers)
    model = EMGEncoder(num_outs=num_outs, num_aux_outs=num_aux,
                       model_size=model_size, num_layers=num_layers,
                       dropout=0.0)
    j_out, j_aux = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_feat), jnp.asarray(x_raw), jnp.asarray(sess),
        train=False)
    return (t_out.numpy(), t_aux.numpy(),
            np.asarray(j_out), np.asarray(j_aux))


def test_forward_parity_short(ref_modules):
    t_out, t_aux, j_out, j_aux = _forward_pair(ref_modules, seq_t=40)
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(j_out, t_out, atol=2e-4)
    np.testing.assert_allclose(j_aux, t_aux, atol=2e-4)


def test_forward_parity_long_exceeds_relpos_window(ref_modules):
    # T=120 > max_relative_pos=100 exercises the out-of-range −1e8 masking
    t_out, t_aux, j_out, j_aux = _forward_pair(ref_modules, seq_t=120)
    np.testing.assert_allclose(j_out, t_out, atol=5e-4)
    np.testing.assert_allclose(j_aux, t_aux, atol=5e-4)


def test_checkpoint_roundtrip(ref_modules):
    """flax→torch→flax conversion is the identity."""
    ref_architecture, _, torch = ref_modules
    _small_flags(ref_architecture)
    torch.manual_seed(1)
    ref_model = ref_architecture.Model(112, 80, 48)
    state = {k: v.detach().numpy()
             for k, v in ref_model.state_dict().items()}

    from silent_speech_tpu.models.convert import torch_to_flax, flax_to_torch

    params, stats = torch_to_flax(state, num_layers=2)
    back = flax_to_torch(params, stats)
    for k, v in state.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
