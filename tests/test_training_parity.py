"""End-to-end TRAINING parity vs the actual PyTorch reference.

The strongest available substitute for the unreproducible 36%/28% WER
numbers (VERDICT round-1 item 3): train the real reference model
(``/root/reference/architecture.py`` — importable, torch-only) with a
line-faithful replica of the reference training step — ``dtw_loss``
(``transduction_model.py:98-157``), AdamW(wd=1e-7) + linear warmup
(``transduction_model.py:178-189``), ``combine_fixed_length`` packing
(``data_utils.py:158-167``) — and our TPU trainer from converted-identical
initialization on identical synthetic batches, then require the per-step
loss trajectories to agree.

(The reference's own ``train_model`` cannot be imported here — its module
pulls librosa/numba/soundfile which are absent — so the step is re-created
from its cited source lines; the *model* is the genuine reference module.)

Determinism knobs: dropout 0, shift augmentation off on both sides
(different RNGs), float32 compute, identical utterance order (silent-first,
as our packer sorts), chunk_bucket=1 (no extra BN-visible pad chunks).
"""

import sys

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas


REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["test"])
    return ref_architecture, torch


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from silent_speech_tpu.data.synthetic import generate_corpus

    root = str(tmp_path_factory.mktemp("corpus_parity"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=11)


def _patch_torch2_compat(ref_model):
    for layer in ref_model.transformer.layers:
        layer.self_attn.batch_first = False
        layer.self_attn._qkv_same_embed_dim = True
        layer.self_attn.in_proj_bias = None
        layer.self_attn.in_proj_weight = None
        layer.norm_first = False


def _combine_fixed_length_torch(torch, tensors, length):
    """Reference ``data_utils.py:158-167``."""
    total = sum(t.shape[0] for t in tensors)
    n = -(-total // length)
    flat = torch.zeros((n * length,) + tuple(tensors[0].shape[1:]),
                       dtype=tensors[0].dtype)
    pos = 0
    for t in tensors:
        flat[pos: pos + t.shape[0]] = t
        pos += t.shape[0]
    return flat.reshape((n, length) + tuple(tensors[0].shape[1:]))


def _decollate_torch(packed, lengths):
    """Reference ``data_utils.py:169-178``."""
    n, s = packed.shape[:2]
    flat = packed.reshape((n * s,) + tuple(packed.shape[2:]))
    out, pos = [], 0
    for ln in lengths:
        out.append(flat[pos: pos + ln])
        pos += ln
    return out


def _ref_dtw_loss(torch, F, pred, phoneme_pred, batch, w=0.5):
    """Reference ``transduction_model.py:98-157`` (training path)."""
    from silent_speech_tpu.ops.dtw import align_from_distances_numpy

    preds = _decollate_torch(pred, batch["lengths"])
    phones = _decollate_torch(phoneme_pred, batch["lengths"])
    losses = []
    total_length = 0
    for p, y, pp, yp, silent in zip(preds, batch["audio_features"], phones,
                                    batch["phonemes"], batch["silent"]):
        if silent:
            costs = torch.cdist(p.unsqueeze(0), y.unsqueeze(0)).squeeze(0)
            lp = F.log_softmax(pp, -1)
            costs = costs + w * -lp[:, yp]
            align = align_from_distances_numpy(
                costs.T.detach().numpy())
            loss = costs[align, range(len(align))].sum()
        else:
            dists = F.pairwise_distance(y, p)
            loss = dists.sum() + w * F.cross_entropy(pp, yp,
                                                     reduction="sum")
        losses.append(loss)
        total_length += y.shape[0]
    return sum(losses) / total_length


def _ref_batches(torch, examples_per_batch):
    """Reference collate_raw-equivalent dicts from our example dicts."""
    batches = []
    for exs in examples_per_batch:
        batches.append({
            "emg": [torch.tensor(np.asarray(e["emg"], np.float32))
                    for e in exs],
            "raw_emg": [torch.tensor(np.asarray(e["raw_emg"], np.float32))
                        for e in exs],
            "session_ids": [
                torch.tensor(np.asarray(e["session_ids"], np.int64))
                for e in exs],
            "audio_features": [torch.tensor(np.asarray(
                e["parallel_voiced_audio_features"] if e["silent"]
                else e["audio_features"], np.float32)) for e in exs],
            "phonemes": [torch.tensor(np.asarray(e["phonemes"], np.int64))
                         for e in exs],
            "silent": [bool(e["silent"]) for e in exs],
            "lengths": [e["emg"].shape[0] for e in exs],
        })
    return batches


def test_training_loss_trajectory_matches_reference(ref_modules, corpus):
    ref_architecture, torch = ref_modules
    import torch.nn.functional as F
    from absl import flags

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.models.convert import torch_to_flax
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.schedule import warmup_lr
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from silent_speech_tpu.train.checkpoint import load_params_into_state

    model_size, num_layers, seq_len = 64, 2, 40
    warmup, target_lr, wd = 4, 1e-3, 1e-7
    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = 0.0

    ds = EMGDataset(corpus, dev=False, test=False)
    examples = [ds[i] for i in range(len(ds))]
    # identical utterance order on both sides: silent-first (our packer)
    examples.sort(key=lambda e: not bool(e["silent"]))
    batch_ids = [list(range(0, 4)), list(range(4, len(examples)))]
    example_batches = [[examples[i] for i in ids] for ids in batch_ids]

    # ---- reference loop: genuine torch model + replicated step ----------
    torch.manual_seed(0)
    ref_model = ref_architecture.Model(112, 80, 48)
    _patch_torch2_compat(ref_model)
    ref_model.train()
    for m in ref_model.modules():  # dropout 0 everywhere
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    import random as pyrandom
    ref_architecture.random.randrange = lambda n: 0  # disable shift aug

    optim = torch.optim.AdamW(ref_model.parameters(), weight_decay=wd)
    t_batches = _ref_batches(torch, example_batches)

    def set_lr(lr):
        for g in optim.param_groups:
            g["lr"] = lr

    n_steps = 6
    ref_losses = []
    for step in range(n_steps):
        b = t_batches[step % len(t_batches)]
        optim.zero_grad()
        set_lr(warmup_lr(step, target_lr, warmup))
        X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
        Xr = _combine_fixed_length_torch(torch, b["raw_emg"], seq_len * 8)
        sess = _combine_fixed_length_torch(torch, b["session_ids"],
                                           seq_len)
        pred, phone = ref_model(X, Xr, sess)
        loss = _ref_dtw_loss(torch, F, pred, phone, b)
        ref_losses.append(float(loss))
        loss.backward()
        optim.step()

    # ---- our trainer from converted-identical init ----------------------
    torch.manual_seed(0)
    init_model = ref_architecture.Model(112, 80, 48)
    state_dict = {k: v.detach().numpy()
                  for k, v in init_model.state_dict().items()}
    params, stats = torch_to_flax(state_dict, num_layers=num_layers)

    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = model_size
    cfg.model.num_layers = num_layers
    cfg.model.dim_feedforward = 3072  # reference Model hardcodes this
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.model.shift_augment = False
    cfg.data.seq_len = seq_len
    cfg.data.fixed_shapes = False
    cfg.data.chunk_bucket = 1  # BN sees exactly the reference's chunks
    cfg.transduction.l2 = wd
    cfg.transduction.moment_dtype = "float32"  # bit-exact optax parity

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    packed = [trainer._pack(exs) for exs in example_batches]
    trainer.init_state(packed[0], seed=0)
    trainer.state = load_params_into_state(trainer.state, params, stats)

    rng = jax.random.PRNGKey(0)
    our_losses = []
    for step in range(n_steps):
        b = packed[step % len(packed)]
        db = trainer._to_device(b)
        trainer.state, m = trainer._train_step(
            trainer.state, db, rng,
            np.float32(warmup_lr(step, target_lr, warmup)), b.num_silent)
        our_losses.append(float(m["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)
    # the trajectory must actually descend (both frameworks learning)
    assert our_losses[-1] < our_losses[0]
    assert ref_losses[-1] < ref_losses[0]


def test_eval_metrics_match_reference(ref_modules, corpus):
    """Validation loss + phoneme accuracy parity on the dev split
    (reference ``test()``, transduction_model.py:33-55)."""
    ref_architecture, torch = ref_modules
    import torch.nn.functional as F
    from absl import flags

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.models.convert import torch_to_flax
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from silent_speech_tpu.train.checkpoint import load_params_into_state
    from silent_speech_tpu.ops.dtw import align_from_distances_numpy

    model_size, num_layers, seq_len = 64, 2, 40
    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = 0.0

    devset = EMGDataset(corpus, dev=True)
    examples = [devset[i] for i in range(len(devset))]
    examples.sort(key=lambda e: not bool(e["silent"]))

    torch.manual_seed(3)
    ref_model = ref_architecture.Model(112, 80, 48)
    _patch_torch2_compat(ref_model)
    ref_model.eval()

    # reference test(): one packed batch, dtw_loss with phoneme_eval
    b = _ref_batches(torch, [examples])[0]
    with torch.no_grad():
        X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
        Xr = _combine_fixed_length_torch(torch, b["raw_emg"], seq_len * 8)
        sess = _combine_fixed_length_torch(torch, b["session_ids"],
                                           seq_len)
        pred, phone = ref_model(X, Xr, sess)
        preds = _decollate_torch(pred, b["lengths"])
        phones = _decollate_torch(phone, b["lengths"])
        losses, correct, total = [], 0, 0
        for p, y, pp, yp, silent in zip(preds, b["audio_features"], phones,
                                        b["phonemes"], b["silent"]):
            if silent:
                costs = torch.cdist(p.unsqueeze(0),
                                    y.unsqueeze(0)).squeeze(0)
                lp = F.log_softmax(pp, -1)
                costs = costs + 0.5 * -lp[:, yp]
                align = align_from_distances_numpy(
                    costs.T.detach().numpy())
                losses.append(costs[align, range(len(align))].sum())
                pa = lp.argmax(-1)
                correct += int((pa[align] == yp).sum())
            else:
                losses.append(
                    F.pairwise_distance(y, p).sum()
                    + 0.5 * F.cross_entropy(pp, yp, reduction="sum"))
                correct += int((pp.argmax(-1) == yp).sum())
            total += y.shape[0]
        ref_loss = float(sum(losses) / total)
        ref_acc = correct / total

    state_dict = {k: v.detach().numpy()
                  for k, v in ref_model.state_dict().items()}
    params, stats = torch_to_flax(state_dict, num_layers=num_layers)

    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = model_size
    cfg.model.num_layers = num_layers
    cfg.model.dim_feedforward = 3072
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.data.seq_len = seq_len
    cfg.data.fixed_shapes = False
    cfg.data.chunk_bucket = 1

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    trainer.init_state(trainer._pack(examples), seed=0)
    trainer.state = load_params_into_state(trainer.state, params, stats)

    loss, acc, _ = trainer.evaluate(devset)
    assert loss == pytest.approx(ref_loss, rel=2e-3)
    assert acc == pytest.approx(ref_acc, abs=1e-9)
