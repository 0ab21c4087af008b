"""Recognition (CTC) TRAINING parity vs the actual PyTorch reference.

Mirror of tests/test_training_parity.py for the CTC loop
(``recognition_model.py:61-117``): the genuine reference model trained
with a line-faithful replica of the reference step — ``combine_fixed_length``
packing, log_softmax + ``F.ctc_loss`` (mean reduction = per-example NLL /
target length), gradient accumulation over 2 batches with
``optim.step`` every second batch, batch-counted linear warmup — against
our RecognitionTrainer (optax.ctc_loss + MultiSteps(2)) from
converted-identical initialization on identical batches. This pins exactly
the spots a silent mismatch would hide: optax-vs-torch CTC normalization,
the accum x2 timing, and the warmup/MultiSteps interaction
(VERDICT round-2 item 5).

Determinism knobs as in the transduction twin: dropout 0, shift aug off,
float32, identical utterance order, chunk_bucket=1.
"""

import sys

import numpy as np
import pytest

import jax

from test_training_parity import (
    _combine_fixed_length_torch, _decollate_torch, _patch_torch2_compat,
    _ref_batches)

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

    root = str(tmp_path_factory.mktemp("corpus_parity_ctc"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=11)


def run_reference_ctc(ref_architecture, torch, example_batches, *,
                      n_steps, seq_len, warmup, target_lr, wd, seed=0):
    """Line-faithful replica of recognition_model.py:61-117 on the genuine
    torch model; returns the per-batch loss list."""
    import torch.nn.functional as F
    from torch import nn

    n_chars = 37  # len(TextTransform().chars), recognition_model.py:66
    torch.manual_seed(seed)
    ref_model = ref_architecture.Model(112, n_chars + 1)
    _patch_torch2_compat(ref_model)
    ref_model.train()
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_architecture.random.randrange = lambda n: 0  # disable shift aug

    optim = torch.optim.AdamW(ref_model.parameters(), lr=target_lr,
                              weight_decay=wd)

    def set_lr(lr):
        for g in optim.param_groups:
            g["lr"] = lr

    def schedule_lr(batch_idx):  # recognition_model.py:80-85
        it = batch_idx + 1
        if it <= warmup:
            set_lr(it * target_lr / warmup)

    t_batches = _ref_batches(torch, example_batches)
    for tb, exs in zip(t_batches, example_batches):
        tb["text_int"] = [
            torch.tensor(np.asarray(e["text_int"], np.int64))
            for e in exs]
        tb["text_int_lengths"] = [len(e["text_int"]) for e in exs]

    losses = []
    optim.zero_grad()
    for batch_idx in range(n_steps):
        b = t_batches[batch_idx % len(t_batches)]
        schedule_lr(batch_idx)
        X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
        Xr = _combine_fixed_length_torch(torch, b["raw_emg"], seq_len * 8)
        sess = _combine_fixed_length_torch(torch, b["session_ids"],
                                           seq_len)
        pred = ref_model(X, Xr, sess)
        pred = F.log_softmax(pred, 2)
        pred = nn.utils.rnn.pad_sequence(
            _decollate_torch(pred, b["lengths"]), batch_first=False)
        y = nn.utils.rnn.pad_sequence(b["text_int"], batch_first=True)
        loss = F.ctc_loss(pred, y, b["lengths"], b["text_int_lengths"],
                          blank=n_chars)
        losses.append(float(loss.item()))
        loss.backward()
        if (batch_idx + 1) % 2 == 0:  # accum x2, recognition_model.py:105
            optim.step()
            optim.zero_grad()
    return losses, ref_model


def run_ours_ctc(corpus, example_batches, init_state_dict, *, n_steps,
                 seq_len, warmup, target_lr, wd):
    from silent_speech_tpu.config import Config
    from silent_speech_tpu.models.convert import torch_to_flax
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.checkpoint import load_params_into_state
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    model_size, num_layers = 64, 2
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
    cfg.data.chunk_bucket = 1
    cfg.recognition.l2 = wd
    cfg.recognition.grad_accum = 2
    cfg.recognition.moment_dtype = "float32"  # bit-exact optax parity

    params, stats = torch_to_flax(init_state_dict, num_layers=num_layers)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = RecognitionTrainer(cfg, mesh=mesh)
    packed = [trainer._pack(exs) for exs in example_batches]
    trainer.init_state(packed[0], seed=0)
    trainer.state = load_params_into_state(trainer.state, params, stats)

    from silent_speech_tpu.train.schedule import warmup_lr

    rng = jax.random.PRNGKey(0)
    losses = []
    for batch_idx in range(n_steps):
        b = packed[batch_idx % len(packed)]
        db = trainer._to_device(b)
        trainer.state, m = trainer._train_step(
            trainer.state, db, rng,
            np.float32(warmup_lr(batch_idx, target_lr, warmup)))
        losses.append(float(m["loss"]))
    return losses, trainer


def test_ctc_training_loss_trajectory_matches_reference(ref_modules,
                                                        corpus):
    ref_architecture, torch = ref_modules
    from absl import flags

    from silent_speech_tpu.data.dataset import EMGDataset

    seq_len, warmup, target_lr, wd = 40, 4, 1e-3, 1e-7
    flags.FLAGS.model_size = 64
    flags.FLAGS.num_layers = 2
    flags.FLAGS.dropout = 0.0

    ds = EMGDataset(corpus, dev=False, test=False)
    examples = [ds[i] for i in range(len(ds))]
    examples.sort(key=lambda e: not bool(e["silent"]))
    batch_ids = [list(range(0, 4)), list(range(4, len(examples)))]
    example_batches = [[examples[i] for i in ids] for ids in batch_ids]

    n_steps = 8  # 4 optimizer steps through the accum-x2 path
    ref_losses, _ = run_reference_ctc(
        ref_architecture, torch, example_batches, n_steps=n_steps,
        seq_len=seq_len, warmup=warmup, target_lr=target_lr, wd=wd)

    torch.manual_seed(0)
    init_model = ref_architecture.Model(112, 38)
    sd = {k: v.detach().numpy() for k, v in init_model.state_dict().items()}
    our_losses, _ = run_ours_ctc(
        corpus, example_batches, sd, n_steps=n_steps, seq_len=seq_len,
        warmup=warmup, target_lr=target_lr, wd=wd)

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3)
    assert our_losses[-1] < our_losses[0]
    assert ref_losses[-1] < ref_losses[0]
