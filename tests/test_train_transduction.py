"""End-to-end transduction training smoke tests on the synthetic corpus,
exercising the full jit train step (model fwd + DTW loss + bwd + AdamW) on
the 8-device virtual CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.config import Config
from silent_speech_tpu.data.dataset import EMGDataset
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.parallel.mesh import make_mesh
from silent_speech_tpu.train.transduction import TransductionTrainer

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas



def _tiny_config(corpus_cfg, out_dir):
    cfg = Config()
    cfg.data = corpus_cfg
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"  # determinism across meshes
    cfg.transduction.output_directory = out_dir
    cfg.transduction.learning_rate = 1e-3
    cfg.transduction.learning_rate_warmup = 10
    cfg.transduction.max_batch_len = 8000
    cfg.data.fixed_shapes = False  # dynamic buckets keep CPU tests fast
    return cfg


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_train"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=6, seed=1)


@pytest.fixture(scope="module")
def sets(corpus):
    return (EMGDataset(corpus, dev=False, test=False),
            EMGDataset(corpus, dev=True))


def test_single_device_training_decreases_loss(corpus, sets, tmp_path):
    trainset, devset = sets
    cfg = _tiny_config(corpus, str(tmp_path / "out"))
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)

    losses = []
    from silent_speech_tpu.parallel.mesh import shard_batch

    rng = jax.random.PRNGKey(0)
    batches = list(trainer.batches(trainset, seed=0))
    assert batches, "sampler produced no batches"
    trainer.init_state(batches[0], seed=0)
    for step in range(8):
        batch = batches[step % len(batches)]
        db = shard_batch(batch.device_batch(), mesh)
        trainer.state, metrics = trainer._train_step(
            trainer.state, db, rng, np.float32(1e-3), batch.num_silent)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_fit_one_epoch_and_checkpoint(corpus, sets, tmp_path):
    trainset, devset = sets
    out = str(tmp_path / "fit_out")
    cfg = _tiny_config(corpus, out)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    state = trainer.fit(trainset, devset, epochs=1, seed=0)
    assert state is not None
    assert os.path.isdir(os.path.join(out, "checkpoint"))
    # reference-format export requires torch (present in this env)
    assert os.path.exists(os.path.join(out, "model.pt"))

    # restore round-trip
    from silent_speech_tpu.train.checkpoint import restore_checkpoint

    restored = restore_checkpoint(out, trainer.state)
    np.testing.assert_array_equal(
        np.asarray(restored.step), np.asarray(trainer.state.step))
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(trainer.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_exported_checkpoint_loads_in_reference_model(corpus, sets,
                                                      tmp_path):
    """model.pt written by us must load into the actual reference Model."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from absl import flags
    import architecture as ref_architecture

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["test"])
    flags.FLAGS.model_size = 64
    flags.FLAGS.num_layers = 2

    trainset, devset = sets
    out = str(tmp_path / "export_out")
    cfg = _tiny_config(corpus, out)
    # the reference Model hardcodes dim_feedforward=3072
    cfg.model.dim_feedforward = 3072
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    batches = list(trainer.batches(trainset, seed=0))
    trainer.init_state(batches[0], seed=0)

    from silent_speech_tpu.train.checkpoint import \
        export_reference_checkpoint

    path = str(tmp_path / "model.pt")
    export_reference_checkpoint(trainer.state, path)
    ref_model = ref_architecture.Model(112, 80, 48)
    state = torch.load(path)
    missing, unexpected = ref_model.load_state_dict(state, strict=False)
    assert not unexpected
    # only num_batches_tracked counters may be missing
    assert all("num_batches_tracked" in k for k in missing)


@pytest.mark.parametrize("fused_interpret", [False, True])
def test_multidevice_data_parallel_training(corpus, sets, tmp_path,
                                            monkeypatch, fused_interpret):
    """Full train step sharded over a 4×2 (data×model) mesh — with the
    XLA attention path and (via SSTPU_INTERPRET_FUSED) the fused Pallas
    kernel in interpret mode, so the kernel stays covered under GSPMD
    partitioning."""
    if fused_interpret:
        monkeypatch.setenv("SSTPU_INTERPRET_FUSED", "1")
    trainset, devset = sets
    cfg = _tiny_config(corpus, str(tmp_path / "dp_out"))
    mesh = make_mesh(4, 2)
    trainer = TransductionTrainer(cfg, mesh=mesh)

    from silent_speech_tpu.parallel.mesh import shard_batch

    batches = list(trainer.batches(trainset, seed=0))
    trainer.init_state(batches[0], seed=0)
    rng = jax.random.PRNGKey(0)
    db = shard_batch(batches[0].device_batch(), mesh)
    state2, metrics = trainer._train_step(trainer.state, db, rng,
                                          np.float32(1e-3),
                                          batches[0].num_silent)
    assert np.isfinite(float(metrics["loss"]))

    # parity: the sharded step computes the same loss as single-device
    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer1 = TransductionTrainer(cfg, mesh=mesh1)
    trainer1.init_state(batches[0], seed=0)
    db1 = shard_batch(batches[0].device_batch(), mesh1)
    _, metrics1 = trainer1._train_step(trainer1.state, db1, rng,
                                       np.float32(1e-3),
                                       batches[0].num_silent)
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics1["loss"]), rel=2e-4)


def test_predict_and_aligned_prediction(corpus, sets, tmp_path):
    trainset, devset = sets
    cfg = _tiny_config(corpus, str(tmp_path / "pred_out"))
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    batches = list(trainer.batches(trainset, seed=0))
    trainer.init_state(batches[0], seed=0)

    ex = devset[0]
    pred = trainer.predict(ex)
    assert pred.shape == (ex["emg"].shape[0], 80)

    aligned = trainer.get_aligned_prediction(ex, devset.mfcc_norm)
    if ex["silent"]:
        assert aligned.shape[0] == \
            ex["parallel_voiced_audio_features"].shape[0]
    else:
        assert aligned.shape[0] == ex["emg"].shape[0]


def test_resume_training(corpus, sets, tmp_path):
    """fit(resume=True) restores step/epoch/plateau and continues."""
    trainset, devset = sets
    out = str(tmp_path / "resume_out")
    cfg = _tiny_config(corpus, out)
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    t1 = TransductionTrainer(cfg, mesh=mesh)
    t1.fit(trainset, devset, epochs=1, seed=0)
    step_after_1 = int(t1.state.step)

    t2 = TransductionTrainer(cfg, mesh=mesh)
    t2.fit(trainset, devset, epochs=2, seed=0, resume=True)
    # epoch 1 was skipped; steps continued from the restored count
    assert int(t2.state.step) > step_after_1
    params1 = jax.tree_util.tree_leaves(t1.state.params)
    # restored state diverged from the epoch-1 snapshot by training further
    params2 = jax.tree_util.tree_leaves(t2.state.params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(params1, params2))
