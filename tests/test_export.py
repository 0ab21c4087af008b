"""Serving export: StableHLO bundles round-trip and match live inference."""

import numpy as np
import pytest

import jax

from silent_speech_tpu.config import Config
from silent_speech_tpu.data.dataset import EMGDataset
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.eval.export import ServingBundle, save_serving_bundle
from silent_speech_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas



@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_export"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=4, seed=7)


def _cfg(corpus_cfg, out):
    cfg = Config()
    cfg.data = corpus_cfg
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 128
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.transduction.output_directory = out
    return cfg


def _buckets_for(t):
    b = 32 * ((t + 31) // 32)
    return (b, 2 * b)


@pytest.fixture(scope="module")
def devset(corpus):
    return EMGDataset(corpus, dev=True)


def test_transduction_bundle_matches_live(corpus, devset, tmp_path):
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = _cfg(corpus, str(tmp_path))
    trainer = TransductionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    trainer.init_state(trainer._pack([devset[0]]), seed=0)

    ex = devset[0]
    bundle_dir = save_serving_bundle(
        trainer, "transduction", str(tmp_path / "bundle"),
        t_buckets=_buckets_for(ex["emg"].shape[0]))

    bundle = ServingBundle.load(bundle_dir)
    got = bundle.predict(np.asarray(ex["emg"]), np.asarray(ex["raw_emg"]),
                         np.asarray(ex["session_ids"]))
    want = trainer.predict(ex)
    assert got.shape == want.shape == (ex["emg"].shape[0], 80)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # multi-platform lowering recorded in the manifest
    assert bundle.manifest["platforms"] == ["cpu", "tpu"]

    # a longer utterance picks the next bucket; overflow refuses loudly
    t_max = bundle.manifest["t_buckets"][-1]
    with pytest.raises(ValueError, match="largest exported bucket"):
        bundle.predict(np.zeros((t_max + 1, 112), np.float32),
                       np.zeros(((t_max + 1) * 8, 8), np.float32))

    # regression: Exported.call re-traces (and re-compiles the
    # deserialized StableHLO) on EVERY invocation — 7.2 s/call vs 41 ms
    # on the TPU latency bench. ServingBundle must serve repeat calls
    # from the per-bucket jit executable cache.
    again = bundle.predict(np.asarray(ex["emg"]),
                           np.asarray(ex["raw_emg"]),
                           np.asarray(ex["session_ids"]))
    np.testing.assert_array_equal(got, again)
    bucket = next(t for t in bundle.manifest["t_buckets"]
                  if t >= ex["emg"].shape[0])
    assert bundle._calls[bucket]._cache_size() == 1, (
        "repeat predict() on one bucket must hit the jit cache, "
        "not re-trace the deserialized export")


def test_int8_bundle_close_to_live(corpus, devset, tmp_path):
    """Weight-only int8 serving: big kernels stored as per-channel int8,
    output within a small relative error of the float forward."""
    from silent_speech_tpu.eval.export import is_quantized_leaf
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = _cfg(corpus, str(tmp_path))
    trainer = TransductionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    trainer.init_state(trainer._pack([devset[0]]), seed=0)

    ex = devset[0]
    bundle_dir = save_serving_bundle(
        trainer, "transduction", str(tmp_path / "bundle_q"),
        t_buckets=_buckets_for(ex["emg"].shape[0]), quantize="int8")

    bundle = ServingBundle.load(bundle_dir)
    assert bundle.manifest["quantize"] == "int8"

    # the big kernels really are int8 on disk — including the attention
    # projections (w_q/w_k/w_v/w_o), not just flax "kernel" leaves
    q_names = []

    def count(node, name=""):
        if is_quantized_leaf(node):
            assert np.asarray(node["int8"]).dtype == np.int8
            q_names.append(name)
        elif isinstance(node, dict):
            for k, v in node.items():
                count(v, k)

    count(bundle.params)
    assert len(q_names) >= 4, f"expected several quantized kernels: {q_names}"
    for attn in ("w_q", "w_k", "w_v", "w_o"):
        assert attn in q_names, f"{attn} not quantized: {sorted(set(q_names))}"

    got = bundle.predict(np.asarray(ex["emg"]), np.asarray(ex["raw_emg"]),
                         np.asarray(ex["session_ids"]))
    want = trainer.predict(ex)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
    assert rel < 0.05, f"int8 relative error {rel:.4f}"


def test_vocoder_bundle_matches_live(tmp_path):
    from silent_speech_tpu.eval.export import save_vocoder_bundle
    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, generator_apply, init_generator_params,
    )

    cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=80)
    params = init_generator_params(jax.random.PRNGKey(0), cfg)

    class V:
        pass

    v = V()
    v.params, v.cfg = params, cfg
    d = save_vocoder_bundle(v, str(tmp_path / "voc"), mel_buckets=(32, 64))

    bundle = ServingBundle.load(d)
    mel = np.random.default_rng(5).normal(size=(20, 80)).astype(np.float32)
    got = bundle.vocode(mel)
    want = np.asarray(generator_apply(params, np.asarray(mel)[None], cfg))[0]
    hop = cfg.hop_length
    assert got.shape == (20 * hop,)
    # everything outside the pad boundary's receptive field matches
    np.testing.assert_allclose(got[: -8 * hop], want[: -8 * hop],
                               atol=2e-5, rtol=1e-4)


def test_export_cli_corpus_free(tmp_path):
    """The export CLI needs only the checkpoint — no training corpus on
    the exporting host."""
    import os
    import subprocess
    import sys

    from silent_speech_tpu.eval.export import _synthetic_example
    from silent_speech_tpu.train.checkpoint import (
        export_reference_checkpoint,
    )
    from silent_speech_tpu.train.transduction import TransductionTrainer

    pytest.importorskip("torch")
    # default data config (no corpus dirs touched); dim_feedforward stays
    # at the architecture default — the CLI has no flag for it, so the
    # subprocess must rebuild the same shapes
    cfg = Config()
    cfg.model.model_size = 64
    cfg.model.num_layers = 2
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    trainer = TransductionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    trainer.init_state(trainer._pack([_synthetic_example()]), seed=0)
    model_pt = str(tmp_path / "model.pt")
    export_reference_checkpoint(trainer.state, model_pt)

    env = dict(os.environ)
    env["SSTPU_FORCE_PLATFORM"] = "cpu:1"
    out = str(tmp_path / "serving")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "silent_speech_tpu.eval.export",
         "--output_directory", out, "--model_size", "64",
         "--num_layers", "2", "--dropout", "0.0", "--models", model_pt,
         "--t_buckets", "128"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=800)
    assert r.returncode == 0, r.stderr[-3000:]

    bundle = ServingBundle.load(out)
    got = bundle.predict(np.zeros((100, 112), np.float32),
                         np.zeros((800, 8), np.float32),
                         np.zeros(100, np.int64))
    assert got.shape == (100, 80) and np.isfinite(got).all()


def test_recognition_bundle_matches_live(corpus, devset, tmp_path):
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    cfg = _cfg(corpus, str(tmp_path))
    trainer = RecognitionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    trainer.init_state(trainer._pack([devset[0]]), seed=0)

    ex = devset[0]
    bundle_dir = save_serving_bundle(
        trainer, "recognition", str(tmp_path / "bundle"),
        t_buckets=_buckets_for(ex["emg"].shape[0]))

    bundle = ServingBundle.load(bundle_dir)
    # the live eval path zeroes session ids (recognition.py::predict_logits)
    got = bundle.predict(np.asarray(ex["emg"]), np.asarray(ex["raw_emg"]))
    want = trainer.predict_logits(ex)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # standalone greedy decode works from the manifest charset alone
    text = bundle.decode_greedy(got)
    assert isinstance(text, str)
