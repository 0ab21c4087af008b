"""HTTP serving daemon over exported bundles: JSON API round-trips."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from silent_speech_tpu.config import Config
from silent_speech_tpu.data.dataset import EMGDataset
from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.eval.export import (
    ServingBundle, save_serving_bundle, save_vocoder_bundle,
)
from silent_speech_tpu.eval.server import ServingServer
from silent_speech_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow  # full train-step compiles / subprocess e2e / torch replicas



@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_server"))
    return generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                           utterances_per_session=4, seed=9)


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


def _post(port, route, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_server_end_to_end(corpus, tmp_path):
    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, init_generator_params,
    )
    from silent_speech_tpu.train.recognition import RecognitionTrainer
    from silent_speech_tpu.train.transduction import TransductionTrainer

    devset = EMGDataset(corpus, dev=True)
    ex = devset[0]
    t = ex["emg"].shape[0]
    bucket = 32 * ((t + 31) // 32)
    cfg = _cfg(corpus, str(tmp_path))
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])

    trans = TransductionTrainer(cfg, mesh=mesh)
    trans.init_state(trans._pack([ex]), seed=0)
    trans_dir = save_serving_bundle(
        trans, "transduction", str(tmp_path / "trans"),
        t_buckets=(bucket,), audio_normalizer=devset.mfcc_norm)

    rec = RecognitionTrainer(cfg, mesh=mesh)
    rec.init_state(rec._pack([ex]), seed=0)
    rec_dir = save_serving_bundle(rec, "recognition",
                                  str(tmp_path / "rec"),
                                  t_buckets=(bucket,))

    # tiny hop-8 vocoder (mel frame rate mismatch is irrelevant: the
    # server just chains bundle outputs)
    gen_cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),))

    class V:
        pass

    v = V()
    v.params = init_generator_params(jax.random.PRNGKey(0), gen_cfg)
    v.cfg = gen_cfg
    voc_dir = save_vocoder_bundle(v, str(tmp_path / "voc"),
                                  mel_buckets=(bucket,))

    server = ServingServer(
        recognition=ServingBundle.load(rec_dir),
        transduction=ServingBundle.load(trans_dir),
        vocoder=ServingBundle.load(voc_dir)).start()
    try:
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30).read())
        assert health["ok"] and health["kinds"] == [
            "recognition", "transduction", "vocoder"]

        payload = {"emg": np.asarray(ex["emg"]).tolist(),
                   "raw_emg": np.asarray(ex["raw_emg"]).tolist()}

        r = _post(server.port, "/v1/recognize", payload)
        lp = np.asarray(r["log_probs"], np.float32)
        assert lp.shape == (t, 38) and isinstance(r["text"], str)
        want = server.bundles["recognition"].predict(
            np.asarray(ex["emg"]), np.asarray(ex["raw_emg"]))
        np.testing.assert_allclose(lp, want, atol=1e-5, rtol=1e-4)

        payload["session_ids"] = np.asarray(ex["session_ids"]).tolist()
        r = _post(server.port, "/v1/transduce", payload)
        mel = np.asarray(r["mel"], np.float32)
        assert mel.shape == (t, 80)
        audio = np.asarray(r["audio"], np.float32)
        assert audio.shape == (t * gen_cfg.hop_length,)
        assert np.isfinite(audio).all()

        # bad input → 400 with an error body, server stays up
        bad = {"emg": [[0.0] * 112] * 10, "raw_emg": [[0.0] * 8] * 11}
        try:
            _post(server.port, "/v1/recognize", bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "raw_emg" in json.loads(e.read())["error"]
        assert json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz",
            timeout=30).read())["ok"]
    finally:
        server.stop()


def test_server_transduce_without_normalizer_rejected(corpus, tmp_path):
    from silent_speech_tpu.models.hifigan import (
        HiFiGANConfig, init_generator_params,
    )
    from silent_speech_tpu.train.transduction import TransductionTrainer

    devset = EMGDataset(corpus, dev=True)
    ex = devset[0]
    bucket = 32 * ((ex["emg"].shape[0] + 31) // 32)
    cfg = _cfg(corpus, str(tmp_path))
    trans = TransductionTrainer(
        cfg, mesh=make_mesh(1, 1, devices=jax.devices()[:1]))
    trans.init_state(trans._pack([ex]), seed=0)
    trans_dir = save_serving_bundle(
        trans, "transduction", str(tmp_path / "trans"),
        t_buckets=(bucket,))  # no audio_normalizer

    gen_cfg = HiFiGANConfig(
        resblock="1", upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),))

    class V:
        pass

    v = V()
    v.params = init_generator_params(jax.random.PRNGKey(1), gen_cfg)
    v.cfg = gen_cfg
    voc_dir = save_vocoder_bundle(v, str(tmp_path / "voc"),
                                  mel_buckets=(bucket,))

    server = ServingServer(
        transduction=ServingBundle.load(trans_dir),
        vocoder=ServingBundle.load(voc_dir)).start()
    try:
        payload = {"emg": np.asarray(ex["emg"]).tolist(),
                   "raw_emg": np.asarray(ex["raw_emg"]).tolist(),
                   "session_ids": np.asarray(ex["session_ids"]).tolist()}
        try:
            _post(server.port, "/v1/transduce", payload)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "denormalization" in json.loads(e.read())["error"]
    finally:
        server.stop()
