import json
import os

import numpy as np
import pytest

from silent_speech_tpu.data.synthetic import generate_corpus
from silent_speech_tpu.data.dataset import EMGDataset, load_utterance
from silent_speech_tpu.data.sampler import SizeAwareSampler
from silent_speech_tpu.data.packing import (
    combine_fixed_length, decollate, pack_batch,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cfg = generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                          utterances_per_session=8, seed=0)
    return cfg


@pytest.fixture(scope="module")
def trainset(corpus):
    return EMGDataset(corpus, dev=False, test=False)


def test_discovery_and_split(corpus):
    train = EMGDataset(corpus, dev=False, test=False)
    dev = EMGDataset(corpus, dev=True)
    test = EMGDataset(corpus, test=True)
    # 8 voiced + 8 silent utterances total; silent sessions are selectable
    # for train but voiced sessions are excluded from dev/test only when
    # exclude_from_testset — voiced_parallel with silent present IS excluded
    assert len(train) > 0
    # dev/test only come from sessions not excluded; with silent data
    # present, voiced dirs are excluded → dev/test contain silent examples
    for ds, name in ((dev, "dev"), (test, "test")):
        for d, idx in ds.example_indices:
            assert d.silent, f"{name} should only contain silent sessions"
    # splits are disjoint from train by (book, sentence_index)
    with open(corpus.testset_file) as f:
        split = json.load(f)
    heldout = {tuple(x) for x in split["dev"] + split["test"]}
    for d, idx in train.example_indices:
        with open(os.path.join(d.directory, f"{idx}_info.json")) as f:
            info = json.load(f)
        assert (info["book"], info["sentence_index"]) not in heldout


def test_example_schema(trainset):
    found_silent = found_voiced = False
    for i in range(len(trainset)):
        ex = trainset[i]
        t = ex["emg"].shape[0]
        assert ex["emg"].shape == (t, 112)
        assert ex["raw_emg"].shape == (t * 8, 8)
        assert ex["session_ids"].shape == (t,)
        assert ex["audio_features"].shape[1] == 80
        assert ex["text_int"].ndim == 1
        if ex["silent"]:
            found_silent = True
            assert "parallel_voiced_audio_features" in ex
            # phonemes follow the VOICED target timeline
            assert ex["phonemes"].shape[0] == \
                ex["parallel_voiced_audio_features"].shape[0]
        else:
            found_voiced = True
            assert ex["audio_features"].shape[0] == t
            assert ex["phonemes"].shape[0] == t
    assert found_silent and found_voiced


def test_normalization_applied(trainset):
    ex = trainset[0]
    # soft clip bounds from the tanh stages (read_emg.py:227-233)
    assert np.abs(ex["raw_emg"]).max() <= 50.0
    assert np.abs(ex["emg"]).max() <= 8.0


def test_deterministic_order(corpus):
    a = EMGDataset(corpus)
    b = EMGDataset(corpus)
    assert [(d.directory, i) for d, i in a.example_indices] == \
        [(d.directory, i) for d, i in b.example_indices]


def test_sampler_packs_by_length(trainset):
    sampler = SizeAwareSampler(trainset, max_len=4000, seed=1)
    batches = list(iter(sampler))
    assert len(batches) >= 1
    for batch in batches:
        total = sum(trainset.example_meta(i)["emg_length"] for i in batch)
        assert total <= 4000 or len(batch) == 1


def test_combine_decollate_roundtrip():
    rng = np.random.default_rng(0)
    arrays = [rng.normal(size=(n, 5)).astype(np.float32)
              for n in (130, 270, 99)]
    packed = combine_fixed_length(arrays, 100)
    assert packed.shape == (5, 100, 5)
    back = decollate(packed, [130, 270, 99])
    for a, b in zip(arrays, back):
        np.testing.assert_array_equal(a, b)


def test_combine_bucket_padding():
    arrays = [np.ones((130, 2), dtype=np.float32)]
    packed = combine_fixed_length(arrays, 100, pad_to_multiple=8)
    assert packed.shape == (8, 100, 2)
    assert packed[2:].sum() == 0


def test_pack_batch_static_schema(trainset):
    examples = [trainset[i] for i in range(4)]
    batch = pack_batch(examples, seq_len=200, chunk_bucket=4, utt_bucket=4)
    # the packer sorts silent-first; compare in that order
    examples = sorted(examples, key=lambda e: not bool(e["silent"]))
    n, L = batch.emg.shape[:2]
    assert L == 200
    assert n % 4 == 0
    assert batch.raw_emg.shape == (n, 1600, 8)
    assert batch.segment_ids.shape == (n, 200)
    u, t_max = batch.utt_gather_idx.shape
    assert u % 4 == 0
    assert batch.audio_features.shape == (u, t_max, 80)

    # gather indices reproduce decollation of the packed emg
    flat = batch.emg.reshape(-1, 112)
    for i, ex in enumerate(examples):
        ln = batch.utt_len[i]
        assert ln == ex["emg"].shape[0]
        got = flat[batch.utt_gather_idx[i, :ln]]
        np.testing.assert_array_equal(got, ex["emg"])
        # targets: voiced → own features, silent → parallel voiced
        tgt = ex["parallel_voiced_audio_features"] if ex["silent"] \
            else ex["audio_features"]
        np.testing.assert_array_equal(
            batch.audio_features[i, : batch.target_len[i]], tgt)

    # segment ids mark utterance membership, 0 on padding
    segs = batch.segment_ids.reshape(-1)
    total = sum(e["emg"].shape[0] for e in examples)
    assert (segs[:total] > 0).all()
    assert (segs[total:] == 0).all()


def test_silent_subset(trainset):
    sub = trainset.silent_subset()
    assert len(sub) > 0
    assert all(d.silent for d, _ in sub.example_indices)


def test_load_utterance_neighbor_context(corpus):
    # loading utterance 1 (has neighbors 0 and 2) should not error and
    # should produce aligned shapes
    d = EMGDataset(corpus)
    sess_dir = d.example_indices[0][0].directory
    utt = load_utterance(sess_dir, 1)
    t = utt["emg_features"].shape[0]
    assert utt["raw_emg"].shape == (8 * t, 8)
    assert utt["audio_features"].shape[0] == t


def test_fixed_shape_packing_single_signature(trainset):
    """With fixed caps, different batches pack to identical shapes."""
    b1 = pack_batch([trainset[0], trainset[1]], seq_len=200,
                    chunk_bucket=2, utt_bucket=4, fixed_chunks=16,
                    fixed_utts=8, fixed_t=256)
    b2 = pack_batch([trainset[i] for i in range(5)], seq_len=200,
                    chunk_bucket=2, utt_bucket=4, fixed_chunks=16,
                    fixed_utts=8, fixed_t=256)
    assert b1.shape_key() == b2.shape_key()
    assert b1.emg.shape[0] == 16
    assert b1.utt_gather_idx.shape == (8, 256)
    # overflow falls back to bucketed sizes rather than failing
    b3 = pack_batch([trainset[i] for i in range(5)], seq_len=200,
                    chunk_bucket=2, utt_bucket=4, fixed_chunks=2,
                    fixed_utts=4, fixed_t=256)
    assert b3.emg.shape[0] >= 2


def test_asset_generator_clis(tmp_path):
    """make_testset.py + make_normalizers.py produce working assets from a
    bare corpus (VERDICT round-1 item 8; reference read_emg.py:151-154,
    298-309)."""
    import subprocess
    import sys

    from silent_speech_tpu.data.synthetic import generate_corpus
    from silent_speech_tpu.data.dataset import EMGDataset

    root = str(tmp_path / "assets_corpus")
    c = generate_corpus(root, n_voiced_sessions=1, n_silent_sessions=1,
                        utterances_per_session=6, seed=7)
    testset = str(tmp_path / "split.json")
    normalizers = str(tmp_path / "norm.pkl")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = [
        "--silent_data_directories", ",".join(c.silent_data_directories),
        "--voiced_data_directories", ",".join(c.voiced_data_directories),
        "--text_align_directory", c.text_align_directory,
    ]
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "make_testset.py"), *common,
         "--testset_file", testset, "--dev_size", "2", "--test_size", "1"],
        capture_output=True, text=True, cwd=repo, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    split = json.load(open(testset))
    assert len(split["dev"]) == 2 and len(split["test"]) == 1
    assert all(isinstance(b, str) and isinstance(i, int)
               for b, i in split["dev"] + split["test"])

    env = dict(os.environ)
    env["SSTPU_FORCE_PLATFORM"] = "cpu:1"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "make_normalizers.py"),
         *common, "--testset_file", testset,
         "--normalizers_file", normalizers],
        capture_output=True, text=True, cwd=repo, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    # the generated assets drive a real dataset load
    cfg = c
    cfg.testset_file = testset
    cfg.normalizers_file = normalizers
    ds = EMGDataset(cfg, dev=True)
    assert len(ds) > 0
    ex = ds[0]
    assert ex["emg"].shape[1] == 112
