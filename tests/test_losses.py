"""Packed on-device losses vs a ragged numpy oracle with reference semantics
(``transduction_model.py:98-157``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from silent_speech_tpu.data.packing import pack_batch
from silent_speech_tpu.ops.dtw import align_from_distances_numpy
from silent_speech_tpu.train.losses import transduction_loss, ctc_loss


def _log_softmax(x):
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def _fake_example(rng, t, silent, t_tgt=None, n_text=12):
    ex = {
        "emg": rng.normal(size=(t, 112)).astype(np.float32),
        "raw_emg": rng.normal(size=(t * 8, 8)).astype(np.float32),
        "session_ids": np.zeros(t, dtype=np.int64),
        "silent": silent,
        "text": "test sentence",
        "text_int": rng.integers(0, 37, size=n_text).astype(np.int64),
    }
    if silent:
        tt = t_tgt or t + 7
        ex["parallel_voiced_audio_features"] = \
            rng.normal(size=(tt, 80)).astype(np.float32)
        ex["parallel_voiced_emg"] = rng.normal(size=(tt, 112)) \
            .astype(np.float32)
        ex["phonemes"] = rng.integers(0, 48, size=tt).astype(np.int64)
    else:
        ex["audio_features"] = rng.normal(size=(t, 80)).astype(np.float32)
        ex["phonemes"] = rng.integers(0, 48, size=t).astype(np.int64)
    return ex


def _oracle_loss(examples, preds, phones, w=0.5):
    """Ragged reference-semantics loss over per-utterance arrays."""
    losses = []
    total_length = 0
    correct = 0
    for ex, pred, phone in zip(examples, preds, phones):
        if ex["silent"]:
            y = ex["parallel_voiced_audio_features"]
            y_phone = ex["phonemes"]
            d = np.sqrt(np.clip(
                (pred ** 2).sum(-1)[:, None] + (y ** 2).sum(-1)[None, :]
                - 2 * pred @ y.T, 1e-12, None))
            lsm = _log_softmax(phone)
            costs = d + w * (-lsm[:, y_phone])
            align = align_from_distances_numpy(costs.T)
            loss = sum(costs[align[t], t] for t in range(y.shape[0]))
            pred_ids = lsm.argmax(-1)
            correct += int((pred_ids[align] == y_phone).sum())
            total_length += y.shape[0]
        else:
            y = ex["audio_features"]
            y_phone = ex["phonemes"]
            d = np.sqrt(((y - pred + 1e-6) ** 2).sum(-1))
            lsm = _log_softmax(phone)
            ce = -lsm[np.arange(len(y_phone)), y_phone]
            loss = d.sum() + w * ce.sum()
            correct += int((lsm.argmax(-1) == y_phone).sum())
            total_length += y.shape[0]
        losses.append(loss)
    return sum(losses) / total_length, correct / total_length


def test_transduction_loss_matches_oracle():
    rng = np.random.default_rng(0)
    examples = [
        _fake_example(rng, 50, silent=False),
        _fake_example(rng, 70, silent=True, t_tgt=64),
        _fake_example(rng, 33, silent=False),
    ]
    batch = pack_batch(examples, seq_len=40, chunk_bucket=2, utt_bucket=4,
                       sort_silent_first=False)

    # fabricate model outputs on the packed layout, then pull out the ragged
    # views for the oracle through the same gather indices
    n, L = batch.emg.shape[:2]
    pred_packed = rng.normal(size=(n, L, 80)).astype(np.float32)
    phone_packed = rng.normal(size=(n, L, 48)).astype(np.float32)
    flat_p = pred_packed.reshape(-1, 80)
    flat_ph = phone_packed.reshape(-1, 48)
    preds = [flat_p[batch.utt_gather_idx[i, : batch.utt_len[i]]]
             for i in range(len(examples))]
    phones = [flat_ph[batch.utt_gather_idx[i, : batch.utt_len[i]]]
              for i in range(len(examples))]

    expected_loss, expected_acc = _oracle_loss(examples, preds, phones)

    out = transduction_loss(
        jnp.asarray(pred_packed), jnp.asarray(phone_packed),
        jax.tree_util.tree_map(jnp.asarray, batch.device_batch()),
        phoneme_loss_weight=0.5, phoneme_eval=True)

    assert float(out.loss) == pytest.approx(expected_loss, rel=1e-4)
    acc = float(out.correct_phones) / float(out.total_length)
    assert acc == pytest.approx(expected_acc, abs=1e-6)
    conf = np.asarray(out.confusion)
    assert conf.sum() == float(out.total_length)


def test_transduction_loss_padding_invariance():
    """Bigger buckets (more padding) must not change the loss."""
    rng = np.random.default_rng(1)
    examples = [
        _fake_example(rng, 45, silent=True, t_tgt=52),
        _fake_example(rng, 30, silent=False),
    ]
    outs = []
    for utt_bucket in (2, 8):
        batch = pack_batch(examples, seq_len=40, chunk_bucket=1,
                           utt_bucket=utt_bucket)
        n, L = batch.emg.shape[:2]
        rng2 = np.random.default_rng(42)
        pred = rng2.normal(size=(n, L, 80)).astype(np.float32)
        phone = rng2.normal(size=(n, L, 48)).astype(np.float32)
        out = transduction_loss(
            jnp.asarray(pred), jnp.asarray(phone),
            jax.tree_util.tree_map(jnp.asarray, batch.device_batch()))
        outs.append(float(out.loss))
    # chunk counts differ → packed arrays differ beyond the real data, but
    # real rows are identical because total length is below one extra chunk
    assert outs[0] == pytest.approx(outs[1], rel=1e-5)


def test_ctc_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    examples = [
        _fake_example(rng, 60, silent=False, n_text=10),
        _fake_example(rng, 40, silent=False, n_text=6),
    ]
    batch = pack_batch(examples, seq_len=40, chunk_bucket=1, utt_bucket=2,
                       with_audio=False)
    n, L = batch.emg.shape[:2]
    logits_packed = rng.normal(size=(n, L, 38)).astype(np.float32)

    out = ctc_loss(
        jax.nn.log_softmax(jnp.asarray(logits_packed), axis=-1),
        jax.tree_util.tree_map(jnp.asarray, batch.device_batch()),
        blank_id=37)

    # torch oracle: pad ragged sequences time-first, F.ctc_loss mean mode
    flat = logits_packed.reshape(-1, 38)
    seqs = [flat[batch.utt_gather_idx[i, : batch.utt_len[i]]]
            for i in range(2)]
    lengths = [s.shape[0] for s in seqs]
    t_max = max(lengths)
    padded = np.zeros((t_max, 2, 38), dtype=np.float32)
    for i, s in enumerate(seqs):
        padded[: s.shape[0], i] = s
    log_probs = torch.log_softmax(torch.tensor(padded), dim=-1)
    targets = torch.nn.utils.rnn.pad_sequence(
        [torch.tensor(e["text_int"]) for e in examples], batch_first=True)
    expected = torch.nn.functional.ctc_loss(
        log_probs, targets, torch.tensor(lengths),
        torch.tensor([len(e["text_int"]) for e in examples]), blank=37)
    assert float(out) == pytest.approx(float(expected), rel=1e-4)


def test_silent_slice_matches_full_dp():
    """n_silent (silent-first packing) must not change the loss/metrics."""
    rng = np.random.default_rng(3)
    examples = [
        _fake_example(rng, 45, silent=True, t_tgt=50),
        _fake_example(rng, 30, silent=False),
        _fake_example(rng, 62, silent=True, t_tgt=58),
        _fake_example(rng, 25, silent=False),
    ]
    batch = pack_batch(examples, seq_len=40, chunk_bucket=2, utt_bucket=4,
                       silent_bucket=2)
    assert batch.num_silent == 2  # sorted silent-first, bucketed
    n, L = batch.emg.shape[:2]
    pred = rng.normal(size=(n, L, 80)).astype(np.float32)
    phone = rng.normal(size=(n, L, 48)).astype(np.float32)
    db = jax.tree_util.tree_map(jnp.asarray, batch.device_batch())

    full = transduction_loss(jnp.asarray(pred), jnp.asarray(phone), db,
                             phoneme_eval=True, n_silent=None)
    sliced = transduction_loss(jnp.asarray(pred), jnp.asarray(phone), db,
                               phoneme_eval=True,
                               n_silent=batch.num_silent)
    assert float(sliced.loss) == pytest.approx(float(full.loss), rel=1e-5)
    assert int(sliced.correct_phones) == int(full.correct_phones)
    np.testing.assert_allclose(np.asarray(sliced.confusion),
                               np.asarray(full.confusion))


def test_voiced_below_bucketed_silent_count():
    """With the default silent bucket (4), a real voiced utterance can sit
    BELOW num_silent (e.g. 3 silent → num_silent=4, voiced at index 3).
    The sliced voiced path must still cover it."""
    rng = np.random.default_rng(11)
    examples = [
        _fake_example(rng, 45, silent=True, t_tgt=50),
        _fake_example(rng, 62, silent=True, t_tgt=58),
        _fake_example(rng, 38, silent=True, t_tgt=41),
        _fake_example(rng, 30, silent=False),
        _fake_example(rng, 25, silent=False),
    ]
    batch = pack_batch(examples, seq_len=40, chunk_bucket=2, utt_bucket=8)
    assert batch.num_silent == 4  # bucketed above the 3 real silent
    n, L = batch.emg.shape[:2]
    pred = rng.normal(size=(n, L, 80)).astype(np.float32)
    phone = rng.normal(size=(n, L, 48)).astype(np.float32)
    db = jax.tree_util.tree_map(jnp.asarray, batch.device_batch())

    full = transduction_loss(jnp.asarray(pred), jnp.asarray(phone), db,
                             phoneme_eval=True, n_silent=None)
    sliced = transduction_loss(jnp.asarray(pred), jnp.asarray(phone), db,
                               phoneme_eval=True,
                               n_silent=batch.num_silent)
    assert float(sliced.loss) == pytest.approx(float(full.loss), rel=1e-5)
    assert int(sliced.correct_phones) == int(full.correct_phones)
    np.testing.assert_allclose(np.asarray(sliced.confusion),
                               np.asarray(full.confusion))

    # wave-wide n_silent: trainers max() the silent count across a scan
    # wave, so a batch can receive n_silent far above its own bucketed
    # count — every voiced utterance below that k must still contribute
    # its full loss (regression: a sliced voiced path once zeroed them)
    wave_k = int(db.utt_len.shape[0])
    waved = transduction_loss(jnp.asarray(pred), jnp.asarray(phone), db,
                              phoneme_eval=True, n_silent=wave_k)
    assert float(waved.loss) == pytest.approx(float(full.loss), rel=1e-5)
    assert int(waved.correct_phones) == int(full.correct_phones)
