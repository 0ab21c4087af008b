"""Full-schedule head-to-head: TPU framework vs the genuine torch reference.

VERDICT round-3 item 2: train BOTH stacks through the full (scaled) recipe
on the same LEARNABLE synthetic corpus, then compare final dev-set metrics
through identical judges. The corpus uses ``generate_corpus(learnable=True)``
(data/synthetic.py): EMG burst amplitudes and audio harmonics deterministically
encode the character sequence, so dev-set generalization is measurable —
on the default pure-noise corpus both stacks sit at chance on dev and the
comparison is vacuous.

Sides:

- **torch**: the genuine reference ``architecture.Model`` driven by the
  replica loops from tests/test_training_parity*.py (loss/schedule
  line-cited from ``transduction_model.py:98-227`` and
  ``recognition_model.py:61-117``), dropout and shift augmentation ON,
  batches from the same ``SizeAwareSampler`` semantics as the reference's
  (``read_emg.py:115-140``).
- **tpu**: our trainers' public ``fit`` recipe with the identical scaled
  hyperparameters (each side its own rng stream — identical-init
  step-parity is tools/parity_convergence*.py's job; THIS artifact is an
  end-of-schedule outcome comparison).

Judges (identical code applied to both sides' outputs):

- recognition: dev WER via the native beam+LM decoder (beam=50, ARPA
  bigram over the train texts, alpha=1.5/beta=1.85) + greedy WER.
- transduction: dev voiced mel RMSE (framewise, normalized mel space)
  + dev phoneme accuracy.

Writes docs/HEADTOHEAD.json. Run:
    python tools/headtohead.py [--rec_epochs N] [--trans_epochs N]
        [--utts N] [--ours_platform {cpu,default}] [--eval_every N]

``--ours_platform default`` leaves JAX on its native backend (the TPU
chip when the tunnel is up) — the honest configuration for OUR side;
the torch reference side always runs on the host CPU, exactly as the
reference repo does without a GPU. Accuracy judges are
hardware-independent; only wall-clock differs.
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np  # noqa: E402


def _dev_examples(devset):
    return [devset[i] for i in range(len(devset))]


import contextlib  # noqa: E402


@contextlib.contextmanager
def _zero_inmodel_shift(ref_architecture):
    """Disable the reference model's in-place shift augmentation
    (architecture.py:64-68) while the training loop runs — the identical
    shift is applied outside (:func:`_shift_augment_torch`, torch 2
    rejects the reference's overlapping in-place copy). Scoped because
    ``ref_architecture.random`` IS the stdlib ``random`` module: a
    process-global patch would silently leak into any later import."""
    orig = ref_architecture.random.randrange
    ref_architecture.random.randrange = lambda n: 0
    try:
        yield
    finally:
        ref_architecture.random.randrange = orig


def _shift_augment_torch(torch, Xr, rnd):
    """Reference raw-EMG shift augmentation (architecture.py:64-68),
    applied OUTSIDE the model: torch 2 rejects the reference's in-place
    overlapping copy, so the in-model path is disabled (randrange → 0)
    and the identical left-shift-and-zero-pad happens here."""
    r = rnd.randrange(8)
    if r == 0:
        return Xr
    pad = torch.zeros((Xr.shape[0], r) + tuple(Xr.shape[2:]),
                      dtype=Xr.dtype)
    return torch.cat([Xr[:, r:], pad], dim=1)


# --------------------------------------------------------------------------
# shared judges
# --------------------------------------------------------------------------

def decode_wer(logit_list, references, charset, blank_id, lm, beam=True):
    """Same decoder for both sides: native/py beam+LM or greedy."""
    from silent_speech_tpu.eval.decode import (
        beam_ctc_decode, greedy_ctc_decode)
    from silent_speech_tpu.text import cer, wer  # noqa: F401

    preds = []
    for lp in logit_list:
        if beam:
            ids = beam_ctc_decode(lp, charset, blank_id, beam_width=50,
                                  lm=lm, alpha=1.5, beta=1.85)
        else:
            ids = greedy_ctc_decode(lp, blank_id)
        preds.append("".join(charset[i] for i in ids))
    return wer(references, preds), preds


def mel_rmse(pred_fn, examples):
    """Framewise RMSE in normalized mel space over voiced examples."""
    vals = []
    for dp in examples:
        if dp["silent"]:
            continue
        pred = np.asarray(pred_fn(dp))
        tgt = np.asarray(dp["audio_features"])
        m = min(len(pred), len(tgt))
        vals.append(float(np.sqrt(np.mean((pred[:m] - tgt[:m]) ** 2))))
    return float(np.mean(vals))


def dtw_dev_cost(pred_fn, examples):
    """Reference dev-loss semantics on SILENT dev utterances
    (``transduction_model.py:98-127`` eval path, mel term): predict on
    the silent timeline, DTW-align to the paired voiced target mel,
    mean Euclidean cost per target frame. Identical numpy judge for
    both sides (the dev split is silent-only by the reference's
    pairing rule, so framewise RMSE is undefined there)."""
    from silent_speech_tpu.ops.dtw import align_from_distances_numpy

    total, frames = 0.0, 0
    for dp in examples:
        tgt = np.asarray(dp["parallel_voiced_audio_features"]
                         if dp["silent"] else dp["audio_features"],
                         np.float64)
        pred = np.asarray(pred_fn(dp), np.float64)
        # (T_pred, T_tgt) Euclidean distances
        costs = np.sqrt(
            ((pred[:, None, :] - tgt[None, :, :]) ** 2).sum(-1))
        align = align_from_distances_numpy(costs.T)
        total += float(costs[align, np.arange(len(align))].sum())
        frames += len(align)
    return total / max(frames, 1)


def voiced_dev_view(corpus):
    """Voiced dev utterances, as a list of examples. The pairing rule
    excludes voiced sessions from dev when silent data exists
    (``read_emg.py:164-167``), so the voiced renditions of the dev
    sentences are re-discovered through a silent-less config view —
    framewise mel RMSE / phoneme accuracy are well-defined there.

    The view renumbers sessions (dataset session ids are positional in
    the silent-then-voiced directory enumeration, ``dataset.py:175-185``)
    so each example's ``session_ids`` is shifted back up by the number
    of silent sessions to match the ids the models trained under."""
    import dataclasses

    from silent_speech_tpu.data.dataset import EMGDataset

    n_silent = sum(len(os.listdir(sd))
                   for sd in corpus.silent_data_directories)
    ds = EMGDataset(
        dataclasses.replace(corpus, silent_data_directories=[]),
        dev=True)
    examples = []
    for i in range(len(ds)):
        dp = ds[i]
        dp["session_ids"] = dp["session_ids"] + n_silent
        examples.append(dp)
    return examples


def phoneme_acc(phone_fn, examples):
    correct = total = 0
    for dp in examples:
        if dp["silent"]:
            continue
        pp = np.asarray(phone_fn(dp))  # (T, 48) logits
        y = np.asarray(dp["phonemes"])
        m = min(len(pp), len(y))
        correct += int((pp[:m].argmax(-1) == y[:m]).sum())
        total += m
    return correct / max(total, 1)


# --------------------------------------------------------------------------
# torch side
# --------------------------------------------------------------------------

def torch_recognition(corpus, trainset, devset, *, epochs, target_lr,
                      warmup, wd, max_batch_len, model_size, num_layers,
                      dropout, seed=1):
    """Reference CTC recipe (recognition_model.py:61-117) on the genuine
    torch model, full augmentation, SizeAwareSampler batching."""
    import torch
    import torch.nn.functional as F
    from torch import nn

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    from test_training_parity import (
        _patch_torch2_compat, _ref_batches, _combine_fixed_length_torch,
        _decollate_torch)
    from silent_speech_tpu.data.sampler import SizeAwareSampler

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["headtohead"])
    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = dropout

    n_chars = 37
    torch.manual_seed(seed)
    model = ref_architecture.Model(112, n_chars + 1)
    _patch_torch2_compat(model)
    import random as pyrandom
    shift_rnd = pyrandom.Random(seed + 100)
    optim = torch.optim.AdamW(model.parameters(), lr=target_lr,
                              weight_decay=wd)
    sampler = SizeAwareSampler(trainset, max_batch_len, seed=seed)
    seq_len = 200  # reference default feature frames per collated row

    batch_idx = 0
    t0 = time.time()
    with _zero_inmodel_shift(ref_architecture):
        for epoch in range(epochs):
            model.train()
            for ids in sampler:
                exs = [trainset[i] for i in ids]
                b = _ref_batches(torch, [exs])[0]
                b["text_int"] = [
                    torch.tensor(np.asarray(e["text_int"], np.int64))
                    for e in exs]
                b["text_int_lengths"] = [len(e["text_int"]) for e in exs]
                it = batch_idx + 1
                if it <= warmup:  # recognition_model.py:80-85
                    for g in optim.param_groups:
                        g["lr"] = it * target_lr / warmup
                X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
                Xr = _combine_fixed_length_torch(torch, b["raw_emg"],
                                                 seq_len * 8)
                Xr = _shift_augment_torch(torch, Xr, shift_rnd)
                sess = _combine_fixed_length_torch(
                    torch, b["session_ids"], seq_len)
                pred = model(X, Xr, sess)
                pred = F.log_softmax(pred, 2)
                pred = nn.utils.rnn.pad_sequence(
                    _decollate_torch(pred, b["lengths"]),
                    batch_first=False)
                y = nn.utils.rnn.pad_sequence(b["text_int"],
                                              batch_first=True)
                loss = F.ctc_loss(pred, y, b["lengths"],
                                  b["text_int_lengths"], blank=n_chars)
                loss.backward()
                if it % 2 == 0:  # accum x2, recognition_model.py:105
                    optim.step()
                    optim.zero_grad()
                batch_idx += 1
            if (epoch + 1) % 20 == 0:
                print(f"[torch rec] epoch {epoch + 1}/{epochs} loss "
                      f"{float(loss):.3f} ({time.time() - t0:.0f}s)",
                      flush=True)

    def dev_logits(examples):
        model.eval()
        out = []
        with torch.no_grad():
            for dp in examples:
                X = torch.tensor(np.asarray(dp["emg"],
                                            np.float32))[None]
                Xr = torch.tensor(np.asarray(dp["raw_emg"],
                                             np.float32))[None]
                sess = torch.tensor(np.asarray(dp["session_ids"],
                                               np.int64))[None]
                lp = F.log_softmax(model(X, Xr, sess), -1)[0]
                out.append(lp.numpy())
        return out

    return dev_logits


def torch_transduction(corpus, trainset, devset, *, epochs, target_lr,
                       warmup, wd, max_batch_len, model_size, num_layers,
                       dropout, seed=1):
    """Reference DTW recipe (transduction_model.py:159-227) on the genuine
    torch model, full augmentation."""
    import torch
    import torch.nn.functional as F

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    from test_training_parity import (
        _patch_torch2_compat, _ref_batches, _combine_fixed_length_torch,
        _ref_dtw_loss)
    from silent_speech_tpu.data.sampler import SizeAwareSampler

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["headtohead"])
    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = dropout

    torch.manual_seed(seed)
    model = ref_architecture.Model(112, 80, 48)
    _patch_torch2_compat(model)
    import random as pyrandom
    shift_rnd = pyrandom.Random(seed + 200)
    optim = torch.optim.AdamW(model.parameters(), weight_decay=wd)
    sampler = SizeAwareSampler(trainset, max_batch_len, seed=seed)
    seq_len = 200

    batch_idx = 0
    t0 = time.time()
    with _zero_inmodel_shift(ref_architecture):
        for epoch in range(epochs):
            model.train()
            for ids in sampler:
                exs = [trainset[i] for i in ids]
                b = _ref_batches(torch, [exs])[0]
                optim.zero_grad()
                lr = (min(batch_idx + 1, warmup) / warmup) * target_lr
                for g in optim.param_groups:
                    g["lr"] = lr
                X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
                Xr = _combine_fixed_length_torch(torch, b["raw_emg"],
                                                 seq_len * 8)
                Xr = _shift_augment_torch(torch, Xr, shift_rnd)
                sess = _combine_fixed_length_torch(
                    torch, b["session_ids"], seq_len)
                pred, phone = model(X, Xr, sess)
                loss = _ref_dtw_loss(torch, F, pred, phone, b)
                loss.backward()
                optim.step()
                batch_idx += 1
            if (epoch + 1) % 20 == 0:
                print(f"[torch trans] epoch {epoch + 1}/{epochs} loss "
                      f"{float(loss):.3f} ({time.time() - t0:.0f}s)",
                      flush=True)

    def predict(dp):
        model.eval()
        with torch.no_grad():
            X = torch.tensor(np.asarray(dp["emg"], np.float32))[None]
            Xr = torch.tensor(np.asarray(dp["raw_emg"], np.float32))[None]
            sess = torch.tensor(np.asarray(dp["session_ids"],
                                           np.int64))[None]
            pred, _ = model(X, Xr, sess)
        return pred[0].numpy()

    def phones(dp):
        model.eval()
        with torch.no_grad():
            X = torch.tensor(np.asarray(dp["emg"], np.float32))[None]
            Xr = torch.tensor(np.asarray(dp["raw_emg"], np.float32))[None]
            sess = torch.tensor(np.asarray(dp["session_ids"],
                                           np.int64))[None]
            _, phone = model(X, Xr, sess)
        return phone[0].numpy()

    return predict, phones


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def _scaled_config(corpus, *, model_size, num_layers, dropout,
                   max_batch_len, outdir):
    from silent_speech_tpu.config import Config

    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = model_size
    cfg.model.num_layers = num_layers
    cfg.model.dim_feedforward = 3072  # reference Model hardcodes this
    cfg.model.dropout = dropout
    cfg.model.shift_augment = True
    cfg.model.compute_dtype = "float32"  # CPU host; TPU recipe is bf16
    cfg.data.t_cap = 512
    cfg.data.utt_cap = 16
    # the tiny corpus yields ~25 batches/epoch: 8-step scan waves cover
    # ~24 of them per dispatch group (default 16 covers only 16 and
    # leaves 9 paying full per-step dispatch latency through the tunnel)
    cfg.data.wave_size = 8
    return cfg


def ours_recognition(corpus, trainset, devset, *, epochs, target_lr,
                     warmup, wd, max_batch_len, model_size, num_layers,
                     dropout, workdir, eval_every=1):
    import jax

    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.recognition import RecognitionTrainer

    cfg = _scaled_config(corpus, model_size=model_size,
                         num_layers=num_layers, dropout=dropout,
                         max_batch_len=max_batch_len, outdir=workdir)
    cfg.recognition.learning_rate = target_lr
    cfg.recognition.learning_rate_warmup = warmup
    cfg.recognition.lr_milestones = ()
    cfg.recognition.l2 = wd
    cfg.recognition.max_batch_len = max_batch_len
    cfg.recognition.output_directory = os.path.join(workdir, "rec")

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = RecognitionTrainer(cfg, mesh=mesh)
    trainer.fit(trainset, devset, epochs=epochs, seed=0,
                eval_every=eval_every, checkpoint_every=eval_every)

    def dev_logits(examples):
        return trainer.batch_logits(examples)

    return dev_logits


def ours_transduction(corpus, trainset, devset, *, epochs, target_lr,
                      warmup, wd, max_batch_len, model_size, num_layers,
                      dropout, workdir, eval_every=1):
    import jax

    from silent_speech_tpu.eval.synthesis import EnsemblePredictor
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.transduction import TransductionTrainer

    cfg = _scaled_config(corpus, model_size=model_size,
                         num_layers=num_layers, dropout=dropout,
                         max_batch_len=max_batch_len, outdir=workdir)
    cfg.transduction.learning_rate = target_lr
    cfg.transduction.learning_rate_warmup = warmup
    cfg.transduction.l2 = wd
    cfg.transduction.max_batch_len = max_batch_len
    cfg.transduction.learning_rate_patience = 10_000
    cfg.transduction.output_directory = os.path.join(workdir, "trans")

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    trainer.fit(trainset, devset, epochs=epochs, seed=0,
                eval_every=eval_every, checkpoint_every=eval_every)
    ens = EnsemblePredictor(base=trainer,
                            states=[(trainer.state.params,
                                     trainer.state.batch_stats)])

    fwd = jax.jit(lambda emg, raw, sess, seg: trainer.model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        emg, raw, sess, segment_ids=seg, train=False)[1])

    def phones(dp):
        emg, raw, sess, seg, t = trainer.pad_single(dp)
        return np.asarray(fwd(emg, raw, sess, seg))[0, :t]

    return ens.predict, phones


# --------------------------------------------------------------------------

def _write_partial(out, fresh_tasks):
    """Incremental artifact write: a timeout mid-run must not lose the
    completed halves (this host has ONE CPU core — the four trainings
    serialize on it and the full run is long). Task blocks not present
    in ``out`` are carried over from the existing artifact so a partial
    run never erases the other half's last good numbers.

    ``fresh_tasks``: the set of task keys actually produced by THIS
    process. ``carried_over`` is recomputed from it on every write (not
    from key presence), so a later fresh block clears a stale flag and a
    pre-copied block gets one."""
    if os.path.exists("docs/HEADTOHEAD.json"):
        try:
            with open("docs/HEADTOHEAD.json") as f:
                prev = json.load(f)
            for k in ("recognition", "transduction"):
                if k in prev and k not in out:
                    out[k] = prev[k]
        except (json.JSONDecodeError, OSError):
            pass
    out.pop("carried_over", None)
    carried = [k for k in ("recognition", "transduction")
               if k in out and k not in fresh_tasks]
    if carried:
        out["carried_over"] = carried
    os.makedirs("docs", exist_ok=True)
    # atomic replace: a kill mid-dump must not truncate the artifact
    fd, tmp = tempfile.mkstemp(dir="docs", suffix=".headtohead.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, "docs/HEADTOHEAD.json")
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    print("wrote docs/HEADTOHEAD.json (partial ok)", flush=True)


def main(rec_epochs=300, trans_epochs=80, utts=20, eval_every=1,
         tasks="all"):
    import logging as pylogging

    pylogging.basicConfig(level=pylogging.INFO)  # trainer epoch progress
    sys.path.insert(0, "tools")
    from train_accuracy import build_arpa  # tools/ sibling

    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.data.synthetic import generate_corpus
    from silent_speech_tpu.eval.decode import ArpaLM
    from silent_speech_tpu.text import TextTransform

    work = tempfile.mkdtemp(prefix="headtohead_")
    corpus = generate_corpus(os.path.join(work, "corpus"),
                             n_voiced_sessions=3, n_silent_sessions=1,
                             utterances_per_session=utts, seed=7,
                             learnable=True)
    trainset = EMGDataset(corpus, dev=False, test=False)
    devset = EMGDataset(corpus, dev=True)
    dev_examples = _dev_examples(devset)
    print(f"corpus: {len(trainset)} train / {len(devset)} dev "
          f"(learnable synthetic, seed=7)", flush=True)

    # per-task target lrs follow the reference defaults
    # (recognition_model.py:23 → 3e-4, transduction_model.py:24 → 1e-3);
    # round-4's first run used 2e-3 for BOTH and the recognition side
    # blank-collapsed on both stacks — a hot-lr artifact, not a parity
    # signal. Warmup is scaled to the tiny corpus.
    hp_shared = dict(warmup=16, wd=1e-7, max_batch_len=4000,
                     model_size=128, num_layers=2, dropout=0.2)
    hp_rec = dict(target_lr=3e-4, **hp_shared)
    hp_trans = dict(target_lr=1e-3, **hp_shared)
    tt = TextTransform()
    references = [tt.clean_text(e["text"]) for e in dev_examples]
    train_probe = [trainset[i] for i in range(min(len(trainset), 8))]
    refs_train = [tt.clean_text(e["text"]) for e in train_probe]
    texts = [trainset.example_meta(i)["text"] for i in range(len(trainset))]
    lm = ArpaLM(build_arpa(texts, os.path.join(work, "lm.arpa")))

    import jax

    out = {"corpus": "learnable synthetic seed=7, 3 voiced + 1 silent "
                     f"sessions x {utts} utterances",
           "ours_backend": jax.devices()[0].platform,
           "hyperparameters": {**hp_shared, "rec_lr": hp_rec["target_lr"],
                               "trans_lr": hp_trans["target_lr"],
                               "rec_epochs": rec_epochs,
                               "trans_epochs": trans_epochs,
                               "eval_every": eval_every},
           "judges": "identical: native beam+LM (beam=50, ARPA bigram, "
                     "a=1.5 b=1.85) + greedy, WER + CER; framewise voiced "
                     "mel RMSE; phoneme accuracy"}
    if tasks != "all" and os.path.exists("docs/HEADTOHEAD.json"):
        with open("docs/HEADTOHEAD.json") as f:
            prev = json.load(f)
        for k in ("recognition", "transduction"):
            if k in prev:
                out[k] = prev[k]  # keep the half we are not re-running

    # ---- recognition ----
    fresh_tasks = set()  # task keys produced by THIS process
    if tasks in ("all", "rec"):
        _run_recognition(out, corpus, trainset, devset, dev_examples,
                         train_probe, references, refs_train, tt, lm,
                         rec_epochs, eval_every, work, hp_rec,
                         fresh_tasks)
    if tasks in ("all", "trans"):
        _run_transduction(out, corpus, trainset, devset, dev_examples,
                          trans_epochs, eval_every, work, hp_trans,
                          fresh_tasks)


def _run_recognition(out, corpus, trainset, devset, dev_examples,
                     train_probe, references, refs_train, tt, lm,
                     rec_epochs, eval_every, work, hp_rec, fresh_tasks):
    t0 = time.time()
    ours_dev_fn = ours_recognition(
        corpus, trainset, devset, epochs=rec_epochs,
        workdir=work, eval_every=eval_every, **hp_rec)
    t_ours = time.time() - t0
    ours_logits = ours_dev_fn(dev_examples)
    ours_tr_logits = ours_dev_fn(train_probe)
    t0 = time.time()
    torch_dev_fn = torch_recognition(
        corpus, trainset, devset, epochs=rec_epochs, **hp_rec)
    t_torch = time.time() - t0
    torch_logits = torch_dev_fn(dev_examples)
    torch_tr_logits = torch_dev_fn(train_probe)

    blank = len(tt.chars)
    w_ours, p_ours = decode_wer(ours_logits, references, tt.chars, blank,
                                lm, beam=True)
    w_torch, p_torch = decode_wer(torch_logits, references, tt.chars,
                                  blank, lm, beam=True)
    wg_ours, _ = decode_wer(ours_logits, references, tt.chars, blank,
                            None, beam=False)
    wg_torch, _ = decode_wer(torch_logits, references, tt.chars, blank,
                             None, beam=False)
    # train-set probe: memorization evidence, separates "didn't learn"
    # from "didn't generalize"
    wt_ours, _ = decode_wer(ours_tr_logits, refs_train, tt.chars, blank,
                            None, beam=False)
    wt_torch, _ = decode_wer(torch_tr_logits, refs_train, tt.chars,
                             blank, None, beam=False)
    from silent_speech_tpu.text import cer

    out["recognition"] = {
        "dev_wer_beam_lm": {"tpu": round(w_ours, 4),
                            "torch": round(w_torch, 4)},
        "dev_wer_greedy": {"tpu": round(wg_ours, 4),
                           "torch": round(wg_torch, 4)},
        "dev_cer_beam_lm": {"tpu": round(cer(references, p_ours), 4),
                            "torch": round(cer(references, p_torch), 4)},
        "train_wer_greedy": {"tpu": round(wt_ours, 4),
                             "torch": round(wt_torch, 4)},
        "train_seconds": {"tpu": round(t_ours, 1),
                          "torch": round(t_torch, 1)},
        "dev_predictions": {"tpu": p_ours, "torch": p_torch,
                            "references": references},
    }
    print(json.dumps(out["recognition"], indent=1), flush=True)
    fresh_tasks.add("recognition")
    _write_partial(out, fresh_tasks)


def _run_transduction(out, corpus, trainset, devset, dev_examples,
                      trans_epochs, eval_every, work, hp_trans,
                      fresh_tasks):
    # dev (silent) judged by DTW-aligned mel cost — the reference's dev
    # semantics; the voiced renditions of the dev sentences (via the
    # silent-less view) judged by framewise RMSE + phoneme accuracy
    vdev_examples = voiced_dev_view(corpus)
    t0 = time.time()
    ours_pred, ours_ph = ours_transduction(
        corpus, trainset, devset, epochs=trans_epochs,
        workdir=work, eval_every=eval_every, **hp_trans)
    t_ours = time.time() - t0
    dtw_ours = dtw_dev_cost(ours_pred, dev_examples)
    rmse_ours = mel_rmse(ours_pred, vdev_examples)
    pa_ours = phoneme_acc(ours_ph, vdev_examples)
    t0 = time.time()
    torch_pred, torch_ph = torch_transduction(
        corpus, trainset, devset, epochs=trans_epochs, **hp_trans)
    t_torch = time.time() - t0
    dtw_torch = dtw_dev_cost(torch_pred, dev_examples)
    rmse_torch = mel_rmse(torch_pred, vdev_examples)
    pa_torch = phoneme_acc(torch_ph, vdev_examples)
    out["transduction"] = {
        "dev_silent_dtw_mel_cost": {"tpu": round(dtw_ours, 4),
                                    "torch": round(dtw_torch, 4)},
        "dev_voiced_mel_rmse": {"tpu": round(rmse_ours, 4),
                                "torch": round(rmse_torch, 4)},
        "dev_voiced_phoneme_acc": {"tpu": round(pa_ours, 4),
                                   "torch": round(pa_torch, 4)},
        "n_dev": {"silent": len(dev_examples),
                  "voiced": len(vdev_examples)},
        "train_seconds": {"tpu": round(t_ours, 1),
                          "torch": round(t_torch, 1)},
    }
    print(json.dumps(out["transduction"], indent=1), flush=True)
    fresh_tasks.add("transduction")
    _write_partial(out, fresh_tasks)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rec_epochs", type=int, default=300)
    ap.add_argument("--trans_epochs", type=int, default=80)
    ap.add_argument("--utts", type=int, default=20,
                    help="utterances per session (4 sessions total)")
    ap.add_argument("--eval_every", type=int, default=1,
                    help="our trainers' val/checkpoint cadence in epochs")
    ap.add_argument("--tasks", choices=("all", "rec", "trans"),
                    default="all",
                    help="run one comparison only (the other half of "
                         "docs/HEADTOHEAD.json is preserved)")
    ap.add_argument("--ours_platform", choices=("cpu", "default"),
                    default="cpu",
                    help="'default' leaves JAX on its native backend "
                         "(the TPU when available) for OUR side")
    a = ap.parse_args()
    if a.ours_platform == "cpu":
        from silent_speech_tpu.utils.platform import force_cpu

        force_cpu(1)
    sys.path.insert(0, "tools")
    main(a.rec_epochs, a.trans_epochs, utts=a.utts,
         eval_every=a.eval_every, tasks=a.tasks)
