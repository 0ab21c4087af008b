"""Trained-model accuracy artifact (VERDICT round-2 item 2; moved onto
the LEARNABLE corpus in round 5 per VERDICT round-4 item 3).

Trains both model families end-to-end on the learnable synthetic corpus
(``generate_corpus(learnable=True)``: EMG burst amplitudes and audio
harmonics deterministically encode the character sequence, so DEV-set
generalization is measurable — on the old pure-noise corpus dev metrics
were vacuous and the dev loss diverged) and measures accuracy through
the REAL eval paths:

- recognition: ``RecognitionTrainer.fit`` (the reference CTC loop,
  reference lr 3e-4 ``recognition_model.py:23``, dropout/shift on).
  Gates: DEV WER through the production decode — batched logits →
  native LM-fused beam search (ARPA built from the train texts),
  α=1.5/β=1.85 — improving and ≤ DEV_WER_TARGET, plus a held-in greedy
  probe separating "didn't learn" from "didn't generalize"
  (``recognition_model.py:30-58`` semantics).
- transduction: ``TransductionTrainer.fit`` (reference lr 1e-3,
  plateau patience 5 — live again because dev loss can improve here),
  then the full ``evaluate.py`` loop: EnsemblePredictor loss + phoneme
  accuracy, HiFi-GAN vocoding of every dev utterance to wav, and the
  ASR WER judge (``evaluate.py:36-64`` semantics). Gates: decreasing
  dev-loss curve + dev voiced mel RMSE ≤ DEV_RMSE_TARGET. The ASR judge
  is the offline tiny-wav2vec TransformersASR stand-in and the vocoder
  a fabricated checkpoint (the env has no DeepSpeech models, no
  released HiFi-GAN weights, no egress), so the synthesis WER documents
  the PATH, not fidelity.

Writes docs/ACCURACY.json + docs/ACCURACY.md.
Run: python tools/train_accuracy.py [max_recognition_epochs] [work_dir]
"""
import json
import math
import os
import sys
import tempfile
import time
from collections import Counter

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from silent_speech_tpu.utils.platform import force_cpu  # noqa: E402

import numpy as np  # noqa: E402


def build_arpa(texts, path, k=0.5):
    """Bigram ARPA with add-k smoothing over the corpus vocabulary."""
    uni = Counter()
    bi = Counter()
    for t in texts:
        words = t.split()
        uni.update(["<s>", "</s>"] + words)
        prev = "<s>"
        for w in words + ["</s>"]:
            bi[(prev, w)] += 1
            prev = w
    vocab = sorted(uni)
    v = len(vocab) + 1  # + <unk>
    total = sum(uni.values())
    lines = ["\\data\\", f"ngram 1={len(vocab) + 1}",
             f"ngram 2={len(bi)}", "", "\\1-grams:"]
    lines.append(f"{math.log10(k / (total + k * v)):.6f}\t<unk>")
    for w in vocab:
        p = (uni[w] + k) / (total + k * v)
        lines.append(f"{math.log10(p):.6f}\t{w}\t-0.301030")
    lines += ["", "\\2-grams:"]
    for (a, b), c in sorted(bi.items()):
        p = (c + k) / (uni[a] + k * v)
        lines.append(f"{math.log10(p):.6f}\t{a} {b}")
    lines += ["", "\\end\\", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def tiny_asr():
    """Offline tiny wav2vec2 CTC judge (tests/test_eval.py fixture)."""
    import torch
    import transformers

    vocab = {c: i for i, c in enumerate(
        ["<pad>", "<s>", "</s>", "<unk>", "|"]
        + [chr(ord("a") + i) for i in range(26)])}
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(vocab, f)
        vocab_file = f.name
    tok = transformers.Wav2Vec2CTCTokenizer(
        vocab_file, pad_token="<pad>", word_delimiter_token="|")
    fe = transformers.Wav2Vec2FeatureExtractor(
        feature_size=1, sampling_rate=16000, padding_value=0.0,
        do_normalize=True, return_attention_mask=False)
    processor = transformers.Wav2Vec2Processor(feature_extractor=fe,
                                               tokenizer=tok)
    cfg = transformers.Wav2Vec2Config(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_feat_extract_layers=2)
    torch.manual_seed(0)
    model = transformers.Wav2Vec2ForCTC(cfg).eval()
    from silent_speech_tpu.eval.asr import TransformersASR

    return TransformersASR(model=model, processor=processor)


DEV_WER_TARGET = 0.5    # recognition dev beam+LM WER gate
DEV_RMSE_TARGET = 1.0   # transduction dev voiced mel RMSE gate
                        # (uncorrelated unit-variance signals sit ~1.41)


def main(max_epochs=400, work=None):
    import jax

    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.data.synthetic import generate_corpus
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.recognition import RecognitionTrainer
    from silent_speech_tpu.train.transduction import TransductionTrainer

    # pass an existing work dir as argv[2] to resume (the recognition
    # phase picks up from its checkpoint instead of retraining)
    work = work or tempfile.mkdtemp(prefix="accuracy_run_")
    corpus = generate_corpus(os.path.join(work, "corpus"),
                             n_voiced_sessions=3, n_silent_sessions=1,
                             # 20 utts/session: at 12 the recognizer
                             # plateaus at dev WER 1.0 even after 400
                             # epochs (held-in ~0.6 — too little data to
                             # generalize from); at 20 the same recipe
                             # reaches the dev gate (HEADTOHEAD r5)
                             utterances_per_session=20, seed=42,
                             learnable=True)

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    out = {"corpus": "learnable synthetic seed=42, 3 voiced + 1 silent "
                     "sessions x 20 utterances"}

    # ================= recognition =====================================
    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = 128
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 1024
    cfg.model.num_heads = 8
    cfg.model.dropout = 0.2          # generalization gate → regularize
    cfg.model.shift_augment = True
    cfg.model.compute_dtype = "float32"
    cfg.data.t_cap = 512
    cfg.data.utt_cap = 16
    # Reference schedule scaled to the tiny corpus: lr 3e-4
    # (recognition_model.py:23 — 2e-3 blank-collapses CTC on this corpus,
    # see docs/HEADTOHEAD round-4 postmortem), warmup done in 16 batches,
    # milestone decay off (runs are a few hundred tiny epochs).
    cfg.recognition.learning_rate = 3e-4
    cfg.recognition.learning_rate_warmup = 16
    cfg.recognition.lr_milestones = ()
    cfg.recognition.max_batch_len = 4000
    cfg.recognition.output_directory = os.path.join(work, "rec")
    cfg.recognition.beam_width = 50

    trainset = EMGDataset(corpus, dev=False, test=False)
    devset = EMGDataset(corpus, dev=True)
    texts = [trainset.example_meta(i)["text"]
             for i in range(len(trainset))]
    lm_path = build_arpa(texts, os.path.join(work, "lm.arpa"))
    cfg.recognition.lm_path = lm_path

    rec = RecognitionTrainer(cfg, mesh=mesh)
    wer_curve = []
    curve_path = os.path.join(work, "rec_wer_curve.json")
    if os.path.exists(curve_path):
        with open(curve_path) as f:
            wer_curve = json.load(f)  # curve from earlier sessions
    t0 = time.time()
    total = 0
    chunk = 20
    extra_path = os.path.join(cfg.recognition.output_directory,
                              "checkpoint.extra.json")
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            total = int(json.load(f)["epoch"])
        rec.init_state(rec._pack([trainset[0]]), seed=0)
        from silent_speech_tpu.train.checkpoint import restore_checkpoint

        rec.state, _ = restore_checkpoint(
            cfg.recognition.output_directory, rec.state, with_extra=True)
        print(f"[rec] resumed at epoch {total}", flush=True)
    first = True
    while total < max_epochs:
        if first and total > 0:
            # resumed: evaluate before training more
            first = False
            w = rec.evaluate_wer(devset, beam=True)
            if w <= DEV_WER_TARGET:
                wg = rec.evaluate_wer(trainset, beam=False)
                wer_curve.append(
                    {"epoch": total, "dev_wer": round(w, 4),
                     "heldin_wer_greedy": round(wg, 4)})
                print(f"[rec] resumed model already at dev WER "
                      f"{w * 100:.2f}%", flush=True)
                break
        rec.fit(trainset, devset, epochs=total + chunk, seed=0,
                resume=total > 0, eval_every=chunk)
        total += chunk
        w = rec.evaluate_wer(devset, beam=True)
        wg = rec.evaluate_wer(trainset, beam=False)
        wer_curve.append({"epoch": total, "dev_wer": round(w, 4),
                          "heldin_wer_greedy": round(wg, 4)})
        with open(curve_path, "w") as f:
            json.dump(wer_curve, f)  # survive session splits
        print(f"[rec] epoch {total}: dev beam+LM WER "
              f"{w * 100:.2f}% held-in greedy {wg * 100:.2f}% "
              f"({time.time() - t0:.0f}s)", flush=True)
        if w <= DEV_WER_TARGET:
            break
    if not wer_curve:
        # resumed at/over max_epochs: the loop never ran — evaluate the
        # restored checkpoint so the artifact still reports a point
        w = rec.evaluate_wer(devset, beam=True)
        wg = rec.evaluate_wer(trainset, beam=False)
        wer_curve.append({"epoch": total, "dev_wer": round(w, 4),
                          "heldin_wer_greedy": round(wg, 4)})
    w_dev_greedy = rec.evaluate_wer(devset, beam=False)
    dev_curve_vals = [c["dev_wer"] for c in wer_curve]
    out["recognition"] = {
        "epochs": total,
        "dev_wer_beam_lm": wer_curve[-1]["dev_wer"],
        "dev_wer_greedy": round(w_dev_greedy, 4),
        "heldin_wer_greedy": wer_curve[-1]["heldin_wer_greedy"],
        "wer_curve": wer_curve,
        "decode": "batched logits -> native LM-fused beam "
                  f"(beam=50, ARPA bigram over train texts, "
                  "alpha=1.5 beta=1.85)",
        "dev_wer_target": DEV_WER_TARGET,
        "dev_curve_improving": (len(dev_curve_vals) > 1
                                and dev_curve_vals[-1]
                                < dev_curve_vals[0]),
        "target_met": wer_curve[-1]["dev_wer"] <= DEV_WER_TARGET,
    }

    # ================= transduction ====================================
    tcfg = Config()
    tcfg.data = corpus
    tcfg.model.model_size = 128
    tcfg.model.num_layers = 2
    tcfg.model.dim_feedforward = 1024
    tcfg.model.dropout = 0.2         # generalization gate → regularize
    tcfg.model.shift_augment = True
    tcfg.model.compute_dtype = "float32"
    tcfg.data.t_cap = 512
    tcfg.data.utt_cap = 16
    tcfg.transduction.learning_rate = 1e-3
    tcfg.transduction.learning_rate_warmup = 16   # see recognition note
    # the learnable corpus's dev loss CAN improve, so the reference
    # plateau scheduler (x0.5 patience 5, transduction_model.py:179)
    # is live again
    tcfg.transduction.learning_rate_patience = 5
    tcfg.transduction.max_batch_len = 4000
    tcfg.transduction.output_directory = os.path.join(work, "trans")

    trans = TransductionTrainer(tcfg, mesh=mesh)
    t0 = time.time()
    # the trainers report through logging; the CLIs tee it into log.txt
    # via run_logging — the API path needs its own handler for the
    # loss-curve parse below
    import logging

    log_path = os.path.join(tcfg.transduction.output_directory, "log.txt")
    os.makedirs(tcfg.transduction.output_directory, exist_ok=True)
    handler = logging.FileHandler(log_path)
    root = logging.getLogger()
    root.addHandler(handler)
    if root.level > logging.INFO:
        root.setLevel(logging.INFO)
    from silent_speech_tpu.eval.synthesis import EnsemblePredictor
    from silent_speech_tpu.models.hifigan import Vocoder, HiFiGANConfig
    from silent_speech_tpu.utils.audio_io import write_wav
    from silent_speech_tpu.eval.asr import evaluate as asr_evaluate
    from hifigan_util import write_tiny_checkpoint

    # chunked training with resume (mirrors the recognition phase). The
    # gate is now GENERALIZATION: framewise mel RMSE in normalized mel
    # space on the voiced renditions of the dev sentences (dev proper is
    # silent-only by the reference pairing rule — voiced_dev_view
    # re-discovers the voiced recordings; judges shared with
    # tools/headtohead.py). Held-in RMSE is still tracked as the
    # learning probe.
    from headtohead import voiced_dev_view

    vdev_examples = voiced_dev_view(corpus)

    def mel_rmse_over(ens, examples):
        vals = []
        for dp in examples:
            if dp["silent"]:
                continue
            pred = ens.predict(dp)
            tgt = np.asarray(dp["audio_features"])
            m = min(len(pred), len(tgt))
            vals.append(float(np.sqrt(np.mean(
                (pred[:m] - tgt[:m]) ** 2))))
        return float(np.mean(vals))

    heldin_examples = [trainset[i] for i in range(len(trainset))]

    def heldin_mel_rmse_fn(ens):
        return mel_rmse_over(ens, heldin_examples)

    total_t = 0
    extra_t = os.path.join(tcfg.transduction.output_directory,
                           "checkpoint.extra.json")
    if os.path.exists(extra_t):
        with open(extra_t) as f:
            total_t = int(json.load(f)["epoch"])
        print(f"[trans] resuming at epoch {total_t}", flush=True)
    acc_curve = []
    max_trans_epochs = 400
    try:
        while total_t < max_trans_epochs:
            chunk = 40
            trans.fit(trainset, devset, epochs=total_t + chunk, seed=0,
                      resume=total_t > 0)
            total_t += chunk
            ens = EnsemblePredictor(
                base=trans, states=[(trans.state.params,
                                     trans.state.batch_stats)])
            hl, ha, _ = ens.evaluate(trainset)
            rmse = heldin_mel_rmse_fn(ens)
            dev_rmse = mel_rmse_over(ens, vdev_examples)
            acc_curve.append(
                {"epoch": total_t,
                 "heldin_loss": round(float(hl), 4),
                 "heldin_mel_rmse": round(rmse, 4),
                 "dev_mel_rmse": round(dev_rmse, 4),
                 "heldin_phoneme_acc": round(float(ha), 4)})
            print(f"[trans] epoch {total_t}: held-in loss {float(hl):.4f}"
                  f" mel RMSE {rmse:.4f} dev mel RMSE {dev_rmse:.4f} "
                  f"phoneme acc {float(ha) * 100:.1f}% "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if dev_rmse <= DEV_RMSE_TARGET and total_t >= 2 * chunk:
                break
    finally:
        root.removeHandler(handler)
    loss_curve = []
    with open(log_path) as f:
        for line in f:
            if "finished epoch" in line and "validation loss" in line:
                parts = line.strip().split()
                loss_curve.append(
                    float(parts[parts.index("loss:") + 1]))
    print(f"[trans] {total_t} epochs in {time.time() - t0:.0f}s; "
          f"val loss {loss_curve[0]:.3f} -> {loss_curve[-1]:.3f}",
          flush=True)

    # full evaluate.py loop: ensemble eval + vocode + ASR judge
    ensemble = EnsemblePredictor(
        base=trans, states=[(trans.state.params,
                             trans.state.batch_stats)])
    ev_loss, ev_acc, _conf = ensemble.evaluate(devset)
    hi_loss, hi_acc, _ = ensemble.evaluate(trainset)

    # framewise mel RMSE in normalized mel space: held-in (learning
    # probe) and voiced-dev (generalization gate) — vocoder-independent
    # evidence for the mel head
    heldin_mel_rmse = heldin_mel_rmse_fn(ensemble)
    dev_mel_rmse = mel_rmse_over(ensemble, vdev_examples)
    # voiced-dev loss + phoneme accuracy through the ensemble eval path
    # (evaluate() only needs len()/[] — the list view works)
    dv_loss, dv_acc, _ = ensemble.evaluate(vdev_examples)

    hcfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),))
    ck = write_tiny_checkpoint(os.path.join(work, "voc"), hcfg)
    vocoder = Vocoder(ck)
    wav_dir = os.path.join(work, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    for i in range(len(devset)):
        dp = devset[i]
        mel = devset.mfcc_norm.inverse(ensemble.predict(dp))
        audio = vocoder(mel)
        write_wav(os.path.join(wav_dir, f"example_output_{i}.wav"),
                  np.asarray(audio), 22050)
    synth_wer = asr_evaluate(devset, wav_dir, asr=tiny_asr())

    out["transduction"] = {
        "epochs": total_t,
        "val_loss_curve": [round(x, 4) for x in loss_curve],
        "curve": acc_curve,
        "heldin_loss": round(float(hi_loss), 4),
        "heldin_phoneme_accuracy": round(float(hi_acc), 4),
        "heldin_mel_rmse_voiced": round(heldin_mel_rmse, 4),
        "dev_mel_rmse_voiced": round(dev_mel_rmse, 4),
        "dev_rmse_target": DEV_RMSE_TARGET,
        "dev_voiced_loss": round(float(dv_loss), 4),
        "dev_voiced_phoneme_accuracy": round(float(dv_acc), 4),
        "dev_loss_silent_dtw": round(float(ev_loss), 4),
        "dev_phoneme_accuracy": round(float(ev_acc), 4),
        "dev_loss_curve_improving": (len(loss_curve) > 1
                                     and loss_curve[-1] < loss_curve[0]),
        "target_met": dev_mel_rmse <= DEV_RMSE_TARGET,
        "synthesis_wer": round(float(synth_wer), 4),
        "synthesis_note": "full evaluate.py path (ensemble -> mel -> "
                          "HiFi-GAN -> wav -> ASR judge); fabricated "
                          "vocoder + offline tiny ASR stand-in, so this "
                          "WER documents the path, not fidelity",
    }

    os.makedirs("docs", exist_ok=True)
    with open("docs/ACCURACY.json", "w") as f:
        json.dump(out, f, indent=1)

    r = out["recognition"]
    t = out["transduction"]
    with open("docs/ACCURACY.md", "w") as f:
        f.write(f"""# Trained-model accuracy (learnable synthetic corpus)

End-to-end accuracy artifact (VERDICT round-2 item 2; regenerated on the
LEARNABLE corpus per VERDICT round-4 item 3): both model families
trained in this framework until they demonstrably GENERALIZE, with
accuracy measured through the real eval paths. The corpus
(``generate_corpus(learnable=True)``) derives EMG bursts and audio
harmonics deterministically from the character sequence, so dev-set
metrics measure generalization, not noise memorization.

## Recognition (EMG -> text, CTC)

Gate: dev WER <= {r['dev_wer_target'] * 100:.0f}% through the production
decode (batched masked logits -> native LM-fused beam, beam=50, ARPA
bigram over the train texts, alpha=1.5/beta=1.85 —
recognition_model.py:30-58 semantics), reference lr 3e-4, dropout 0.2,
shift augmentation on.

- epochs: {r['epochs']}
- **dev WER (beam+LM): {r['dev_wer_beam_lm'] * 100:.2f}%**
  (target met: {r['target_met']}; curve improving:
  {r['dev_curve_improving']})
- dev WER (greedy): {r['dev_wer_greedy'] * 100:.2f}%
- held-in WER (greedy, learning probe): \
{r['heldin_wer_greedy'] * 100:.2f}%
- curve: {json.dumps(r['wer_curve'])}

## Transduction (EMG -> speech)

{t['epochs']} epochs of the reference DTW-loss loop (lr 1e-3, plateau
x0.5 patience 5 — live again on this corpus, dropout 0.2, shift on).
Gate: voiced-dev framewise mel RMSE <= {t['dev_rmse_target']} in
normalized mel space (uncorrelated unit-variance signals sit at ~1.41),
then the full evaluate.py pipeline (EnsemblePredictor -> per-utterance
mel -> HiFi-GAN -> wav -> ASR judge, evaluate.py:36-64 semantics).

- **voiced-dev mel RMSE: {t['dev_mel_rmse_voiced']}** (target met:
  {t['target_met']}); held-in mel RMSE {t['heldin_mel_rmse_voiced']};
  curve: {json.dumps(t['curve'])}
- dev loss curve (silent DTW semantics): {t['val_loss_curve'][0]} ->
  {t['val_loss_curve'][-1]} (improving:
  {t['dev_loss_curve_improving']})
- voiced-dev loss {t['dev_voiced_loss']}, voiced-dev phoneme accuracy
  {t['dev_voiced_phoneme_accuracy'] * 100:.1f}%; held-in loss
  {t['heldin_loss']}, held-in phoneme accuracy
  {t['heldin_phoneme_accuracy'] * 100:.1f}%
- synthesis WER through the full path: {t['synthesis_wer'] * 100:.1f}%
  ({t['synthesis_note']})

Caveats: the corpus is synthetic-but-learnable (dev generalization is
the gate); no DeepSpeech/HiFi-GAN release weights exist in this
environment, so the synthesis WER exercises the full path with stand-in
models rather than producing a publishable number.
""")
    print(json.dumps({k: v for k, v in out.items() if k != "corpus"},
                     indent=1))


if __name__ == "__main__":
    # Platform pinning ONLY when run as a CLI: importing this module for
    # its helpers (headtohead.py pulls build_arpa) must NOT force the
    # whole importing process onto the CPU as a side effect.
    # Default: host CPU (deterministic, tunnel-independent). Set
    # SSTPU_ACCURACY_PLATFORM=default to leave jax on its native backend
    # (the TPU when the tunnel is up — ~5x faster per epoch; checkpoints
    # restore across platforms, so sessions can mix backends).
    if os.environ.get("SSTPU_ACCURACY_PLATFORM", "cpu") == "cpu":
        force_cpu(1)
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else None)
