"""Trained-model accuracy artifact (VERDICT round-2 item 2).

Trains both model families to OVERFIT the synthetic corpus end-to-end and
measures accuracy through the REAL eval paths:

- recognition: ``RecognitionTrainer.fit`` (the reference CTC loop) until
  held-in WER through the production decode — batched logits → native
  LM-fused beam search (ARPA built from the corpus texts), α=1.5/β=1.85 —
  reaches ≤ 5%, proving the system *learns*, not just steps
  (``recognition_model.py:30-58`` semantics).
- transduction: ``TransductionTrainer.fit`` to convergence on the DTW
  loss, then the full ``evaluate.py`` loop: EnsemblePredictor loss +
  phoneme accuracy, HiFi-GAN vocoding of every dev utterance to wav, and
  the ASR WER judge (``evaluate.py:36-64`` semantics). The judge here is
  the offline tiny-wav2vec TransformersASR stand-in and the vocoder is a
  fabricated checkpoint (the env has no DeepSpeech models, no released
  HiFi-GAN weights, and no egress), so the synthesis WER documents the
  PATH, not a publishable number — the recognition WER is the accuracy
  claim.

Writes docs/ACCURACY.json + docs/ACCURACY.md.
Run: python tools/train_accuracy.py [max_recognition_epochs]
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

force_cpu(1)

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
                             n_voiced_sessions=2, n_silent_sessions=1,
                             utterances_per_session=8, seed=42)

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    out = {"corpus": "synthetic seed=42, 2 voiced + 1 silent sessions "
                     "x 8 utterances"}

    # ================= recognition =====================================
    cfg = Config()
    cfg.data = corpus
    # size 128: the synthetic EMG is random noise, so fitting it is pure
    # memorization — at size 64 the greedy decode was still dropping
    # characters ("while rest brown water" -> "we res row waer") after
    # 500+ full-LR updates; doubling width makes the memorization fast.
    cfg.model.model_size = 128
    cfg.model.num_layers = 2
    cfg.model.dim_feedforward = 1024
    cfg.model.num_heads = 8
    cfg.model.dropout = 0.0          # overfit on purpose
    cfg.model.shift_augment = False
    cfg.model.compute_dtype = "float32"
    cfg.data.t_cap = 512
    cfg.data.utt_cap = 16
    # Overfit schedule. The corpus is 12 tiny utterances: the defaults
    # (one 128k-sample batch/epoch, 100-step warmup, accum x2, x0.5
    # milestones at epoch 125/150) give ~75 optimizer updates over 150
    # epochs with the LR still ramping — the model never trains. Pack
    # ~2-utterance batches (6/epoch -> 3 updates/epoch), finish warmup in
    # 16 batches, and disable the milestone decay.
    cfg.recognition.learning_rate = 2e-3
    cfg.recognition.learning_rate_warmup = 16
    cfg.recognition.lr_milestones = ()
    cfg.recognition.max_batch_len = 4000
    cfg.recognition.output_directory = os.path.join(work, "rec")
    cfg.recognition.beam_width = 50

    trainset = EMGDataset(corpus, dev=False, test=False)
    texts = [trainset.example_meta(i)["text"]
             for i in range(len(trainset))]
    lm_path = build_arpa(texts, os.path.join(work, "lm.arpa"))
    cfg.recognition.lm_path = lm_path

    rec = RecognitionTrainer(cfg, mesh=mesh)
    wer_curve = []
    t0 = time.time()
    total = 0
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
    target = 0.05
    first = True
    while total < max_epochs:
        chunk = 20
        if first and total > 0:
            # resumed: evaluate before training more
            first = False
            w = rec.evaluate_wer(trainset, beam=True)
            if w <= target:
                wg = rec.evaluate_wer(trainset, beam=False)
                wer_curve.append(
                    {"epoch": total, "heldin_wer": round(w, 4),
                     "heldin_wer_greedy": round(wg, 4)})
                print(f"[rec] resumed model already at WER "
                      f"{w * 100:.2f}%", flush=True)
                break
        rec.fit(trainset, trainset, epochs=total + chunk, seed=0,
                resume=total > 0)
        total += chunk
        w = rec.evaluate_wer(trainset, beam=True)
        wg = rec.evaluate_wer(trainset, beam=False)
        wer_curve.append({"epoch": total, "heldin_wer": round(w, 4),
                          "heldin_wer_greedy": round(wg, 4)})
        print(f"[rec] epoch {total}: held-in beam+LM WER "
              f"{w * 100:.2f}% greedy {wg * 100:.2f}% "
              f"({time.time() - t0:.0f}s)", flush=True)
        if w <= target:
            break
    w_greedy = rec.evaluate_wer(trainset, beam=False)
    out["recognition"] = {
        "epochs": total,
        "heldin_wer_beam_lm": wer_curve[-1]["heldin_wer"],
        "heldin_wer_greedy": round(w_greedy, 4),
        "wer_curve": wer_curve,
        "decode": "batched logits -> native LM-fused beam "
                  f"(beam=50, ARPA bigram over corpus texts, "
                  "alpha=1.5 beta=1.85)",
        "target_met": wer_curve[-1]["heldin_wer"] <= target,
    }

    # ================= transduction ====================================
    tcfg = Config()
    tcfg.data = corpus
    tcfg.model.model_size = 128
    tcfg.model.num_layers = 2
    tcfg.model.dim_feedforward = 1024
    tcfg.model.dropout = 0.0
    tcfg.model.shift_augment = False
    tcfg.model.compute_dtype = "float32"
    tcfg.data.t_cap = 512
    tcfg.data.utt_cap = 16
    tcfg.transduction.learning_rate = 1e-3
    tcfg.transduction.learning_rate_warmup = 16   # see recognition note
    # dev loss can't improve on this corpus (random-noise EMG), so the
    # plateau scheduler would halve the LR every `patience` epochs and
    # freeze the overfit — park the patience beyond the run
    tcfg.transduction.learning_rate_patience = 10_000
    tcfg.transduction.max_batch_len = 4000
    tcfg.transduction.output_directory = os.path.join(work, "trans")

    trans = TransductionTrainer(tcfg, mesh=mesh)
    devset = EMGDataset(corpus, dev=True)
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

    # chunked overfit with resume (mirrors the recognition phase). The
    # learning gate is the mel head — the transduction objective — via
    # held-in voiced mel RMSE in normalized mel space (random unit-
    # variance signals sit at ~sqrt(2); memorization drives it toward 0).
    # The auxiliary phoneme head (weight 0.5) is reported, not gated: on
    # random-noise EMG the mel term dominates the shared encoder.
    def heldin_mel_rmse_fn(ens):
        vals = []
        for i in range(len(trainset)):
            dp = trainset[i]
            if dp["silent"]:
                continue
            pred = ens.predict(dp)
            tgt = np.asarray(dp["audio_features"])
            m = min(len(pred), len(tgt))
            vals.append(float(np.sqrt(np.mean(
                (pred[:m] - tgt[:m]) ** 2))))
        return float(np.mean(vals))

    total_t = 0
    extra_t = os.path.join(tcfg.transduction.output_directory,
                           "checkpoint.extra.json")
    if os.path.exists(extra_t):
        with open(extra_t) as f:
            total_t = int(json.load(f)["epoch"])
        print(f"[trans] resuming at epoch {total_t}", flush=True)
    acc_curve = []
    target_rmse = 0.30
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
            acc_curve.append(
                {"epoch": total_t,
                 "heldin_loss": round(float(hl), 4),
                 "heldin_mel_rmse": round(rmse, 4),
                 "heldin_phoneme_acc": round(float(ha), 4)})
            print(f"[trans] epoch {total_t}: held-in loss {float(hl):.4f}"
                  f" mel RMSE {rmse:.4f} phoneme acc "
                  f"{float(ha) * 100:.1f}% "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if rmse <= target_rmse:
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

    # held-in mel reconstruction: RMSE between the predicted and target
    # normalized mel for every voiced held-in utterance (framewise
    # targets, so no alignment needed) — vocoder-independent evidence the
    # mel head fits
    heldin_mel_rmse = heldin_mel_rmse_fn(ensemble)

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
        "heldin_curve": acc_curve,
        "heldin_loss": round(float(hi_loss), 4),
        "heldin_phoneme_accuracy": round(float(hi_acc), 4),
        "heldin_mel_rmse_voiced": round(heldin_mel_rmse, 4),
        "heldin_rmse_target": target_rmse,
        "heldin_rmse_target_met": heldin_mel_rmse <= target_rmse,
        "dev_loss": round(float(ev_loss), 4),
        "dev_phoneme_accuracy": round(float(ev_acc), 4),
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
        f.write(f"""# Trained-model accuracy (synthetic corpus)

First end-to-end accuracy artifact (VERDICT round-2 item 2): both model
families trained in this framework until they demonstrably LEARN, with
accuracy measured through the real eval paths.

## Recognition (EMG -> text, CTC)

Overfit target: held-in WER <= 5% through the production decode
(batched masked logits -> native LM-fused beam, beam=50, ARPA bigram
over the corpus texts, alpha=1.5/beta=1.85 — recognition_model.py:30-58
semantics).

- epochs: {r['epochs']}
- **held-in WER (beam+LM): {r['heldin_wer_beam_lm'] * 100:.2f}%**
- held-in WER (greedy): {r['heldin_wer_greedy'] * 100:.2f}%
- curve: {json.dumps(r['wer_curve'])}

## Transduction (EMG -> speech)

{t['epochs']} epochs of the reference DTW-loss loop (overfit target:
held-in voiced mel RMSE <= {t['heldin_rmse_target']} in normalized mel
space, where uncorrelated unit-variance signals sit at ~1.41), then the
full evaluate.py pipeline (EnsemblePredictor -> per-utterance mel ->
HiFi-GAN -> wav -> ASR judge, evaluate.py:36-64 semantics).

- **held-in voiced mel RMSE: {t['heldin_mel_rmse_voiced']}**
  (target met: {t['heldin_rmse_target_met']}); held-in loss
  {t['heldin_loss']}; curve: {json.dumps(t['heldin_curve'])}
- held-in phoneme accuracy (auxiliary head, weight 0.5 — the mel term
  dominates on random-noise EMG): {t['heldin_phoneme_accuracy'] * 100:.1f}%
- dev loss: {t['dev_loss']} (val curve {t['val_loss_curve'][0]} ->
  {t['val_loss_curve'][-1]})
- dev phoneme accuracy: {t['dev_phoneme_accuracy'] * 100:.1f}%
- synthesis WER through the full path: {t['synthesis_wer'] * 100:.1f}%
  ({t['synthesis_note']})

Caveats: the corpus is synthetic (EMG is random noise, so recognition
accuracy = memorization capacity, which is exactly what the overfit
test certifies); no DeepSpeech/HiFi-GAN release weights exist in this
environment, so the synthesis WER exercises the full path with stand-in
models rather than producing a publishable number.
""")
    print(json.dumps({k: v for k, v in out.items() if k != "corpus"},
                     indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400,
         sys.argv[2] if len(sys.argv) > 2 else None)
