"""Long-horizon CTC training parity vs the genuine torch reference.

Extends tests/test_training_parity_ctc.py (identical-init, identical
batches, dropout/shift off, f32, accum x2) to N batches and records both
per-batch CTC loss trajectories. Writes docs/PARITY_CONVERGENCE_CTC.json.

Run: python tools/parity_convergence_ctc.py [n_steps]
"""
import json
import sys
import tempfile

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from silent_speech_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(1)


def main(n_steps=60):
    import torch

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    from test_training_parity_ctc import run_ours_ctc, run_reference_ctc
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.data.synthetic import generate_corpus

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["convergence_ctc"])

    seq_len, warmup, target_lr, wd = 40, 10, 1e-3, 1e-7
    flags.FLAGS.model_size = 64
    flags.FLAGS.num_layers = 2
    flags.FLAGS.dropout = 0.0

    root = tempfile.mkdtemp(prefix="conv_corpus_ctc_")
    corpus = generate_corpus(root, n_voiced_sessions=1,
                             n_silent_sessions=1,
                             utterances_per_session=6, seed=11)
    ds = EMGDataset(corpus, dev=False, test=False)
    examples = [ds[i] for i in range(len(ds))]
    examples.sort(key=lambda e: not bool(e["silent"]))
    batch_ids = [list(range(0, 4)), list(range(4, len(examples)))]
    example_batches = [[examples[i] for i in ids] for ids in batch_ids]

    ref_losses, _ = run_reference_ctc(
        ref_architecture, torch, example_batches, n_steps=n_steps,
        seq_len=seq_len, warmup=warmup, target_lr=target_lr, wd=wd)

    torch.manual_seed(0)
    init_model = ref_architecture.Model(112, 38)
    sd = {k: v.detach().numpy()
          for k, v in init_model.state_dict().items()}
    our_losses, _ = run_ours_ctc(
        corpus, example_batches, sd, n_steps=n_steps, seq_len=seq_len,
        warmup=warmup, target_lr=target_lr, wd=wd)

    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(our_losses, ref_losses)]
    out = {
        "n_steps": n_steps,
        "config": {"model_size": 64, "num_layers": 2, "seq_len": seq_len,
                   "warmup": warmup, "lr": target_lr, "weight_decay": wd,
                   "grad_accum": 2,
                   "corpus": "synthetic seed=11, 12 utterances"},
        "ref_losses": [round(x, 6) for x in ref_losses],
        "our_losses": [round(x, 6) for x in our_losses],
        "max_rel_err": round(max(rel), 6),
        "final_ref": round(ref_losses[-1], 6),
        "final_ours": round(our_losses[-1], 6),
        "descended": {
            "ref": ref_losses[-1] < ref_losses[0],
            "ours": our_losses[-1] < our_losses[0],
        },
    }
    path = "docs/PARITY_CONVERGENCE_CTC.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: max_rel_err={out['max_rel_err']} over "
          f"{n_steps} batches; final ref={out['final_ref']} "
          f"ours={out['final_ours']}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
