"""Long-horizon training parity vs the genuine torch reference.

Extends tests/test_training_parity.py (identical-init, identical
batches, dropout/shift off, f32) from 6 steps to N: both frameworks
run the same warmup-AdamW schedule on the same synthetic corpus and
the per-step DTW+phoneme loss trajectories are recorded side by side.
Writes docs/PARITY_CONVERGENCE.json.

Run: python tools/parity_convergence.py [n_steps]
"""
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from silent_speech_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(1)

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main(n_steps=60):
    import torch
    import torch.nn.functional as F

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    from test_training_parity import (
        _patch_torch2_compat, _ref_batches, _ref_dtw_loss,
        _combine_fixed_length_torch)
    from silent_speech_tpu.config import Config
    from silent_speech_tpu.data.dataset import EMGDataset
    from silent_speech_tpu.data.synthetic import generate_corpus
    from silent_speech_tpu.models.convert import torch_to_flax
    from silent_speech_tpu.parallel.mesh import make_mesh
    from silent_speech_tpu.train.schedule import warmup_lr
    from silent_speech_tpu.train.transduction import TransductionTrainer
    from silent_speech_tpu.train.checkpoint import load_params_into_state
    import tempfile

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["convergence"])

    model_size, num_layers, seq_len = 64, 2, 40
    warmup, target_lr, wd = 10, 1e-3, 1e-7
    flags.FLAGS.model_size = model_size
    flags.FLAGS.num_layers = num_layers
    flags.FLAGS.dropout = 0.0

    root = tempfile.mkdtemp(prefix="conv_corpus_")
    corpus = generate_corpus(root, n_voiced_sessions=1,
                             n_silent_sessions=1,
                             utterances_per_session=6, seed=11)
    ds = EMGDataset(corpus, dev=False, test=False)
    examples = [ds[i] for i in range(len(ds))]
    examples.sort(key=lambda e: not bool(e["silent"]))
    batch_ids = [list(range(0, 4)), list(range(4, len(examples)))]
    example_batches = [[examples[i] for i in ids] for ids in batch_ids]

    # ---- reference loop -------------------------------------------------
    torch.manual_seed(0)
    ref_model = ref_architecture.Model(112, 80, 48)
    _patch_torch2_compat(ref_model)
    ref_model.train()
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref_architecture.random.randrange = lambda n: 0

    optim = torch.optim.AdamW(ref_model.parameters(), weight_decay=wd)
    t_batches = _ref_batches(torch, example_batches)

    ref_losses = []
    for step in range(n_steps):
        b = t_batches[step % len(t_batches)]
        optim.zero_grad()
        for g in optim.param_groups:
            g["lr"] = warmup_lr(step, target_lr, warmup)
        X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
        Xr = _combine_fixed_length_torch(torch, b["raw_emg"], seq_len * 8)
        sess = _combine_fixed_length_torch(torch, b["session_ids"],
                                           seq_len)
        pred, phone = ref_model(X, Xr, sess)
        loss = _ref_dtw_loss(torch, F, pred, phone, b)
        ref_losses.append(float(loss.detach()))
        loss.backward()
        optim.step()

    # ---- our trainer ----------------------------------------------------
    torch.manual_seed(0)
    init_model = ref_architecture.Model(112, 80, 48)
    state_dict = {k: v.detach().numpy()
                  for k, v in init_model.state_dict().items()}
    params, stats = torch_to_flax(state_dict, num_layers=num_layers)

    cfg = Config()
    cfg.data = corpus
    cfg.model.model_size = model_size
    cfg.model.num_layers = num_layers
    cfg.model.dim_feedforward = 3072
    cfg.model.dropout = 0.0
    cfg.model.compute_dtype = "float32"
    cfg.model.shift_augment = False
    cfg.data.seq_len = seq_len
    cfg.data.fixed_shapes = False
    cfg.data.chunk_bucket = 1
    cfg.transduction.l2 = wd
    cfg.transduction.moment_dtype = "float32"

    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    trainer = TransductionTrainer(cfg, mesh=mesh)
    packed = [trainer._pack(exs) for exs in example_batches]
    trainer.init_state(packed[0], seed=0)
    trainer.state = load_params_into_state(trainer.state, params, stats)

    rng = jax.random.PRNGKey(0)
    our_losses = []
    for step in range(n_steps):
        b = packed[step % len(packed)]
        db = trainer._to_device(b)
        trainer.state, m = trainer._train_step(
            trainer.state, db, rng,
            np.float32(warmup_lr(step, target_lr, warmup)), b.num_silent)
        our_losses.append(float(m["loss"]))

    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(our_losses, ref_losses)]
    out = {
        "n_steps": n_steps,
        "config": {"model_size": model_size, "num_layers": num_layers,
                   "seq_len": seq_len, "warmup": warmup,
                   "lr": target_lr, "weight_decay": wd,
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
    path = "docs/PARITY_CONVERGENCE.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: max_rel_err={out['max_rel_err']} over "
          f"{n_steps} steps; final ref={out['final_ref']} "
          f"ours={out['final_ours']}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
