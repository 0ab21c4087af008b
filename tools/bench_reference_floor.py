"""Measured floor for bench.py's REFERENCE_STEPS_PER_SEC denominator.

Runs the genuine torch reference model (architecture.py, full size:
d=768, 6 layers) through a line-faithful replica of its training step
(transduction_model.py:98-157 dtw_loss + AdamW) on THIS host's CPU, on
the same reference-scale packed batches bench.py uses (~22k mel frames,
112 chunks x 200). The reference's own numba DTW is unavailable here
(numba not installed); the numpy oracle DP stands in — it is the same
O(T^2) host computation the reference runs per silent utterance.

Prints steps/s and writes docs/REFERENCE_FLOOR.json. This is the
reference pipeline's measured floor on available hardware; bench.py's
3.0 steps/s single-GPU estimate is documented (and kept deliberately
generous) relative to it.

Run: python tools/bench_reference_floor.py [n_steps]
"""
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from silent_speech_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(1)

import numpy as np  # noqa: E402


def main(n_steps=3):
    import torch
    import torch.nn.functional as F

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from absl import flags
    import architecture as ref_architecture

    from test_training_parity import (
        _combine_fixed_length_torch, _patch_torch2_compat, _ref_batches,
        _ref_dtw_loss)
    from bench import build_examples

    if not flags.FLAGS.is_parsed():
        flags.FLAGS(["floor"])
    flags.FLAGS.model_size = 768
    flags.FLAGS.num_layers = 6
    flags.FLAGS.dropout = 0.2

    seq_len = 200  # transduction_model.py:166
    torch.manual_seed(0)
    model = ref_architecture.Model(112, 80, 48)
    _patch_torch2_compat(model)
    model.train()
    optim = torch.optim.AdamW(model.parameters(), lr=1e-4,
                              weight_decay=1e-7)

    example_sets = [build_examples(np.random.default_rng(i))
                    for i in range(2)]
    batches = _ref_batches(torch, example_sets)

    def one_step(b):
        optim.zero_grad()
        X = _combine_fixed_length_torch(torch, b["emg"], seq_len)
        Xr = _combine_fixed_length_torch(torch, b["raw_emg"], seq_len * 8)
        sess = _combine_fixed_length_torch(torch, b["session_ids"],
                                           seq_len)
        pred, phone = model(X, Xr, sess)
        loss = _ref_dtw_loss(torch, F, pred, phone, b)
        loss.backward()
        optim.step()
        return float(loss.detach())

    print(f"torch {torch.__version__}, "
          f"{torch.get_num_threads()} CPU threads", flush=True)
    t0 = time.time()
    one_step(batches[0])  # warmup (allocators, MKL planning)
    warm = time.time() - t0
    print(f"warmup step: {warm:.1f}s", flush=True)

    t0 = time.time()
    for i in range(n_steps):
        loss = one_step(batches[(i + 1) % len(batches)])
        print(f"step {i}: loss={loss:.3f} "
              f"({time.time() - t0:.1f}s cumulative)", flush=True)
    dt = (time.time() - t0) / n_steps
    out = {
        "host_cpu_steps_per_sec": round(1.0 / dt, 4),
        "sec_per_step": round(dt, 2),
        "n_steps": n_steps,
        "config": "genuine reference model d=768 x6, replica step, "
                  "~22k-frame batches (bench.py build_examples), "
                  f"{torch.get_num_threads()} torch threads",
        "note": "measured floor on available hardware; the 3.0 steps/s "
                "bench denominator is a deliberately generous single-GPU "
                "estimate documented in bench.py",
    }
    with open("docs/REFERENCE_FLOOR.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
