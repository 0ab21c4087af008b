#!/bin/bash
# One-shot TPU measurement sweep for a round close (run from the repo
# root once the axon tunnel is reachable). Each step is bounded; outputs
# land in docs/tpu_sweep/.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/tpu_sweep

# Probe must only match a *device list* (e.g. "[TPU v5 lite0]" /
# "[TpuDevice(...)]"), not error text that happens to mention "TPU" —
# a CPU-fallback sweep silently overwriting the logs is worse than
# aborting.
probe=$(timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1)
case "$probe" in
  \[*TpuDevice*\]|\[*TPU*\]) echo "tunnel up: $probe" ;;
  *) echo "tunnel NOT reachable: $probe"; exit 1 ;;
esac

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" 2>&1 | tee "docs/tpu_sweep/$name.log" | tail -3
}

run bench          1200 python bench.py
run bench_vocoder   900 python bench_vocoder.py
run bench_export   1500 python tools/bench_export.py
run bench_stream   1200 python tools/bench_stream.py
run bench_decode    900 python tools/bench_decode.py
echo "sweep done; logs in docs/tpu_sweep/"
