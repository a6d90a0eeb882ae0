#!/bin/bash
# Serial TPU work queue for the round-4 evidence items (single-user TPU:
# exactly one process may touch the backend at a time, so everything
# here runs strictly in sequence). Launch detached:
#   nohup bash benchmarks/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Each stage logs to its own file under /tmp and the queue keeps going
# past individual failures (a dead stage should not starve the rest).
set -u
cd "$(dirname "$0")/.."

stage() {
  local name="$1"; shift
  echo "=== [$(date -u +%H:%M:%S)] start $name"
  "$@" > "/tmp/q_${name}.log" 2>&1
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$?"
}

stage cond_gate   python benchmarks/quality_gate_cond.py
stage qual_gate   python benchmarks/quality_gate.py
stage ablate_t64  python benchmarks/ablate.py --train 64
stage ablate_b1   python benchmarks/ablate.py 1 32
stage marginal    python benchmarks/micro.py --train-case ldm_b64_marginal
stage scan_repro  python benchmarks/scan_compile_repro.py
stage bench       python bench.py
echo "=== [$(date -u +%H:%M:%S)] queue complete"
