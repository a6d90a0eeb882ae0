#!/bin/bash
# Serial TPU work queue for the round-5 evidence items (single-user TPU:
# exactly one process may touch the backend at a time, so everything
# here runs strictly in sequence). Launch detached:
#   nohup bash benchmarks/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Each stage logs to its own file under /tmp, runs under a generous
# timeout (a hung backend-init or tunnel outage logs rc=124 instead of
# starving every later stage), and the queue keeps going past
# individual failures.
set -u
cd "$(dirname "$0")/.."

stage() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$(date -u +%H:%M:%S)] start $name (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  echo "=== [$(date -u +%H:%M:%S)] done $name rc=$?"
}

# in-model attention-backward A/B (keep/revert evidence for the
# default; interleaved in-process — see benchmarks/attn_bwd_ab.py)
stage attn_ab     3600  python benchmarks/attn_bwd_ab.py
stage cond_gate   10800 python benchmarks/quality_gate_cond.py
stage qual_gate   10800 python benchmarks/quality_gate.py
stage ablate_t64  5400  python benchmarks/ablate.py --train 64
stage ablate_b1   5400  python benchmarks/ablate.py 1 32
stage marginal    3600  python benchmarks/micro.py --train-case ldm_b64_marginal
stage scan_repro  3600  python benchmarks/scan_compile_repro.py
stage bench       3600  python bench.py
echo "=== [$(date -u +%H:%M:%S)] queue complete"
