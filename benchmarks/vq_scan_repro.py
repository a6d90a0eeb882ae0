"""Minimize the VQ-kernel-in-lax.scan remote-compile crash.

scan_compile_repro.py (round 3) isolated the trigger to the Pallas VQ
nearest-neighbor kernel (kernels/vq.py) lowered inside a lax.scan body:
the full VAE-GAN train step scans fine with the XLA VQ path, crashes
the remote compile helper (HTTP 500, subprocess exit 1, no diagnostic)
with the Pallas path. This file bisects the trigger down from that full
step to the smallest structure that still crashes.

Cases (each in its own subprocess; prints OK / CRASH):

  outside     control: the kernel once, no scan
  scan_bare   lax.scan body = ONLY the pallas_call (+ a trivial carry)
  scan_grad   the kernel under stop_gradient inside value_and_grad
              inside scan — the real quantizer's straight-through
              arrangement (models/vae.py:152-155) in a grad-in-scan
              body, with the codebook gather + symmetric L1 loss
  scan_train  scan_grad plus an SGD param update carried through the
              scan (the train step's actual data flow: params enter as
              carry, the kernel input depends on a matmul of them)

Measured on this environment (2026-08-18, axon tunnel; remote v5e
Mosaic compile helper):

  outside:    OK — idx sum matches
  scan_bare:  OK  — a bare pallas_call in a scan body is NOT the
              trigger (the round-3 hypothesis was wrong); the
              lane-major output spec is fine under scan.
  scan_grad:  OK — losses finite and stable across scan steps
  scan_train: OK — the full params-as-carry SGD data flow compiles
              and runs

ALL minimized cases pass: the quantizer's structure (pallas_call under
stop_gradient inside value_and_grad inside lax.scan, params as carry)
is NOT the crash trigger by itself. The round-3 full-VAE-step crash
(scan_compile_repro.py) must come from something larger — candidate
suspects are total program size (VAE+GAN step has both generator and
discriminator towers) or the interaction with the conv stack. Re-run
scan_compile_repro.py to re-test the full step on current
infrastructure before further bisecting.

Note a row-major [ntiles, TILE_N] output variant is NOT a possible
workaround: Pallas TPU lowering rejects (1, TILE_N) blocks of a
(ntiles, TILE_N) array outright (sublane dim 1 neither divisible by 8
nor equal to ntiles), which is why kernels/vq.py uses the lane-major
(1, N) layout in the first place.

Run on the TPU: python benchmarks/vq_scan_repro.py [--case NAME]
"""
from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = ("outside", "scan_bare", "scan_grad", "scan_train")

N, D, K = 4608, 8, 8192  # the VAE step's quantizer shape at crop 192, b8


def run_case(case: str) -> None:
    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.kernels.vq import (
        nearest_codebook_indices_pallas,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, D), jnp.float32)
    codebook = jax.random.normal(jax.random.fold_in(key, 1), (K, D),
                                 jnp.float32)

    call = lambda x_, cb_: nearest_codebook_indices_pallas(x_, cb_)

    if case == "outside":
        idx = jax.jit(call)(x, codebook)
        print("idx sum:", int(jnp.sum(idx)))
        return

    if case == "scan_bare":
        @jax.jit
        def chain(cb):
            def body(c, i):
                idx = call(x + c, cb)
                return c + 1e-6 * jnp.sum(idx).astype(jnp.float32), idx[0]

            return jax.lax.scan(body, jnp.zeros(()), jnp.arange(4))

        _, firsts = chain(codebook)
        print("firsts:", [int(v) for v in firsts])
        return

    sg = jax.lax.stop_gradient

    def vq_loss(cb, x_):
        # the real quantizer's straight-through arrangement
        # (models/vae.py:142-163): the kernel sees only stop_gradient
        # inputs; grads flow through the gather + L1 terms
        idx = call(sg(x_), sg(cb))
        e = cb[idx]
        return jnp.mean(jnp.abs(x_ - sg(e))) + jnp.mean(jnp.abs(e - sg(x_)))

    if case == "scan_grad":
        @jax.jit
        def chain(cb):
            def body(c, i):
                val, g = jax.value_and_grad(vq_loss)(cb, x + c)
                return c + 0.0 * val, val

            return jax.lax.scan(body, jnp.zeros(()), jnp.arange(4))

        _, vals = chain(codebook)
        print("losses:", [round(float(v), 4) for v in vals])
        return

    if case == "scan_train":
        w0 = jax.random.normal(jax.random.fold_in(key, 2), (D, D),
                               jnp.float32) * 0.3

        def loss(params, i):
            w, cb = params
            z = jnp.tanh(x @ w)  # a differentiable "encoder" stage
            return vq_loss(cb, z) + 1e-3 * jnp.mean(z * z)

        @jax.jit
        def chain(params):
            def body(p, i):
                val, g = jax.value_and_grad(loss)(p, i)
                p = jax.tree.map(lambda a, b: a - 1e-2 * b, p, g)
                return p, val

            return jax.lax.scan(body, params, jnp.arange(4))

        _, vals = chain((w0, codebook))
        print("losses:", [round(float(v), 4) for v in vals])
        return

    raise SystemExit(f"unknown case {case}")


def main():
    for case in (
        [sys.argv[sys.argv.index("--case") + 1]] if "--case" in sys.argv
        else CASES
    ):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--runner", case],
            capture_output=True, text=True, timeout=1800,
            env=dict(os.environ),
        )
        if r.returncode == 0:
            print(f"{case}: OK — {r.stdout.strip().splitlines()[-1]}",
                  flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            head = next((l for l in tail if "Error" in l or "error" in l),
                        tail[-1] if tail else "?")
            print(f"{case}: CRASH — {head[:200]}", flush=True)


if __name__ == "__main__":
    if "--runner" in sys.argv:
        run_case(sys.argv[sys.argv.index("--runner") + 1])
    else:
        main()
