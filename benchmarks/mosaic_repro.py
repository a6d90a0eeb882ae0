"""Reproducers for this environment's Mosaic compiler failures.

Round 2 documented (kernels/window_attention.py) that two natural
head-batching constructions crash the remote Mosaic compiler, forcing
the static per-head loop; the round-2 verdict asked for a committed
reproducer of each claim. Each case here is a minimal standalone
pallas_call at the production attention shape (TN=8 windows, L=36
tokens, H=8 heads, d=32). Run on the TPU:

    python benchmarks/mosaic_repro.py

and each case prints OK / CRASH with the error head. The shipped kernel
avoids both patterns: the fold path (kernels/window_attention.py,
fold>1) builds block-diagonal operands with token-axis concats +
iota masks — no transposes, no 4-D ops in-kernel.

Known results on this environment (2026-08, axon tunnel; re-run to
revalidate after any toolchain change):
  case_transpose_4d   — 4-D [TN, L, H, d] -> [TN, H, L, d] in-kernel
                        transpose: CRASHES (Mosaic 'not implemented'
                        during transpose lowering).
  case_head_major_dot — the same batching expressed as one
                        dot_general with 2 batch dims [TN, H]:
                        CRASHES (tpu.matmul supports one batch dim).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TN, L, H, D = 8, 36, 8, 32
C = H * D


def _run(kernel, out_shape):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jax.random.normal(jax.random.PRNGKey(0), (TN, L, C), jnp.bfloat16)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = jax.jit(fn)(x)
    jax.device_get(out.ravel()[0])  # fence through the tunnel
    return out


def case_transpose_4d():
    """[TN, L, H*d] -> [TN, H, L, d] via in-kernel 4-D transpose."""

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        xh = x.reshape(TN, L, H, D).transpose(0, 2, 1, 3)  # [TN, H, L, D]
        o_ref[:] = jnp.sum(xh.astype(jnp.float32), axis=(2, 3))

    return _run(kernel, (TN, H))


def case_head_major_dot():
    """scores via one dot_general batched over (TN, H) — two batch dims."""

    def kernel(x_ref, o_ref):
        x = x_ref[:].reshape(TN, L, H, D)
        # batch dims (0, 2): q[tn, l, h, d] . k[tn, s, h, d] -> [tn, h, l, s]
        scores = jax.lax.dot_general(
            x, x,
            dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = jnp.sum(scores, axis=(2, 3))

    return _run(kernel, (TN, H))


def main():
    for case in (case_transpose_4d, case_head_major_dot):
        try:
            case()
            print(f"{case.__name__}: OK (no crash on this toolchain)")
        except Exception as e:
            head = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            print(f"{case.__name__}: CRASH — {head}")


if __name__ == "__main__":
    main()
