"""Row-banded block_core hardware probe: exactness vs the XLA
composition and chained timing, at the b1 latent-64 stage shapes the
whole-image megakernel cannot hold (C=256/512/1024).

Run (TPU): python benchmarks/bc_rows_probe.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.kernels.block_core import (
    _pick_row_tile,
    _pick_tiles,
    block_core_pallas,
    block_core_xla,
)
from ldm_image_generator_tpu.utils.profiling import chained_time


def setup(b, hh, ww, c, m, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 20)
    r = lambda k, shape, s=0.05: (jax.random.normal(k, shape) * s).astype(
        jnp.bfloat16
    )
    x = jax.random.normal(ks[0], (b, hh, ww, c)).astype(jnp.bfloat16)
    mul = (jax.random.normal(ks[1], (1, hh, ww, c)) * 0.2 + 1.0).astype(
        jnp.bfloat16
    )
    bias = r(ks[2], (1, hh, ww, c), 0.2)
    gwa, gwb = r(ks[3], (c, m)), r(ks[4], (c, m))
    gwc = r(ks[5], (m, c))
    gba, gbb, gbc = r(ks[6], (m,)), r(ks[7], (m,)), r(ks[8], (c,))
    e = 4
    wa, wb = r(ks[9], (e, c, m)), r(ks[10], (e, c, m))
    wc = r(ks[11], (e, m, c))
    ba, bb, bc = r(ks[12], (e, m)), r(ks[13], (e, m)), r(ks[14], (e, c))
    ck = r(ks[15], (3, 3, 32, c), 0.1)
    cb = r(ks[16], (c,), 0.1)
    return (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc, ck, cb)


def main():
    shapes = [(1, 32, 32, 256), (1, 16, 16, 512), (1, 8, 8, 1024)]
    ids = jnp.asarray([1, 3], jnp.int32)
    for (b, hh, ww, c) in shapes:
        m = c
        args = setup(b, hh, ww, c, m)
        whole = _pick_tiles(b, hh * ww, c, m, True)
        rows = _pick_row_tile(hh, ww, c, m)
        try:
            out, h = block_core_pallas(*args, ids)
            ref_out, ref_h = block_core_xla(*args, 1, 3)
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref_out.astype(jnp.float32)))
                / (jnp.max(jnp.abs(ref_out.astype(jnp.float32))) + 1e-9)
            )

            def pal(x, a):
                o, _ = block_core_pallas(x, *a, ids)
                return o

            def xla(x, a):
                o, _ = block_core_xla(x, *a, 1, 3)
                return o

            rest = args[1:]
            t_pal = chained_time(pal, args[0], rest, chain_len=50, iters=3)
            t_xla = chained_time(xla, args[0], rest, chain_len=50, iters=3)
            print(json.dumps({
                "shape": [b, hh, ww, c], "whole_fits": bool(whole[2]),
                "row_tile": int(rows[0]), "rel_err": round(err, 6),
                "pallas_ms": round(t_pal * 1e3, 4),
                "xla_ms": round(t_xla * 1e3, 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"shape": [b, hh, ww, c],
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
