"""Head-folded window-attention A/B at the production per-stage shapes.

Round-2 left the 8/16-head stages on XLA: the Pallas kernel's static
per-head loop issues [TN, 36, 36] matmuls that use a sliver of the
128x128 MXU tile. fold=f packs f heads into one block-diagonal
[TN, f*36, f*32] joint matmul (kernels/window_attention.py) — this
script measures each fold factor per stage shape against the XLA
lowering and the fold=1 kernel to pick the 'auto' backend table.

Run: python benchmarks/attn_fold.py [batch] [tiles...]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.kernels.window_attention import (
    window_mha_pallas,
    window_mha_xla,
)
from ldm_image_generator_tpu.utils.profiling import chained_time


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tiles = [int(a) for a in sys.argv[2:]] or [8]
    key = jax.random.PRNGKey(0)

    # remote compiles cost ~10 min per program on this tunnel, so the
    # sweep is trimmed to the decision-relevant fold factors: the stages
    # round 2 left on XLA (8/16 heads) plus the full-map 32-head shape.
    shapes = [
        ("dec1", 9 * batch, 36, 256, 8, True, (4, 8)),
        ("dec2", 4 * batch, 36, 512, 16, True, (4, 8)),
        ("dec3", batch, 16, 1024, 32, False, (8,)),
        ("dec0", 36 * batch, 36, 128, 4, True, (4,)),
    ]
    for name, n, l, c, h, masked, folds in shapes:
        ks = jax.random.split(key, 10)
        x = jax.random.normal(ks[0], (n, l, c), jnp.bfloat16)
        mask = None
        if masked:
            mask = jax.random.uniform(ks[9], (n, l)) < 0.25
        w = lambda i: jax.random.normal(ks[i], (c, c), jnp.bfloat16) * 0.05
        b = lambda i: jnp.zeros((c,), jnp.bfloat16)
        args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))

        if os.environ.get("ATTN_FOLD_SKIP_XLA", "") != "1":
            def xla_step(x, ws):
                return window_mha_xla(x, mask, *ws,
                                      num_heads=h).astype(x.dtype)

            sec = chained_time(xla_step, x, args, chain_len=30, iters=3)
            print(json.dumps({"shape": name, "backend": "xla",
                              "ms": round(sec * 1e3, 4)}), flush=True)

        for fold in folds:
            for tn in tiles:
                if tn > n:
                    continue

                def step(x, ws, tn=tn, fold=fold):
                    return window_mha_pallas(
                        x, mask, *ws, num_heads=h, tile_windows=tn,
                        fold=fold,
                    ).astype(x.dtype)

                tag = f"pallas_f{fold}_tn{tn}"
                try:
                    sec = chained_time(step, x, args, chain_len=30, iters=3)
                    print(json.dumps({"shape": name, "backend": tag,
                                      "ms": round(sec * 1e3, 4)}),
                          flush=True)
                except Exception as e:
                    print(json.dumps({"shape": name, "backend": tag,
                                      "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
