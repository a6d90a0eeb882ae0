"""Window-attention backend A/B at the production per-stage shapes.

The UNet's decoder attention runs at four shapes per batch (latent 32):
  dec0: C=128,  4 heads, 36-token windows, B*nwin = 36B
  dec1: C=256,  8 heads, 36-token windows, B*nwin = 9B
  dec2: C=512, 16 heads, 36-token windows, B*nwin = 4B
  dec3: C=1024,32 heads, 16-token full map (window bypass), N = B

Times kernels/window_attention.py's Pallas kernel vs the XLA lowering
per shape (chained, fenced) to decide where the fused kernel is enabled.

Run: python benchmarks/attn_shapes.py [batch] [tile_windows...]
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
    tiles = [int(a) for a in sys.argv[2:]] or [8, 32, 128]
    key = jax.random.PRNGKey(0)

    shapes = [
        ("dec0", 36 * batch, 36, 128, 4, True),
        ("dec1", 9 * batch, 36, 256, 8, True),
        ("dec2", 4 * batch, 36, 512, 16, True),
        ("dec3", batch, 16, 1024, 32, False),
    ]
    for name, n, l, c, h, masked in shapes:
        ks = jax.random.split(key, 10)
        x = jax.random.normal(ks[0], (n, l, c), jnp.bfloat16)
        mask = None
        if masked:
            # ~25% pad tokens, the realistic window-edge mask density
            mask = jax.random.uniform(ks[9], (n, l)) < 0.25
        w = lambda i: jax.random.normal(ks[i], (c, c), jnp.bfloat16) * 0.05
        b = lambda i: jnp.zeros((c,), jnp.bfloat16)
        args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))

        def xla_step(x, ws):
            return window_mha_xla(x, mask, *ws, num_heads=h).astype(x.dtype)

        sec = chained_time(xla_step, x, args, chain_len=30, iters=3)
        print(json.dumps({"shape": name, "backend": "xla",
                          "ms": round(sec * 1e3, 4)}), flush=True)

        for tn in tiles:
            if tn > n:
                continue

            def pallas_step(x, ws, tn=tn):
                return window_mha_pallas(
                    x, mask, *ws, num_heads=h, tile_windows=tn
                ).astype(x.dtype)

            try:
                sec = chained_time(pallas_step, x, args, chain_len=30, iters=3)
                print(json.dumps({"shape": name, "backend": f"pallas_tn{tn}",
                                  "ms": round(sec * 1e3, 4)}), flush=True)
            except Exception as e:  # Mosaic compile failures are data too
                print(json.dumps({"shape": name, "backend": f"pallas_tn{tn}",
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
