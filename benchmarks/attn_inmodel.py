"""In-model attention backend A/B: full-model b64 denoise per backend.

benchmarks/attn_fold.py measures kernels standalone; the b64 ablation
showed standalone absolute costs don't transfer (XLA fuses attention
into neighbors in-model; chained standalone runs overcount both
backends). This times the FULL default UNet denoise step — the verdict
metric's operating point (t batch = image batch, like micro.py) — for
each attention backend setting.

Run: python benchmarks/attn_inmodel.py [batch] [latent] [tbatch]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import UNetConfig
from ldm_image_generator_tpu.models.unet import UNet
from ldm_image_generator_tpu.utils.profiling import chained_time


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    latent = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    tbatch = int(sys.argv[3]) if len(sys.argv) > 3 else batch

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, latent, latent, 8), jnp.float32)
    t = jnp.full((tbatch,), 500, jnp.int32)
    rngs = {"moe": jax.random.PRNGKey(2)}

    base_cfg = UNetConfig()
    unet0 = UNet(base_cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: unet0.init({"params": k, "moe": k}, x, t)
    )(key)

    backends = tuple(
        os.environ.get("ATTN_INMODEL_BACKENDS", "auto,xla,pallas").split(",")
    )
    for backend in backends:
        cfg = dataclasses.replace(base_cfg, attention_backend=backend)
        unet = UNet(cfg, dtype=jnp.bfloat16)

        def step(x, params):
            return unet.apply(params, x, t, deterministic=True,
                              rngs=rngs).astype(jnp.float32)

        try:
            sec = chained_time(step, x, params, chain_len=20, iters=3)
            print(json.dumps({"backend": backend, "batch": batch,
                              "tbatch": tbatch, "latent": latent,
                              "ms": round(sec * 1e3, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"backend": backend,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
