"""Component ablation timing for the UNet denoise step.

Times chained denoise steps with individual SwinBlock branches disabled
(UNetConfig.ablate_branches keeps param trees identical) to attribute
step time; profiler traces don't cross this environment's TPU tunnel, so
attribution is by ablation. Prints JSON lines.

Run: python benchmarks/ablate.py [batch] [latent]
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    latent = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, latent, latent, 8), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    rngs = {"moe": jax.random.PRNGKey(2)}

    base_cfg = UNetConfig()
    unet0 = UNet(base_cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: unet0.init({"params": k, "moe": k}, x, t)
    )(key)  # ablated variants keep identical param trees - init once

    def timed(name, cfg):
        unet = UNet(cfg, dtype=jnp.bfloat16)

        def step(x, params):
            return unet.apply(params, x, t, deterministic=True,
                              rngs=rngs).astype(jnp.float32)

        sec = chained_time(step, x, params, chain_len=30, iters=3)
        print(json.dumps({"variant": name, "batch": batch, "latent": latent,
                          "value": round(sec * 1000, 4), "unit": "ms/step"}),
              flush=True)
        return sec

    timed("full", base_cfg)
    for name in ["attn", "moe", "conv", "film", "norm"]:
        cfg = dataclasses.replace(base_cfg, ablate_branches=(name,))
        timed(f"no_{name}", cfg)


if __name__ == "__main__":
    main()
