"""Component ablation timing for the UNet denoise step.

Times chained denoise steps with individual SwinBlock branches disabled
(UNetConfig.ablate_branches keeps param trees identical) to attribute
step time; profiler traces don't cross this environment's TPU tunnel, so
attribution is by ablation. Prints JSON lines.

Run: python benchmarks/ablate.py [batch] [latent]

`--train [batch]` attributes the TRAINING step instead (round-4 verdict
item 1: the b64 backward is ~54 ms vs the 26 ms forward — which branch
pays it?): per ablated branch, times the exact training forward
(ddpm_loss, stochastic depth ON) and the same with value_and_grad, and
derives each branch's fwd / bwd cost by subtraction from the full
model. ~12 remote compiles, run on an otherwise idle TPU.
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


def train_main():
    """Per-branch fwd/bwd attribution of the LDM training step."""
    import time

    args = [a for a in sys.argv[1:] if a != "--train"]
    batch = int(args[0]) if args else 64
    latent = 32

    from ldm_image_generator_tpu.config import DDPMConfig
    from ldm_image_generator_tpu.diffusion import ddpm_loss, make_schedule
    from ldm_image_generator_tpu.utils.profiling import fence

    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (batch, latent, latent, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    schedule = make_schedule(DDPMConfig())

    base_cfg = UNetConfig()
    unet0 = UNet(base_cfg, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda k: unet0.init({"params": k, "moe": k}, xb[:1], t1)
    )(key)  # ablated variants keep identical param trees - init once

    n = 4

    def timed(name, cfg):
        unet = UNet(cfg, dtype=jnp.bfloat16)

        def loss_fn(p, x, k):
            def denoise(x_t, tt, kk):
                k_moe, k_sd = jax.random.split(kk)
                return unet.apply(
                    p, x_t, tt, None, deterministic=False,
                    rngs={"moe": k_moe, "sd": k_sd},
                ).astype(jnp.float32)

            return ddpm_loss(denoise, schedule, x, k, loss="l1")

        # params as ARGUMENTS (closing over the 385M tree bakes 1.5GB
        # constants into the remote compile — CLAUDE.md)
        @jax.jit
        def chain_fwd(x, p):
            def body(c, i):
                loss = loss_fn(p, c, jax.random.fold_in(key, i))
                return c + 0.0 * loss, loss

            return jax.lax.scan(body, x, jnp.arange(n))

        @jax.jit
        def chain_grad(x, p):
            def body(c, i):
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, c, jax.random.fold_in(key, i))
                gsum = sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(grads))
                return c + 0.0 * (loss + gsum), loss

            return jax.lax.scan(body, x, jnp.arange(n))

        out = {}
        for seg, chain in (("fwd", chain_fwd), ("fwdbwd", chain_grad)):
            _, o = chain(xb, params)
            fence(o)
            t0 = time.perf_counter()
            iters = 2
            for _ in range(iters):
                _, o = chain(xb, params)
                fence(o)
            out[seg] = (time.perf_counter() - t0) / (iters * n)
        print(json.dumps({
            "variant": name, "batch": batch, "latent": latent,
            "fwd_ms": round(out["fwd"] * 1000, 3),
            "fwdbwd_ms": round(out["fwdbwd"] * 1000, 3),
            "bwd_ms": round((out["fwdbwd"] - out["fwd"]) * 1000, 3),
        }), flush=True)
        return out

    full = timed("full", base_cfg)
    for name in ["attn", "moe", "conv", "film", "norm"]:
        cfg = dataclasses.replace(base_cfg, ablate_branches=(name,))
        o = timed(f"no_{name}", cfg)
        print(json.dumps({
            "branch": name,
            "fwd_cost_ms": round((full["fwd"] - o["fwd"]) * 1000, 3),
            "bwd_cost_ms": round(
                ((full["fwdbwd"] - full["fwd"])
                 - (o["fwdbwd"] - o["fwd"])) * 1000, 3),
        }), flush=True)


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
    if "--train" in sys.argv:
        train_main()
    else:
        main()
