"""In-model A/B for the MoE routing plan (models/unet.py moe_plan).

The plan replaces every block's scalar fold_in+threefry expert-pair
draw (36 tiny scalar kernels per UNet apply on the default config —
the ~0.35 ms/step "routing/scalar handling" of docs/PERF.md) with ONE
vectorized randint at the top of the apply. Distribution unchanged;
this script measures whether the step time actually improves, built
for this host's measurement reality (CLAUDE.md): one process, both
variants compiled side by side, strictly interleaved fenced timings so
host steal hits both arms equally.

Phase 1 (headline path): e2e 256px b1 sampling, 20 DDIM steps + VAE
decode, device_get-fenced like bench.py. Two LDMPipeline instances —
`self` is a static argnum of the jitted sample, so a fresh instance
forces a fresh trace under each env setting (LDM_MOE_PLAN is read at
TRACE time in UNet.__call__).

Phase 2 (training): b64 latent-32 LDM train step, donated 4-step
lax.scan chains (the ldm_b64 unit), plan vs LDM_MOE_PLAN=0.

Output: one JSON line per arm per phase + a verdict line.

Run (TPU, owns the chip): python benchmarks/moe_plan_ab.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
from ldm_image_generator_tpu.utils.profiling import fence

TRIALS = 5
SAMPLE_ITERS = 5


def med(v):
    return sorted(v)[len(v) // 2]


def phase_sample():
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)

    arms = {}
    params = None
    for name, env in (("plan", None), ("noplan", "0")):
        if env is None:
            os.environ.pop("LDM_MOE_PLAN", None)
        else:
            os.environ["LDM_MOE_PLAN"] = env
        pipe = LDMPipeline()  # fresh instance -> fresh trace under env
        if params is None:
            up = jax.jit(
                lambda k: pipe.unet.init({"params": k, "moe": k}, z, t1)
            )(key)
            dp = jax.jit(lambda k: pipe.decoder.init(k, z))(
                jax.random.PRNGKey(1)
            )
            params = (up, dp)
        up, dp = params

        def run(seed, pipe=pipe, up=up, dp=dp):
            return jax.device_get(pipe.sample(
                up, dp, jax.random.PRNGKey(seed),
                batch=1, image_size=256, num_steps=20,
            ))

        t0 = time.perf_counter()
        run(0)
        print(f"# sample/{name}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        arms[name] = run

    times = {k: [] for k in arms}
    for trial in range(TRIALS):
        for name, run in arms.items():
            t0 = time.perf_counter()
            for i in range(SAMPLE_ITERS):
                run(1 + trial * SAMPLE_ITERS + i)
            times[name].append(
                (time.perf_counter() - t0) / SAMPLE_ITERS)
    for k in arms:
        print(json.dumps({
            "metric": f"ldm_sample_256px_b1_moe_{k}",
            "value": round(med(times[k]), 5), "unit": "s/image",
            "trials": [round(t, 5) for t in times[k]],
        }), flush=True)
    return med(times["plan"]) / med(times["noplan"])


def phase_train():
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import UNet
    from ldm_image_generator_tpu.train import (
        LDMTrainState, make_ldm_train_step, make_optimizer,
    )

    key = jax.random.PRNGKey(0)
    batch, n = 64, 4
    schedule = make_schedule(DDPMConfig())
    z32 = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    tx = make_optimizer("adamw", 1e-4)
    xb = jax.random.normal(key, (batch, 32, 32, 8), jnp.float32)

    arms = {}
    st = None
    for name, env in (("plan", None), ("noplan", "0")):
        if env is None:
            os.environ.pop("LDM_MOE_PLAN", None)
        else:
            os.environ["LDM_MOE_PLAN"] = env
        unet = UNet(UNetConfig(), dtype=jnp.bfloat16)
        if st is None:
            up = jax.jit(
                lambda k: unet.init({"params": k, "moe": k}, z32, t1)
            )(key)
            st = LDMTrainState(params=up, opt_state=tx.init(up),
                               step=jnp.zeros((), jnp.int32))
            del up
        step = make_ldm_train_step(unet, schedule, tx)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(state, step=step):
            def body(s, i):
                s, m = step(s, xb, jax.random.fold_in(key, i))
                return s, m["loss"]

            return jax.lax.scan(body, state, jnp.arange(n))

        t0 = time.perf_counter()
        st, out = chain(st)
        fence(out)
        print(f"# train/{name}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        arms[name] = chain

    times = {k: [] for k in arms}
    for trial in range(TRIALS):
        for name, chain in arms.items():
            t0 = time.perf_counter()
            st, out = chain(st)
            fence(out)
            times[name].append((time.perf_counter() - t0) / n)
    for k in arms:
        print(json.dumps({
            "metric": f"ldm_train_step_b64_moe_{k}",
            "value": round(med(times[k]), 5), "unit": "s/step",
            "trials": [round(t, 5) for t in times[k]],
        }), flush=True)
    return med(times["plan"]) / med(times["noplan"])


def main():
    r_sample = phase_sample()
    r_train = phase_train()
    print(json.dumps({
        "metric": "moe_plan_vs_noplan_ratio",
        "sample_b1": round(r_sample, 4),
        "train_b64": round(r_train, 4),
        "verdict": "keep plan default" if min(r_sample, r_train) <= 1.0
        and max(r_sample, r_train) <= 1.02
        else ("keep (within noise)" if max(r_sample, r_train) <= 1.02
              else "REVERT: plan slower in-model"),
    }), flush=True)


if __name__ == "__main__":
    main()
