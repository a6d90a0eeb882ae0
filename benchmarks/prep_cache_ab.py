"""In-model A/B for the prepared-state cache (pipelines._PrepCache).

The cache hoists the seed-independent prep out of every sampling call:
the fp32 -> bf16 cast of the param trees (~2.3 GB of HBM traffic per
call for the default 385.7M UNet) and the FiLM schedule collection
(one pass over the ~184M-param conditioning towers). This script
measures the e2e effect on the headline path (256px b1 sampling, 20
DDIM steps + decode, device_get-fenced like bench.py), built for this
host's measurement reality (CLAUDE.md): one process, both arms
compiled up front, strictly interleaved trials so host steal hits both
arms equally.

LDM_PREP_CACHE is read at CALL time (pipelines._prep_cache_enabled),
so one pipeline instance serves both arms — flipping the env var
routes between the precast=True and precast=False traces of the same
jitted sample.

Output: one JSON line per arm + a verdict line.

Run (TPU, owns the chip): python benchmarks/prep_cache_ab.py [batch]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TRIALS = 5
SAMPLE_ITERS = 5


def med(v):
    return sorted(v)[len(v) // 2]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    pipe = LDMPipeline()
    up = jax.jit(lambda k: pipe.unet.init({"params": k, "moe": k}, z, t1))(
        key
    )
    dp = jax.jit(lambda k: pipe.decoder.init(k, z))(jax.random.PRNGKey(1))

    def run(seed):
        return jax.device_get(pipe.sample(
            up, dp, jax.random.PRNGKey(seed),
            batch=batch, image_size=256, num_steps=20,
        ))

    arms = ("prep", "noprep")

    def set_arm(name):
        if name == "prep":
            os.environ.pop("LDM_PREP_CACHE", None)
        else:
            os.environ["LDM_PREP_CACHE"] = "0"

    for name in arms:
        set_arm(name)
        t0 = time.perf_counter()
        run(0)
        print(f"# {name}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    times = {k: [] for k in arms}
    for trial in range(TRIALS):
        for name in arms:
            set_arm(name)
            t0 = time.perf_counter()
            for i in range(SAMPLE_ITERS):
                run(1 + trial * SAMPLE_ITERS + i)
            times[name].append((time.perf_counter() - t0) / SAMPLE_ITERS)

    for k in arms:
        print(json.dumps({
            "metric": f"ldm_sample_256px_b{batch}_{k}",
            "value": round(med(times[k]), 5), "unit": "s/image",
            "trials": [round(t, 5) for t in times[k]],
        }), flush=True)
    ratio = med(times["prep"]) / med(times["noprep"])
    print(json.dumps({
        "metric": "prep_cache_vs_noprep_ratio",
        "value": round(ratio, 4),
        "verdict": "keep prep cache default" if ratio <= 1.0
        else ("keep (within noise)" if ratio <= 1.02
              else "REVERT: prep cache slower in-model"),
    }), flush=True)


if __name__ == "__main__":
    main()
