"""Sweep the attention head-fold factors at the HEADLINE operating
point: batch-1 256px end-to-end sampling (20 DDIM steps + decode).

Round 3 tuned LDM_ATTN_FOLD_WIN / LDM_ATTN_FOLD_SHORT at b64/t64
(benchmarks/attn_inmodel.py) and shipped those as defaults
(models/layers.py MultiHeadAttention) — but the official bench runs
b1-e2e, where the trade-offs (MXU occupancy vs f^2 FLOP inflation)
differ. This sweeps the grid on the real LDMPipeline and prints
images/s per combo, interleaved per round so host-steal episodes hit
every combo instead of biasing one.

Run (TPU): python benchmarks/fold_sweep_b1.py [batch] [image_size]
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from ldm_image_generator_tpu.pipelines import LDMPipeline

    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)

    pipe0 = LDMPipeline()
    unet_params = jax.jit(
        lambda k: pipe0.unet.init({"params": k, "moe": k}, z, t)
    )(key)
    dec_params = jax.jit(lambda k: pipe0.decoder.init(k, z))(
        jax.random.PRNGKey(1)
    )

    combos = list(itertools.product((1, 2, 4), (2, 4, 8)))
    pipes = {}
    for f_win, f_short in combos:
        os.environ["LDM_ATTN_FOLD_WIN"] = str(f_win)
        os.environ["LDM_ATTN_FOLD_SHORT"] = str(f_short)
        # a fresh pipeline per combo: its jit cache keys on the module
        # tree, and the env vars are read at trace time
        pipe = LDMPipeline()
        img = jax.device_get(pipe.sample(
            unet_params, dec_params, key, batch=batch, image_size=size,
            num_steps=20,
        ))  # compile + warmup
        assert img.shape[0] == batch
        pipes[(f_win, f_short)] = pipe
        print(f"compiled win={f_win} short={f_short}", flush=True)

    iters, rounds = 5, 3
    times = {c: [] for c in combos}
    for r in range(rounds):
        for c in combos:
            os.environ["LDM_ATTN_FOLD_WIN"] = str(c[0])
            os.environ["LDM_ATTN_FOLD_SHORT"] = str(c[1])
            t0 = time.perf_counter()
            for i in range(iters):
                jax.device_get(pipes[c].sample(
                    unet_params, dec_params, jax.random.PRNGKey(r * 10 + i),
                    batch=batch, image_size=size, num_steps=20,
                ))
            times[c].append(
                (iters * batch) / (time.perf_counter() - t0)
            )
    for c in combos:
        vals = sorted(times[c])
        print(json.dumps({
            "fold_win": c[0], "fold_short": c[1], "batch": batch,
            "size": size,
            "images_per_s_median": round(vals[len(vals) // 2], 4),
            "trials": [round(v, 4) for v in vals],
        }), flush=True)


if __name__ == "__main__":
    main()
