"""Sustained serving throughput: the daemon under concurrent load.

bench.py measures the raw pipeline; this measures the PRODUCT path —
SamplerServer's dynamic batching + a thread pool of concurrent clients —
so the "batched sampling through the daemon" claim has a number:
steady-state images/s, mean dispatch batch, and queue-wait percentiles
at the default 385.7M config on one chip.

Run (TPU): python benchmarks/serving_bench.py [n_requests] [bucket]
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm_image_generator_tpu.config import (
        DDPMConfig, UNetConfig, VAEConfig,
    )
    from ldm_image_generator_tpu.pipelines import LDMPipeline
    from ldm_image_generator_tpu.serving import SamplerServer

    ucfg, vcfg = UNetConfig(), VAEConfig()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    size, latent = 256, 256 // vcfg.downscale
    z0 = jnp.zeros((1, latent, latent, ucfg.input_channels))
    unet_params = pipe.unet.init({"params": key, "moe": key}, z0,
                                 jnp.zeros((1,), jnp.int32))
    dec_params = pipe.decoder.init(key, z0)
    noise_shape = (latent, latent, ucfg.input_channels)

    def pipeline_sample(keys, batch):
        noise = jax.vmap(
            lambda k: jax.random.normal(k, noise_shape, jnp.float32)
        )(keys)
        return pipe.sample(unet_params, dec_params, jax.random.PRNGKey(0),
                           batch=batch, image_size=size, num_steps=20,
                           init_noise=noise)

    srv = SamplerServer(pipeline_sample, batch_buckets=(bucket,),
                        max_wait_ms=25)
    print("warmup (compile)...", flush=True)
    t0 = time.time()
    srv.warmup()
    print(f"warmup {time.time() - t0:.0f}s", flush=True)

    with srv:
        # saturate: a client pool wider than the bucket keeps the queue
        # non-empty, so the worker always dispatches full buckets
        pool = ThreadPoolExecutor(max_workers=2 * bucket)
        t0 = time.time()
        futs = list(pool.map(
            lambda s: srv.sample_sync(s, timeout=600), range(n_req)
        ))
        dt = time.time() - t0
    assert all(f.shape == (size, size, 3) for f in futs)
    snap = srv.stats.snapshot()
    print(json.dumps({
        "metric": f"serving_throughput_256px_bucket{bucket}",
        "value": round(n_req / dt, 2), "unit": "images/s",
        "n_requests": n_req,
        "mean_batch": snap.get("mean_batch"),
        "queue_wait": snap.get("queue_wait"),
        # reference has no serving path; its sequential sampler is
        # 0.092 img/s (BASELINE.md)
        "vs_baseline": round(n_req / dt / 0.092, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
