"""Sustained serving throughput: the daemon under concurrent load.

bench.py measures the raw pipeline; this measures the PRODUCT path —
SamplerServer's dynamic batching + a thread pool of concurrent clients —
so the "batched sampling through the daemon" claim has a number:
steady-state images/s, mean dispatch batch, and queue-wait percentiles
at the default 385.7M config on one chip.

Modes (round 4 adds img2img at any bucket + the guided CFG variant):

  python benchmarks/serving_bench.py [n_requests] [bucket]
  python benchmarks/serving_bench.py [n] [bucket] --img2img [strength]
      img2img serving (SDEdit partial diffusion from a client image) at
      the SAME bucket as the uncond headline, plus a fenced
      encode-vs-denoise split of one dispatch so the uncond/img2img gap
      is attributed, not guessed.
  python benchmarks/serving_bench.py [n] [bucket] --guided
      the CFG variant (per-request guidance scales as a traced vector,
      two UNet evals per step): the cost of the guided bucket.
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_req = int(args[0]) if len(args) > 0 else 96
    bucket = int(args[1]) if len(args) > 1 else 8
    img2img = "--img2img" in sys.argv
    guided = "--guided" in sys.argv
    strength = float(args[2]) if img2img and len(args) > 2 else 0.5

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm_image_generator_tpu.config import (
        DDPMConfig, UNetConfig, VAEConfig,
    )
    from ldm_image_generator_tpu.pipelines import LDMPipeline
    from ldm_image_generator_tpu.serving import SamplerServer, Variant

    ucfg, vcfg = UNetConfig(), VAEConfig()
    n_classes = 3 if guided else 0
    if guided:
        import dataclasses

        ucfg = dataclasses.replace(ucfg, num_classes=n_classes)
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    size, latent = 256, 256 // vcfg.downscale
    z0 = jnp.zeros((1, latent, latent, ucfg.input_channels))
    unet_params = pipe.unet.init({"params": key, "moe": key}, z0,
                                 jnp.zeros((1,), jnp.int32))
    dec_params = pipe.decoder.init(key, z0)
    enc_params = pipe.encoder.init(key, jnp.zeros((1, size, size, 3)))
    noise_shape = (latent, latent, ucfg.input_channels)

    def make_noise(keys):
        return jax.vmap(
            lambda k: jax.random.normal(k, noise_shape, jnp.float32)
        )(keys)

    if img2img:
        def pipeline_fn(keys, batch, payload=None):
            return pipe.img2img(
                unet_params, dec_params, enc_params, jax.random.PRNGKey(0),
                payload, strength=strength, num_steps=20,
                fwd_noise=make_noise(keys),
            )

        variant = Variant(pipeline_fn, payload_shape=(size, size, 3))
        tag = f"img2img_s{strength}"
    elif guided:
        def pipeline_fn(keys, batch, class_ids, guidance_scales):
            return pipe.sample(
                unet_params, dec_params, jax.random.PRNGKey(0),
                batch=batch, image_size=size, num_steps=20,
                init_noise=make_noise(keys), condition=class_ids,
                guidance_scales=guidance_scales,
            )

        variant = Variant(pipeline_fn, takes_guidance=True)
        tag = "guided_cfg"
    else:
        def pipeline_fn(keys, batch):
            return pipe.sample(unet_params, dec_params, jax.random.PRNGKey(0),
                               batch=batch, image_size=size, num_steps=20,
                               init_noise=make_noise(keys))

        variant = pipeline_fn
        tag = "256px"

    srv = SamplerServer(variant, batch_buckets=(bucket,), max_wait_ms=25,
                        num_classes=n_classes if guided else None)
    print("warmup (compile)...", flush=True)
    t0 = time.time()
    srv.warmup()
    print(f"warmup {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    payload = (rng.uniform(-1, 1, (size, size, 3)).astype(np.float32)
               if img2img else None)

    def submit_sync(s):
        fut = srv.submit(
            s,
            payload=payload if img2img else None,
            class_id=(s % n_classes) if guided else None,
            guidance=(1.5 + (s % 5)) if guided else None,
        )
        return fut.result(timeout=600)

    with srv:
        # saturate: a client pool wider than the bucket keeps the queue
        # non-empty, so the worker always dispatches full buckets
        pool = ThreadPoolExecutor(max_workers=2 * bucket)
        t0 = time.time()
        futs = list(pool.map(submit_sync, range(n_req)))
        dt = time.time() - t0
    assert all(f.shape == (size, size, 3) for f in futs)
    snap = srv.stats.snapshot()
    rec = {
        "metric": f"serving_throughput_{tag}_bucket{bucket}",
        "value": round(n_req / dt, 2), "unit": "images/s",
        "n_requests": n_req,
        "mean_batch": snap.get("mean_batch"),
        "queue_wait": snap.get("queue_wait"),
        # reference has no serving path; its sequential sampler is
        # 0.092 img/s (BASELINE.md)
        "vs_baseline": round(n_req / dt / 0.092, 1),
    }

    if img2img:
        # encode-vs-denoise attribution: fenced single-dispatch timings
        # of (a) the full img2img chain, (b) the encoder alone, (c) the
        # plain-noise sampler at the same bucket — the uncond/img2img
        # gap decomposes into encode cost + the shorter denoise
        # schedule (strength*20 steps) + payload H2D.
        from ldm_image_generator_tpu.utils.profiling import fence

        keys = jax.random.split(jax.random.PRNGKey(1), bucket)
        batch_payload = jnp.asarray(
            np.stack([payload] * bucket), jnp.float32)
        encode = jax.jit(lambda p: pipe.encoder.apply(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), enc_params),
            p.astype(jnp.bfloat16)))

        def timed(fn, *a):
            fence(fn(*a))  # compile + drain
            t = time.perf_counter()
            out = None
            for _ in range(3):
                out = fn(*a)
            fence(out)
            return (time.perf_counter() - t) / 3

        t_full = timed(lambda p: pipeline_fn(keys, bucket, payload=p),
                       batch_payload)
        t_enc = timed(encode, batch_payload)
        t_plain = timed(
            lambda: pipe.sample(unet_params, dec_params,
                                jax.random.PRNGKey(0), batch=bucket,
                                image_size=size, num_steps=20,
                                init_noise=make_noise(keys)))
        rec["split_ms"] = {
            "img2img_dispatch": round(t_full * 1e3, 1),
            "encode_only": round(t_enc * 1e3, 1),
            "uncond_20step_dispatch": round(t_plain * 1e3, 1),
        }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
