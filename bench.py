"""Benchmark: end-to-end LDM sampling throughput on real hardware.

Prints one JSON line per metric, the HEADLINE metric LAST (the driver
parses the final line): 256px LDM sampling, 20 DDIM steps + VAE decode,
batch 1. Baselines are the reference's measured CPU numbers
(BASELINE.md metric 1, path sample_ldm.py:71-75; the 512px figure was
measured the same way at the reference's documented default size,
sample_ldm.py:19).

Our pipeline runs the whole chain as one jitted program (see
ldm_image_generator_tpu/pipelines.py). Weights are randomly initialized —
identical compute graph/FLOPs as trained weights.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_S = 0.092       # 256px e2e, reference CPU (BASELINE.md)
# 512px e2e reference baseline: direct measurement of sample_ldm.py's path
# (20 DDIM steps + Decoder at latent 64) gave 41.5s/image = 0.0241 img/s;
# composing BASELINE.md's cleaner per-step figure (1.319 s/step x 20) with
# the measured 4.68s decode gives 31.1s = 0.0322 img/s. We quote the
# faster composition as the baseline to stay conservative.
BASELINE_512_IMAGES_PER_S = 0.0322


def measure(pipe, unet_params, dec_params, batch, image_size, n_iters=5):
    def run(seed):
        imgs = pipe.sample(
            unet_params, dec_params, jax.random.PRNGKey(seed),
            batch=batch, image_size=image_size, num_steps=20,
        )
        # fetch images to host: that's the user-visible deliverable, and
        # the only reliable fence on this tunneled backend (its
        # block_until_ready can return before the device finishes)
        return jax.device_get(imgs)

    run(0)  # warmup / compile
    start = time.perf_counter()
    for i in range(n_iters):
        out = run(i + 1)
    elapsed = time.perf_counter() - start
    assert out.shape == (batch, image_size, image_size, 3)
    return (n_iters * batch) / elapsed


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    pipe = LDMPipeline()  # default 385.7M UNet + default VAE decoder, bf16
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 32, 32, 8), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    unet_params = jax.jit(
        lambda k: pipe.unet.init({"params": k, "moe": k}, z, t)
    )(key)
    dec_params = jax.jit(lambda k: pipe.decoder.init(k, z))(
        jax.random.PRNGKey(1)
    )

    ips_512 = measure(pipe, unet_params, dec_params, batch, 512)
    print(json.dumps({
        "metric": f"ldm_sample_512px_images_per_s_batch{batch}",
        "value": round(ips_512, 4),
        "unit": "images/s",
        "vs_baseline": round(ips_512 / BASELINE_512_IMAGES_PER_S, 2),
    }), flush=True)

    ips = measure(pipe, unet_params, dec_params, batch, 256)
    print(json.dumps({
        "metric": f"ldm_sample_256px_images_per_s_batch{batch}",
        "value": round(ips, 4),
        "unit": "images/s",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_S, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
