"""Benchmark: end-to-end 256px LDM sampling throughput on real hardware.

Prints ONE JSON line {metric, value, unit, vs_baseline}. The baseline is
the reference's measured CPU number: 0.092 images/s for a single 256px
sample = 20 DDIM steps of the 385.7M-param UNet at latent 32x32 plus the
VAE decode (BASELINE.md metric 1, path sample_ldm.py:71-75).

Our pipeline runs the whole chain as one jitted program (see
ldm_image_generator_tpu/pipelines.py). Weights are randomly initialized —
identical compute graph/FLOPs as trained weights.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_S = 0.092


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    pipe = LDMPipeline()  # default 385.7M UNet + default VAE decoder, bf16
    key = jax.random.PRNGKey(0)
    latent = 32
    z = jnp.zeros((1, latent, latent, 8), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    unet_params = jax.jit(
        lambda k: pipe.unet.init({"params": k, "moe": k}, z, t)
    )(key)
    dec_params = jax.jit(lambda k: pipe.decoder.init(k, z))(
        jax.random.PRNGKey(1)
    )

    def run(seed):
        imgs = pipe.sample(
            unet_params, dec_params, jax.random.PRNGKey(seed),
            batch=batch, image_size=256, num_steps=20,
        )
        # fetch images to host: that's the user-visible deliverable, and
        # the only reliable fence on this tunneled backend (its
        # block_until_ready can return before the device finishes)
        return jax.device_get(imgs)

    run(0)  # warmup / compile

    n_iters = 5
    start = time.perf_counter()
    for i in range(n_iters):
        out = run(i + 1)
    elapsed = time.perf_counter() - start
    images_per_s = (n_iters * batch) / elapsed
    assert out.shape == (batch, 256, 256, 3)

    print(json.dumps({
        "metric": f"ldm_sample_256px_images_per_s_batch{batch}",
        "value": round(images_per_s, 4),
        "unit": "images/s",
        "vs_baseline": round(images_per_s / BASELINE_IMAGES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
