"""Overfit demo: train the tiny VAE + LDM on 16 synthetic images and show
the losses collapse; writes reconstructions + samples as JPEGs.

This is the qualitative learning-dynamics check the unit tests can't
give (they only assert a few steps of loss decrease). Runs in a few
minutes on one TPU chip:

    python examples/overfit_demo.py [steps] [outdir]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_synthetic_images(n: int = 16, size: int = 64) -> np.ndarray:
    """Colored circles on smooth gradients, NHWC float32 in [-1, 1]."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = []
    for i in range(n):
        bg = np.stack(
            [
                yy * rng.uniform(-1, 1) + xx * rng.uniform(-1, 1)
                + rng.uniform(-0.3, 0.3)
                for _ in range(3)
            ],
            axis=-1,
        )
        cx, cy, r = rng.uniform(0.25, 0.75, 3)
        r = 0.1 + 0.2 * r
        mask = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        color = rng.uniform(-1, 1, 3).astype(np.float32)
        img = np.where(mask[..., None], color, bg)
        imgs.append(np.clip(img, -1, 1))
    return np.stack(imgs).astype(np.float32)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    outdir = sys.argv[2] if len(sys.argv) > 2 else "examples/outputs"
    os.makedirs(outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import (
        DDPMConfig,
        DiscriminatorConfig,
        UNetConfig,
        VAEConfig,
    )
    from ldm_image_generator_tpu.diffusion import ddim_sample, make_schedule
    from ldm_image_generator_tpu.models import (
        Decoder,
        Discriminator,
        Encoder,
        UNet,
        VectorQuantizer,
    )
    from ldm_image_generator_tpu.cli.common import float_to_image, save_image
    from ldm_image_generator_tpu.train import (
        LDMTrainState,
        VAETrainState,
        make_ldm_train_step,
        make_optimizer,
        make_vae_train_step,
    )

    key = jax.random.PRNGKey(0)
    images = jnp.asarray(make_synthetic_images(16, 64))

    # ---- VAE ------------------------------------------------------------
    vcfg = VAEConfig().tiny()  # 2x downscale
    dcfg = DiscriminatorConfig(channels=(8, 8), stages=(1, 1))
    enc, dec = Encoder(vcfg), Decoder(vcfg)
    q = VectorQuantizer(vcfg.num_embeddings, vcfg.embedding_dim)
    disc = Discriminator(dcfg)
    z0 = jnp.zeros((1, 32, 32, vcfg.latent_channels))
    vp = {
        "encoder": enc.init(key, images[:1])["params"],
        "decoder": dec.init(key, z0)["params"],
        "quantizer": q.init(key, z0.reshape(1, -1, vcfg.latent_channels))["params"],
    }
    dp = disc.init(key, images[:1])["params"]
    tx_v, tx_d = make_optimizer("adafactor"), make_optimizer("adafactor")
    vstate = VAETrainState(
        vae_params=vp, disc_params=dp, opt_state_vae=tx_v.init(vp),
        opt_state_disc=tx_d.init(dp), step=jnp.zeros((), jnp.int32),
    )
    vstep = jax.jit(make_vae_train_step(enc, dec, q, disc, tx_v, tx_d,
                                        crop_size=0))
    recon_first = recon_last = None
    for i in range(steps):
        vstate, vm, (recon, _) = vstep(vstate, images, jax.random.PRNGKey(i))
        if i == 0:
            recon_first = float(vm["recon"])
        recon_last = float(vm["recon"])
    print(json.dumps({"phase": "vae", "steps": steps,
                      "recon_first": round(recon_first, 4),
                      "recon_last": round(recon_last, 4)}), flush=True)
    save_image(float_to_image(np.asarray(jax.device_get(recon[0]))),
               os.path.join(outdir, "vae_recon.jpg"))
    save_image(float_to_image(np.asarray(images[0])),
               os.path.join(outdir, "vae_input.jpg"))

    # ---- LDM on frozen latents ------------------------------------------
    encode = jax.jit(lambda p, x: enc.apply({"params": p}, x))
    latents = encode(vstate.vae_params["encoder"], images)
    ucfg = UNetConfig(input_channels=vcfg.latent_channels).tiny()
    unet = UNet(ucfg)
    schedule = make_schedule(DDPMConfig())
    params = unet.init({"params": key, "moe": key, "sd": key},
                       latents[:1], jnp.zeros((1,), jnp.int32))
    tx = make_optimizer("adamw", 3e-4)
    lstate = LDMTrainState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))
    lstep = jax.jit(make_ldm_train_step(unet, schedule, tx))
    loss_first = loss_last = None
    for i in range(steps * 2):
        lstate, lm = lstep(lstate, latents, jax.random.PRNGKey(10_000 + i))
        if i == 0:
            loss_first = float(lm["loss"])
        loss_last = float(lm["loss"])
    print(json.dumps({"phase": "ldm", "steps": steps * 2,
                      "loss_first": round(loss_first, 4),
                      "loss_last": round(loss_last, 4)}), flush=True)

    # ---- sample ----------------------------------------------------------
    def denoise(x, t, k):
        return unet.apply(lstate.params, x, t, deterministic=True,
                          rngs={"moe": k}).astype(jnp.float32)

    z = jax.jit(
        lambda k: ddim_sample(denoise, schedule, k, latents[:4].shape,
                              num_steps=20)
    )(jax.random.PRNGKey(7))
    imgs = jax.jit(
        lambda p, z: dec.apply({"params": p}, z)
    )(vstate.vae_params["decoder"], z)
    imgs = np.asarray(jax.device_get(imgs))
    for i in range(4):
        save_image(float_to_image(imgs[i]),
                   os.path.join(outdir, f"ldm_sample_{i}.jpg"))

    # ---- sample quality: patched KID on VAE-encoder features ------------
    # (inception-free; ~0 when samples match the training distribution —
    # the guard that perf work can't silently break quality)
    from ldm_image_generator_tpu.utils.quality import kid_from_images

    kid_samples = float(jax.jit(
        lambda p, a, b: kid_from_images(enc, {"params": p}, a, b)
    )(vstate.vae_params["encoder"], images, jnp.clip(jnp.asarray(imgs), -1, 1)))
    # reference scale: KID of pure-noise "samples" against the same reals
    noise_imgs = jax.random.uniform(
        jax.random.PRNGKey(9), imgs.shape, minval=-1.0, maxval=1.0
    )
    kid_noise = float(jax.jit(
        lambda p, a, b: kid_from_images(enc, {"params": p}, a, b)
    )(vstate.vae_params["encoder"], images, noise_imgs))
    print(json.dumps({
        "phase": "quality", "metric": "patched_kid_vae_features",
        "kid_samples": round(kid_samples, 5),
        "kid_noise_reference": round(kid_noise, 5),
    }), flush=True)
    print(json.dumps({"phase": "done", "outdir": outdir}), flush=True)


if __name__ == "__main__":
    main()
