"""Measure the REFERENCE's training-step costs on CPU (torch eager).

The reference publishes no benchmarks (SURVEY.md §6); BASELINE.md's
numbers cover inference paths only. This script measures the two
documented training workloads so micro.py --train has honest baselines:

  * VAE+GAN step: batch 8 of 512px images, RandomCrop(192) per step,
    loss/opt recipe exactly train_vae.py:104-127 (Adafactor x2, hinge).
  * LDM train step: batch 64 latent 32x32x8, AdamW + autocast-off,
    fwd+bwd+opt through the default 385.7M UNet (train_ldm.py:76-86).

Run (CPU, ~15 min): python benchmarks/ref_train_baseline.py [--quick]
Prints one JSON line per metric.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference")


def measure_vae_step(iters=3):
    import random

    import torch
    from vae import VAE, Encoder, Decoder, VectorQuantizer, Discriminator

    torch.manual_seed(0)
    vae = VAE(Encoder(), Decoder(), VectorQuantizer())
    disc = Discriminator()
    from transformers import Adafactor

    opt_v = Adafactor(vae.parameters())
    opt_d = Adafactor(disc.parameters())

    def crop(x):
        # torchvision RandomCrop semantics on a batched tensor: one
        # offset for the whole batch (train_vae.py:57,109); torchvision
        # is not installed in this environment
        top = random.randint(0, x.shape[-2] - 192)
        left = random.randint(0, x.shape[-1] - 192)
        return x[..., top:top + 192, left:left + 192]

    imgs = torch.randn(8, 3, 512, 512)

    def step():
        image = crop(imgs)
        opt_v.zero_grad()
        recon_loss, reg_loss, y = vae.calclate_loss(image)
        adv_loss = torch.relu(-disc.calclate_logit(y)).mean()
        loss = recon_loss * 10 + reg_loss + 0.1 * adv_loss
        loss.backward()
        opt_v.step()
        opt_d.zero_grad()
        yd = y.detach()
        d_loss = (
            torch.relu(1.0 + disc.calclate_logit(yd))
            + torch.relu(1.0 - disc.calclate_logit(image))
        ).mean()
        d_loss.backward()
        opt_d.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def measure_ldm_step(iters=2):
    import torch
    from ddpm import DDPM
    from unet import UNet

    torch.manual_seed(0)
    ddpm = DDPM(UNet())
    opt = torch.optim.AdamW(ddpm.parameters(), lr=1e-4)
    latents = torch.randn(64, 8, 32, 32)

    def step():
        opt.zero_grad()
        loss = ddpm.calculate_loss(latents)
        loss.backward()
        opt.step()

    step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def main():
    quick = "--quick" in sys.argv
    sec = measure_vae_step(iters=2 if quick else 3)
    print(json.dumps({"metric": "ref_vae_gan_train_step_b8_512px_crop192",
                      "value": round(sec, 3), "unit": "s/step",
                      "hw": "cpu torch eager"}), flush=True)
    sec = measure_ldm_step(iters=1 if quick else 2)
    print(json.dumps({"metric": "ref_ldm_train_step_b64_latent32",
                      "value": round(sec, 3), "unit": "s/step",
                      "hw": "cpu torch eager"}), flush=True)


if __name__ == "__main__":
    main()
