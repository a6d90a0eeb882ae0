"""Sample from a pixel-space DDPM (reference sample_ddpm.py flow).

The reference hardcodes 10 images at 32px with per-image seed=i
(sample_ddpm.py:13-36); here those are argparse defaults, per-image seeds
are preserved (image i uses PRNGKey(seed + i)), and the UNet is 3-channel
so it actually runs (SURVEY.md §3.4).
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    from ldm_image_generator_tpu.cli.common import add_device_arg, str2bool

    p = argparse.ArgumentParser(description="Sample pixel-space DDPM")
    p.add_argument("-dp", "--ddpmpath", default="./ddpm.pt")
    add_device_arg(p)
    p.add_argument("-fp16", default=True, type=str2bool)
    p.add_argument("-s", "--size", default=32, type=int)
    p.add_argument("-n", "--numimages", default=10, type=int)
    p.add_argument("-t", "--timesteps", default=20, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--eta", default=0.0, type=float)
    p.add_argument("--cache-interval", default=1, type=int,
                   help="DeepCache deep-feature reuse: recompute the "
                        "UNet's deep core every N sampler steps "
                        "(1 = off; approximation)")
    p.add_argument("--sampler", default="ddim", choices=["ddim", "dpm++2m"],
                   help="dpm++2m: 2nd-order solver, ~half the steps for "
                        "DDIM-20 quality")
    p.add_argument("-o", "--outdir", default="./ddpm_outputs/")
    p.add_argument("--config", default="default", choices=["default", "tiny"],
                   help="model size preset (tiny = test/debug scale)")
    from ldm_image_generator_tpu.cli.common import add_diffusion_args

    add_diffusion_args(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.cli.common import maybe_load, save_image, setup_device

    setup_device(args.device, args)

    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
    from ldm_image_generator_tpu.pipelines import DDPMPipeline
    from ldm_image_generator_tpu.utils import torch_import as ti

    ucfg = UNetConfig(input_channels=3)
    if args.config == "tiny":
        ucfg = ucfg.tiny()
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    dcfg = DDPMConfig(prediction=args.prediction,
                      zero_terminal_snr=args.zero_snr)
    pipe = DDPMPipeline(ucfg, dcfg, dtype=dtype)

    key = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, args.size, args.size, 3))
    params = pipe.unet.init({"params": key, "moe": key}, x0,
                            jnp.zeros((1,), jnp.int32))
    params = maybe_load(args.ddpmpath, params,
                        lambda sd: ti.convert_ddpm(sd, ucfg)) or params

    os.makedirs(args.outdir, exist_ok=True)
    for i in range(args.numimages):
        # per-image seed (sample_ddpm.py:36)
        img = pipe.sample(params, jax.random.PRNGKey(args.seed + i),
                          batch=1, image_size=args.size,
                          num_steps=args.timesteps, eta=args.eta,
                          sampler=args.sampler,
                          cache_interval=args.cache_interval)
        save_image(jax.device_get(img)[0],
                   os.path.join(args.outdir, f"{i}.jpg"))
    print(f"saved {args.numimages} images to {args.outdir}")


if __name__ == "__main__":
    main()
