"""Convert reference PyTorch checkpoints to framework msgpack files.

The trainers/samplers already auto-convert torch files at their
checkpoint paths; this tool does it explicitly (SURVEY.md §5
"convert_torch_ckpt tool"), e.g. for migrating a whole reference run:

    python -m ldm_image_generator_tpu.cli.convert ddpm.pt --kind ddpm -o ddpm.ckpt
    python -m ldm_image_generator_tpu.cli.convert vae_encoder.pt --kind encoder
"""
from __future__ import annotations

import argparse
import os


KINDS = ("encoder", "decoder", "quantizer", "discriminator", "unet", "ddpm")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert a reference torch state_dict to msgpack params"
    )
    p.add_argument("input", help="torch .pt state_dict file")
    p.add_argument("--kind", required=True, choices=KINDS)
    p.add_argument("-o", "--output", default=None,
                   help="output path (default: <input>.ckpt)")
    p.add_argument("--config", default="default", choices=["default", "tiny"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.config import (
        DiscriminatorConfig,
        UNetConfig,
        VAEConfig,
    )
    from ldm_image_generator_tpu.utils import torch_import as ti
    from ldm_image_generator_tpu.utils.checkpoint import save_params

    vcfg = VAEConfig() if args.config == "default" else VAEConfig().tiny()
    ucfg = UNetConfig() if args.config == "default" else UNetConfig().tiny()
    dcfg = DiscriminatorConfig()

    sd = ti.load_state_dict(args.input)
    converters = {
        "encoder": lambda: ti.convert_encoder(sd, vcfg),
        "decoder": lambda: ti.convert_decoder(sd, vcfg),
        "quantizer": lambda: ti.convert_quantizer(sd),
        "discriminator": lambda: ti.convert_discriminator(sd, dcfg),
        "unet": lambda: ti.convert_unet(sd, ucfg),
        "ddpm": lambda: ti.convert_ddpm(sd, ucfg),
    }
    params = converters[args.kind]()
    out = args.output or os.path.splitext(args.input)[0] + ".ckpt"
    save_params(out, params)
    import jax

    n = sum(int(l.size) for l in jax.tree.leaves(params))
    print(f"converted {args.input} ({args.kind}, {n/1e6:.2f}M params) -> {out}")


if __name__ == "__main__":
    main()
