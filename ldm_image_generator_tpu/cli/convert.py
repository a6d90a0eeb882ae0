"""Convert checkpoints between reference PyTorch and framework msgpack.

The trainers/samplers already auto-convert torch files at their
checkpoint paths; this tool does it explicitly (SURVEY.md §5
"convert_torch_ckpt tool"), e.g. for migrating a whole reference run:

    python -m ldm_image_generator_tpu.cli.convert ddpm.pt --kind ddpm -o ddpm.ckpt
    python -m ldm_image_generator_tpu.cli.convert vae_encoder.pt --kind encoder

and back — export a model trained here as a reference state_dict the
reference codebase loads with strict load_state_dict:

    python -m ldm_image_generator_tpu.cli.convert ddpm.ckpt --kind ddpm --to-torch
"""
from __future__ import annotations

import argparse
import os


KINDS = ("encoder", "decoder", "quantizer", "discriminator", "unet", "ddpm")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert checkpoints: torch state_dict <-> msgpack params"
    )
    p.add_argument("input", help="torch .pt state_dict or msgpack .ckpt file")
    p.add_argument("--kind", required=True, choices=KINDS)
    p.add_argument("-o", "--output", default=None,
                   help="output path (default: <input>.ckpt, or <input>.pt "
                        "with --to-torch)")
    p.add_argument("--config", default="default", choices=["default", "tiny"])
    p.add_argument("--to-torch", action="store_true",
                   help="reverse direction: msgpack params -> reference "
                        "torch state_dict (utils/torch_export.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.config import (
        DiscriminatorConfig,
        UNetConfig,
        VAEConfig,
    )

    vcfg = VAEConfig() if args.config == "default" else VAEConfig().tiny()
    ucfg = UNetConfig() if args.config == "default" else UNetConfig().tiny()
    dcfg = DiscriminatorConfig()

    if args.to_torch:
        from flax import serialization

        from ldm_image_generator_tpu.utils import torch_export as te
        from ldm_image_generator_tpu.utils.checkpoint import _is_torch_file

        with open(args.input, "rb") as f:
            data = f.read()
        if _is_torch_file(data[:8]):
            raise SystemExit(f"{args.input} is already a torch checkpoint")
        params = serialization.msgpack_restore(data)
        exporters = {
            "encoder": lambda: te.export_encoder(params, vcfg),
            "decoder": lambda: te.export_decoder(params, vcfg),
            "quantizer": lambda: te.export_quantizer(params),
            "discriminator": lambda: te.export_discriminator(params, dcfg),
            "unet": lambda: te.export_unet(params, ucfg),
            "ddpm": lambda: te.export_ddpm(params, ucfg),
        }
        sd = exporters[args.kind]()
        out = args.output or os.path.splitext(args.input)[0] + ".pt"
        te.save_state_dict(out, sd)
        n = sum(int(v.size) for v in sd.values())
        print(f"exported {args.input} ({args.kind}, {n/1e6:.2f}M params) "
              f"-> {out} [torch state_dict, {len(sd)} entries]")
        return

    from ldm_image_generator_tpu.utils import torch_import as ti
    from ldm_image_generator_tpu.utils.checkpoint import save_params

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
