"""Train the VQ-regularized VAE with adversarial discriminator.

CLI surface mirrors the reference train_vae.py:15-32 (same flags and
defaults, -fp16 parsed correctly); training math mirrors its loop
(train_vae.py:99-149): per-batch random 192px crop, Adafactor for both
nets, loss = recon*10 + VQreg*1 + adv*0.1 (hinge), D hinge step, periodic
per-module checkpoint saves + recon/input JPEG dumps. TPU-first: one
jitted train step, batch sharded over the local device mesh, bf16 compute
when -fp16 true (no GradScaler needed on TPU).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from ldm_image_generator_tpu.cli.common import add_device_arg, str2bool

    p = argparse.ArgumentParser(description="Train VAE")
    p.add_argument("dataset_path")
    add_device_arg(p)
    p.add_argument("-e", "--epoch", default=1, type=int)
    p.add_argument("-b", "--batch", default=1, type=int)
    p.add_argument("-r", "--result", default="./results")
    p.add_argument("-ep", "--encpath", default="./vae_encoder.pt")
    p.add_argument("-dp", "--decpath", default="./vae_decoder.pt")
    p.add_argument("-qp", "--quantizerpath", default="vae_quantizer.pt")
    p.add_argument("-discp", "--discpath", default="./discriminator.pt")
    p.add_argument("-fp16", default=False, type=str2bool,
                   help="bf16 compute on TPU")
    p.add_argument("-s", "--size", default=512, type=int)
    p.add_argument("-m", "--maxdata", default=-1, type=int)
    p.add_argument("--recon", default=10, type=float)
    p.add_argument("--save-every", default=100, type=int)
    p.add_argument("--ckpt-dir", default=None,
                   help="orbax full-train-state dir (params+opt+rng resume)")
    p.add_argument("--config", default="default", choices=["default", "tiny"],
                   help="model size preset (tiny = test/debug scale)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.cli.common import (
        float_to_image,
        maybe_load,
        save_image,
        setup_device,
    )

    setup_device(args.device, args)

    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import (
        DiscriminatorConfig,
        VAEConfig,
    )
    from ldm_image_generator_tpu.data import BatchLoader, ImageDataset
    from ldm_image_generator_tpu.models import (
        Decoder,
        Discriminator,
        Encoder,
        VectorQuantizer,
    )
    from ldm_image_generator_tpu.parallel import batch_sharding, make_mesh
    from ldm_image_generator_tpu.train import (
        VAETrainState,
        make_optimizer,
        make_vae_train_step,
    )
    from ldm_image_generator_tpu.utils import torch_import as ti
    from ldm_image_generator_tpu.utils.checkpoint import save_params
    from ldm_image_generator_tpu.utils.debug import (
        GracefulShutdown,
        assert_finite_metrics,
    )
    from ldm_image_generator_tpu.utils.metrics import MetricLogger

    cfg = VAEConfig()
    dcfg = DiscriminatorConfig()
    if args.config == "tiny":
        cfg = cfg.tiny()
        dcfg = DiscriminatorConfig(channels=(8, 8), stages=(1, 1))
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    enc, dec = Encoder(cfg, dtype=dtype), Decoder(cfg, dtype=dtype)
    q = VectorQuantizer(cfg.num_embeddings, cfg.embedding_dim)
    disc = Discriminator(dcfg, dtype=dtype)

    ds = ImageDataset([args.dataset_path], size=args.size, max_len=args.maxdata)
    print(f"dataset: {len(ds)} images at {args.size}px")

    key = jax.random.PRNGKey(0)
    crop = 192 if args.size >= 192 else args.size
    img0 = jnp.zeros((1, crop, crop, 3))
    z0 = jnp.zeros((1, crop // cfg.downscale, crop // cfg.downscale,
                    cfg.latent_channels))
    enc_p = enc.init(key, img0)
    dec_p = dec.init(key, z0)
    q_p = q.init(key, z0.reshape(1, -1, cfg.latent_channels))
    disc_p = disc.init(key, img0)

    enc_p = maybe_load(args.encpath, enc_p,
                       lambda sd: ti.convert_encoder(sd, cfg)) or enc_p
    dec_p = maybe_load(args.decpath, dec_p,
                       lambda sd: ti.convert_decoder(sd, cfg)) or dec_p
    q_p = maybe_load(args.quantizerpath, q_p, ti.convert_quantizer) or q_p
    disc_p = maybe_load(args.discpath, disc_p,
                        lambda sd: ti.convert_discriminator(sd, dcfg)) or disc_p

    vae_params = {
        "encoder": enc_p["params"],
        "decoder": dec_p["params"],
        "quantizer": q_p["params"],
    }
    tx_vae = make_optimizer("adafactor")
    tx_d = make_optimizer("adafactor")
    state = VAETrainState(
        vae_params=vae_params,
        disc_params=disc_p["params"],
        opt_state_vae=tx_vae.init(vae_params),
        opt_state_disc=tx_d.init(disc_p["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    ckpt = None
    if args.ckpt_dir:
        from ldm_image_generator_tpu.utils.checkpoint import TrainCheckpointer

        ckpt = TrainCheckpointer(args.ckpt_dir)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"Resumed from step {int(state.step)}")

    step_fn = jax.jit(
        make_vae_train_step(enc, dec, q, disc, tx_vae, tx_d,
                            weight_recon=args.recon, crop_size=crop),
        donate_argnums=(0,),
    )

    n_dev = len(jax.devices())
    sharding = None
    if n_dev > 1 and args.batch % n_dev == 0:
        mesh = make_mesh(n_dev)
        sharding = batch_sharding(mesh, 4)
        print(f"data-parallel over {n_dev} devices")

    loader = BatchLoader(ds, args.batch, sharding=sharding,
                         device_cast=True)
    logger = MetricLogger(log_every=10)
    os.makedirs(args.result, exist_ok=True)

    def save_all():
        save_params(args.encpath, {"params": state.vae_params["encoder"]})
        save_params(args.decpath, {"params": state.vae_params["decoder"]})
        save_params(args.quantizerpath, {"params": state.vae_params["quantizer"]})
        save_params(args.discpath, {"params": state.disc_params})
        if ckpt is not None:
            ckpt.save(int(state.step), state)

    shutdown = GracefulShutdown()
    try:
        gstep = int(state.step)
        for epoch in range(args.epoch):
            print(f"Epoch #{epoch}")
            for batch_idx, images in enumerate(loader):
                state, metrics, (recon, cropped) = step_fn(
                    state, jnp.asarray(images), jax.random.fold_in(key, gstep)
                )
                gstep += 1
                logger.log(gstep, metrics, batch_size=args.batch)
                if gstep % 50 == 0:
                    assert_finite_metrics(
                        {k: v for k, v in metrics.items()}, gstep)
                if shutdown.requested:
                    print("SIGTERM received — saving and exiting")
                    raise KeyboardInterrupt
                if batch_idx % args.save_every == 0:
                    save_all()
                    y = np.asarray(jax.device_get(recon[0]))
                    save_image(
                        float_to_image(y),
                        os.path.join(args.result, f"{batch_idx}_reconstructed.jpg"),
                    )
                    # the exact crop the reconstruction was computed from
                    # (reference saves the actual cropped tensor,
                    # train_vae.py:139-149)
                    save_image(
                        float_to_image(np.asarray(jax.device_get(cropped[0]))),
                        os.path.join(args.result, f"{batch_idx}_input.jpg"),
                    )
    except KeyboardInterrupt:
        print("interrupted — saving")
    finally:
        save_all()
        if ckpt is not None:
            ckpt.close()


if __name__ == "__main__":
    main()
