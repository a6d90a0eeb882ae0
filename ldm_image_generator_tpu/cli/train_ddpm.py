"""Train a pixel-space DDPM (reference train_ddpm.py).

The reference script has no argparse — batch 16 / 3000 epochs / lr 1e-4 /
size 32 / 1000 images are hardcoded (train_ddpm.py:9-15) and it crashes
with the default 8-channel UNet on 3-channel images (SURVEY.md §3.4).
Here the same values are argparse *defaults*, the UNet is built with
input_channels=3, and the optimizer is RAdam (train_ddpm.py:27).
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    from ldm_image_generator_tpu.cli.common import add_device_arg, str2bool

    p = argparse.ArgumentParser(description="Train pixel-space DDPM")
    p.add_argument("dataset_path", nargs="+")
    add_device_arg(p)
    p.add_argument("-e", "--epoch", default=3000, type=int)
    p.add_argument("-b", "--batch", default=16, type=int)
    p.add_argument("-mp", "--modelpath", default="./ddpm.pt")
    p.add_argument("-fp16", default=True, type=str2bool)
    p.add_argument("-s", "--size", default=32, type=int)
    p.add_argument("-m", "--maxdata", default=1000, type=int)
    p.add_argument("-lr", "--learningrate", default=1e-4, type=float)
    p.add_argument("--save-every", default=300, type=int)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--min-snr-gamma", default=0.0, type=float,
                   help="Min-SNR loss weighting gamma (arXiv:2303.09556)"
                        ": down-weights low-noise timesteps for faster "
                        "convergence (typical 5.0; 0 = reference's "
                        "uniform weighting)")
    p.add_argument("--config", default="default", choices=["default", "tiny"],
                   help="model size preset (tiny = test/debug scale)")
    from ldm_image_generator_tpu.cli.common import add_diffusion_args

    add_diffusion_args(p, train=True)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ldm_image_generator_tpu.cli.common import (
        ema_path,
        maybe_load,
        setup_device,
    )

    setup_device(args.device, args)

    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
    from ldm_image_generator_tpu.data import BatchLoader, ImageDataset
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import UNet
    from ldm_image_generator_tpu.parallel import batch_sharding, make_mesh
    from ldm_image_generator_tpu.train import (
        LDMTrainState,
        init_ema,
        make_ldm_train_step,
        make_optimizer,
    )
    from ldm_image_generator_tpu.utils import torch_import as ti
    from ldm_image_generator_tpu.utils.checkpoint import save_params
    from ldm_image_generator_tpu.utils.debug import (
        GracefulShutdown,
        assert_finite_metrics,
    )
    from ldm_image_generator_tpu.utils.metrics import MetricLogger

    ucfg = UNetConfig(input_channels=3)
    if args.config == "tiny":
        ucfg = ucfg.tiny()
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32

    ds = ImageDataset(args.dataset_path, size=args.size, max_len=args.maxdata)
    print(f"dataset: {len(ds)} images at {args.size}px")

    key = jax.random.PRNGKey(0)
    unet = UNet(ucfg, dtype=dtype)
    x0 = jnp.zeros((1, args.size, args.size, 3))
    params = unet.init({"params": key, "moe": key, "sd": key},
                       x0, jnp.zeros((1,), jnp.int32))
    params = maybe_load(args.modelpath, params,
                        lambda sd: ti.convert_ddpm(sd, ucfg)) or params

    schedule = make_schedule(DDPMConfig(prediction=args.prediction,
                                        zero_terminal_snr=args.zero_snr))
    tx = make_optimizer("radam", args.learningrate,
                        grad_clip=args.grad_clip,
                        lr_schedule=args.lr_schedule,
                        warmup_steps=args.warmup_steps,
                        total_steps=args.total_steps)
    state = LDMTrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        ema_params=init_ema(params) if args.ema > 0 else None,
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
        make_ldm_train_step(
            unet, schedule, tx, prediction=args.prediction,
            ema_decay=args.ema if args.ema > 0 else None,
            min_snr_gamma=args.min_snr_gamma if args.min_snr_gamma > 0
            else None,
        ),
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

    validator = None
    if args.val_dir:
        from ldm_image_generator_tpu.train import Validator

        val_ds = ImageDataset(args.val_dir, size=args.size)
        validator = Validator(
            val_ds, unet, schedule, prediction=args.prediction,
            batch=args.batch, max_batches=args.val_batches,
        )
        print(f"validation: {len(val_ds)} images, "
              f"every {args.val_every} steps")

    def save_all():
        save_params(args.modelpath, state.params)
        if state.ema_params is not None:
            save_params(ema_path(args.modelpath), state.ema_params)
        if ckpt is not None:
            ckpt.save(int(state.step), state)

    shutdown = GracefulShutdown()
    try:
        gstep = int(state.step)
        for epoch in range(args.epoch):
            print(f"Epoch #{epoch}")
            for batch_idx, images in enumerate(loader):
                state, metrics = step_fn(
                    state, jnp.asarray(images), jax.random.fold_in(key, gstep)
                )
                gstep += 1
                logger.log(gstep, metrics, batch_size=args.batch)
                if validator is not None and gstep % args.val_every == 0:
                    logger.log_now(gstep, validator.run(state))
                if gstep % 50 == 0:
                    assert_finite_metrics(
                        {k: v for k, v in metrics.items()}, gstep)
                if shutdown.requested:
                    print("SIGTERM received — saving and exiting")
                    raise KeyboardInterrupt
                if batch_idx % args.save_every == 0:
                    save_all()
    except KeyboardInterrupt:
        print("interrupted — saving")
    finally:
        save_all()
        if ckpt is not None:
            ckpt.close()


if __name__ == "__main__":
    main()
