"""Train the latent diffusion UNet on frozen-VAE latents.

CLI surface mirrors the reference train_ldm.py:11-26; flow mirrors its
loop (train_ldm.py:63-92): encode the dataset once through the frozen VAE
encoder (here: batched + jitted, not per-image), AdamW, eps-prediction L1
loss, gradient accumulation via -bm (implemented correctly with
optax.MultiSteps — the reference's `batch % bm` gating double-applies the
first window), periodic checkpoint.
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    from ldm_image_generator_tpu.cli.common import add_device_arg, str2bool

    p = argparse.ArgumentParser(description="Train Latent Diffusion Model")
    p.add_argument("dataset_path", nargs="+")
    add_device_arg(p)
    p.add_argument("-e", "--epoch", default=1, type=int)
    p.add_argument("-b", "--batch", default=1, type=int)
    p.add_argument("-mp", "--modelpath", default="./ddpm.pt")
    p.add_argument("-ep", "--encpath", default="./vae_encoder.pt")
    p.add_argument("-fp16", default=False, type=str2bool)
    p.add_argument("-s", "--size", default=512, type=int)
    p.add_argument("-m", "--maxdata", default=-1, type=int)
    p.add_argument("-lr", "--learningrate", default=1e-4, type=float)
    p.add_argument("-bm", "--batch_multiply", default=1, type=int)
    p.add_argument("--save-every", default=300, type=int)
    p.add_argument("--fused-steps", default=1, type=int,
                   help="train steps per dispatch (a donated lax.scan "
                        "over N batches): amortizes per-call dispatch "
                        "latency; numerics identical to N single steps")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard optimizer state (Adam moments) "
                        "over the data axis on multi-device runs — 2x "
                        "fp32 moments become 2x/N per chip; numerics "
                        "unchanged (ignored on one device)")
    p.add_argument("--config", default="default",
                   choices=["default", "tiny", "tiny-deep"],
                   help="model size preset (tiny = test/debug scale; "
                        "tiny-deep = tiny with a pipelinable deep stack)")
    p.add_argument("--num-classes", default=0, type=int,
                   help="class-conditional training: each positional "
                        "dataset dir is one class (-1 = one class per "
                        "dir); 0 = unconditional (reference behavior)")
    p.add_argument("--min-snr-gamma", default=0.0, type=float,
                   help="Min-SNR loss weighting gamma (arXiv:2303.09556)"
                        ": down-weights low-noise timesteps for faster "
                        "convergence (typical 5.0; 0 = reference's "
                        "uniform weighting)")
    p.add_argument("--cond-drop", default=0.1, type=float,
                   help="probability of training on the null class "
                        "(the CFG unconditional branch)")
    p.add_argument("--pipeline-stages", default=0, type=int,
                   help="GPipe pipeline parallelism: shard the UNet's "
                        "deep homogeneous stacks over this many mesh "
                        "stages (devices = stages * data shards); 0 = "
                        "off (pure data parallel)")
    p.add_argument("--pipeline-microbatches", default=0, type=int,
                   help="microbatches per pipelined step (default: "
                        "= --pipeline-stages)")
    from ldm_image_generator_tpu.cli.common import add_diffusion_args

    add_diffusion_args(p, train=True)
    return p


def main(argv=None):
    import functools
    args = build_parser().parse_args(argv)
    if args.fused_steps > 1 and args.pipeline_stages > 1:
        # scanning the GPipe shard_map schedule is untested on real
        # meshes — refuse rather than silently claim support
        raise SystemExit(
            "--fused-steps and --pipeline-stages cannot be combined"
        )
    from ldm_image_generator_tpu.cli.common import (
        ema_path,
        maybe_load,
        setup_device,
    )

    setup_device(args.device, args)

    import jax
    import jax.numpy as jnp

    from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
    from ldm_image_generator_tpu.data import BatchLoader, LatentImageDataset
    from ldm_image_generator_tpu.diffusion import make_schedule
    from ldm_image_generator_tpu.models import Encoder, UNet
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

    import dataclasses

    vcfg = VAEConfig()
    ucfg = UNetConfig()
    if args.config == "tiny":
        vcfg, ucfg = vcfg.tiny(), ucfg.tiny()
    elif args.config == "tiny-deep":
        vcfg, ucfg = vcfg.tiny(), ucfg.tiny_deep()
    num_classes = args.num_classes
    if num_classes == -1:
        num_classes = len(args.dataset_path)
    if num_classes > 0:
        if len(args.dataset_path) > num_classes:
            raise SystemExit(
                f"--num-classes {num_classes} < {len(args.dataset_path)} "
                "dataset dirs (labels are per source dir)"
            )
        ucfg = dataclasses.replace(ucfg, num_classes=num_classes)
        print(f"class-conditional: {num_classes} classes "
              f"(dir-per-class), cond-drop {args.cond_drop}")
    dtype = jnp.bfloat16 if args.fp16 else jnp.float32

    key = jax.random.PRNGKey(0)

    # frozen encoder for the one-time latent cache build
    enc = Encoder(vcfg, dtype=jnp.float32)
    img0 = jnp.zeros((1, args.size, args.size, 3))
    enc_p = enc.init(key, img0)
    enc_p = maybe_load(args.encpath, enc_p,
                       lambda sd: ti.convert_encoder(sd, vcfg)) or enc_p
    encode = jax.jit(lambda x: enc.apply(enc_p, x))

    ds = LatentImageDataset(
        args.dataset_path, size=args.size, max_len=args.maxdata,
        encode_fn=lambda x: encode(jnp.asarray(x)),
    )
    print(f"dataset: {len(ds)} latents "
          f"({args.size // vcfg.downscale}px, {vcfg.latent_channels}ch)")
    val_ds = None
    if args.val_dir:
        val_ds = LatentImageDataset(
            args.val_dir, size=args.size,
            encode_fn=lambda x: encode(jnp.asarray(x)),
        )
    del enc_p

    unet = UNet(ucfg, dtype=dtype)
    latent = args.size // vcfg.downscale
    z0 = jnp.zeros((1, latent, latent, ucfg.input_channels))
    params = unet.init({"params": key, "moe": key, "sd": key},
                       z0, jnp.zeros((1,), jnp.int32))
    params = maybe_load(args.modelpath, params,
                        lambda sd: ti.convert_ddpm(sd, ucfg)) or params

    schedule = make_schedule(DDPMConfig(prediction=args.prediction,
                                        zero_terminal_snr=args.zero_snr))
    tx = make_optimizer("adamw", args.learningrate,
                        accumulate=args.batch_multiply,
                        grad_clip=args.grad_clip,
                        lr_schedule=args.lr_schedule,
                        warmup_steps=args.warmup_steps,
                        total_steps=args.total_steps)
    if args.grad_clip > 0 or args.lr_schedule != "constant" \
            or args.warmup_steps > 0:
        print(f"stability: grad-clip {args.grad_clip or 'off'}, "
              f"lr-schedule {args.lr_schedule}"
              + (f" (warmup {args.warmup_steps})" if args.warmup_steps
                 else ""))
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

    n_dev = len(jax.devices())
    sharding = None
    apply_fn = None
    if args.pipeline_stages > 1:
        # ('stage', 'data') mesh: depth pipelined over 'stage', batch
        # sharded over 'data' (parallel/pipelined_unet.py)
        import numpy as np

        from ldm_image_generator_tpu.parallel.pipelined_unet import (
            pipelined_unet_apply,
        )

        s = args.pipeline_stages
        if n_dev % s != 0:
            raise SystemExit(
                f"--pipeline-stages {s} must divide device count {n_dev}"
            )
        mb = args.pipeline_microbatches or s
        if args.batch % mb:
            raise SystemExit(
                f"batch {args.batch} must split into {mb} microbatches"
            )
        # data-parallel width: the largest divisor of the available
        # devices-per-stage that also divides the per-microbatch batch
        dp = n_dev // s
        while dp > 1 and (args.batch // mb) % dp:
            dp -= 1
        pmesh = jax.sharding.Mesh(
            np.asarray(jax.devices()[: s * dp]).reshape(s, dp),
            ("stage", "data"),
        )

        def apply_fn(params, x_t, t, cond, det, rngs):
            return pipelined_unet_apply(
                ucfg, params, x_t, t, pmesh, cond=cond, rngs=rngs,
                deterministic=det, dtype=dtype, num_microbatches=mb,
            )

        print(f"pipeline-parallel: {s} stages x {dp} data shards, "
              f"{mb} microbatches")
    elif n_dev > 1 and args.batch % n_dev == 0:
        mesh = make_mesh(n_dev)
        sharding = batch_sharding(mesh, 4)
        print(f"data-parallel over {n_dev} devices")
        if args.zero1:
            # ZeRO-1: shard the Adam moments over the data axis
            # (parallel/mesh.py zero1_shardings) — GSPMD lowers the
            # update to reduce-scatter -> sharded update -> all-gather.
            # Params/EMA are pinned replicated so the mixed layout is
            # explicit rather than left to auto-placement.
            from ldm_image_generator_tpu.parallel import (
                replicated, shard_opt_state,
            )

            rep = replicated(mesh)
            put_rep = lambda t: jax.tree.map(
                lambda a: jax.device_put(a, rep), t)
            state = state.replace(
                params=put_rep(state.params),
                ema_params=(put_rep(state.ema_params)
                            if state.ema_params is not None else None),
                opt_state=shard_opt_state(state.opt_state, mesh),
            )
            print("ZeRO-1: optimizer state sharded over the data axis")

    if args.zero1 and sharding is None:
        print("--zero1 ignored: no data-parallel mesh engaged "
              "(single device, pipeline mode, or batch % devices != 0)")

    raw_step = make_ldm_train_step(
        unet, schedule, tx, prediction=args.prediction,
        ema_decay=args.ema if args.ema > 0 else None,
        num_classes=num_classes, cond_drop=args.cond_drop,
        apply_fn=apply_fn,
        min_snr_gamma=args.min_snr_gamma if args.min_snr_gamma > 0
        else None,
    )
    step_fn = jax.jit(raw_step, donate_argnums=(0,))

    n_fused = max(1, args.fused_steps)
    if n_fused > 1:
        # N train steps per dispatch as one lax.scan with donated state:
        # one dispatch + one metrics readback per N steps. Measured
        # honestly (b8 bf16, one TPU chip over this tunnel): on an IDLE
        # host the async unfused loop already pipelines — ~40 steps/s
        # unfused vs ~29 fused (the scan is no win, default stays 1).
        # Under host CPU contention (a concurrent test suite on this
        # single-core box) the unfused loop collapsed to ~7 steps/s —
        # per-step host work is what fusing amortizes; use it when the
        # input pipeline or co-located work competes for the host. Same
        # per-step math and fold_in keys as the unfused loop; weights
        # agree to float rounding (XLA fuses the scanned body in a
        # different order — tested ~1e-6 rel).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, batches, keys, labels=None):
            def body(s, xs):
                if labels is None:
                    x, k = xs
                    s, m = raw_step(s, x, k)
                else:
                    x, k, lb = xs
                    s, m = raw_step(s, x, k, lb)
                return s, m

            xs = (batches, keys) if labels is None else (
                batches, keys, labels)
            state, ms = jax.lax.scan(body, state, xs)
            # stacked [N] metric rows -> the last step's values, plus a
            # group max per metric: jnp.max propagates NaN/inf, so a
            # transient non-finite loss in steps 0..N-2 (invisible in
            # v[-1]) still reaches assert_finite_metrics and the JSONL
            # log, and spike magnitudes within the group stay observable
            out = {k: v[-1] for k, v in ms.items()}
            out.update({f"{k}_gmax": jnp.max(v) for k, v in ms.items()})
            return state, out

        print(f"fused-steps: {n_fused} train steps per dispatch")

    loader = BatchLoader(ds, args.batch, sharding=sharding,
                         with_labels=num_classes > 0, device_cast=True)
    logger = MetricLogger(log_every=10)

    validator = None
    if val_ds is not None:
        from ldm_image_generator_tpu.train import Validator

        validator = Validator(
            val_ds, unet, schedule, prediction=args.prediction,
            batch=args.batch, max_batches=args.val_batches,
        )
        print(f"validation: {len(val_ds)} latents, "
              f"every {args.val_every} steps")

    def save_all():
        save_params(args.modelpath, state.params)
        if state.ema_params is not None:
            save_params(ema_path(args.modelpath), state.ema_params)
        if ckpt is not None:
            ckpt.save(int(state.step), state)

    shutdown = GracefulShutdown()
    crossed = lambda prev, cur, every: prev // every != cur // every
    try:
        gstep = int(state.step)

        def unfused_one(state, item, gstep):
            latents, labels = (
                item if num_classes > 0 else (item, None)
            )
            return step_fn(
                state, jnp.asarray(latents),
                jax.random.fold_in(key, gstep), labels
            )

        for epoch in range(args.epoch):
            print(f"Epoch #{epoch}")
            buf = []
            batch_idx = -1
            for batch_idx, item in enumerate(loader):
                buf.append(item)
                if len(buf) < n_fused:
                    continue
                group, buf = buf, []
                prev = gstep
                if n_fused == 1:
                    state, metrics = unfused_one(state, group[0], gstep)
                else:
                    if num_classes > 0:
                        lat = jnp.stack([jnp.asarray(g[0]) for g in group])
                        lbs = jnp.stack([jnp.asarray(g[1]) for g in group])
                    else:
                        lat = jnp.stack([jnp.asarray(g) for g in group])
                        lbs = None
                    keys = jnp.stack([jax.random.fold_in(key, gstep + i)
                                      for i in range(n_fused)])
                    state, metrics = fused_step(state, lat, keys, lbs)
                gstep += n_fused
                logger.log(gstep, metrics, batch_size=args.batch)
                if validator is not None and crossed(prev, gstep,
                                                     args.val_every):
                    logger.log_now(gstep, validator.run(state))
                if crossed(prev, gstep, 50):
                    assert_finite_metrics(
                        {k: v for k, v in metrics.items()}, gstep)
                if shutdown.requested:
                    print("SIGTERM received — saving and exiting")
                    raise KeyboardInterrupt
                if crossed(batch_idx - n_fused, batch_idx, args.save_every):
                    save_all()
                    print("Model is saved!")
            # Epoch end: flush the trailing len(loader) % n_fused batches
            # through the unfused step. Silently dropping them skewed
            # step counts vs unfused runs, and an epoch shorter than
            # --fused-steps would otherwise train zero steps.
            if buf and n_fused > 1:
                if batch_idx + 1 < n_fused:
                    print(f"warning: epoch yielded {batch_idx + 1} "
                          f"batches < --fused-steps {n_fused}; "
                          "running them unfused")
                for item in buf:
                    prev = gstep
                    state, metrics = unfused_one(state, item, gstep)
                    gstep += 1
                    logger.log(gstep, metrics, batch_size=args.batch)
                    if validator is not None and crossed(prev, gstep,
                                                         args.val_every):
                        logger.log_now(gstep, validator.run(state))
                    if crossed(prev, gstep, 50):
                        assert_finite_metrics(dict(metrics), gstep)
                    if shutdown.requested:
                        print("SIGTERM received — saving and exiting")
                        raise KeyboardInterrupt
    except KeyboardInterrupt:
        print("interrupted — saving")
    finally:
        save_all()
        if ckpt is not None:
            ckpt.close()


if __name__ == "__main__":
    main()
