"""Jitted training steps: VAE+GAN and latent/pixel diffusion.

Loss recipes follow the reference trainers exactly:
  * VAE step (train_vae.py:104-127): random 192px crop of the batch (one
    crop offset per batch, like torchvision RandomCrop on a batched
    tensor), loss = 10*L1_recon + 1.0*VQ_reg + 0.1*hinge_G where
    hinge_G = relu(-D(y)); then the discriminator hinge
    relu(1+D(y_detached)) + relu(1-D(x)) on the same crop, mirroring the
    reference's sequential two-optimizer step.
  * LDM/DDPM step (train_ldm.py:76-86): eps-prediction L1 via
    ddpm_loss; gradient accumulation is optax.MultiSteps (the reference's
    `batch % bm` gating double-counts the first window — fixed, not
    ported; divergence documented in SURVEY.md §2 #16).

TPU notes: params fp32, compute bf16 (no GradScaler needed — bf16 has
fp32-range exponents, unlike fp16 CUDA autocast, train_vae.py:96);
everything is one jit with donated state; batch axis sharded over 'data'
when a mesh is active (gradient psum inserted by XLA).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ldm_image_generator_tpu.diffusion import DiffusionSchedule, ddpm_loss


class VAETrainState(struct.PyTreeNode):
    vae_params: Any      # {'encoder':…, 'decoder':…, 'quantizer':…}
    disc_params: Any
    opt_state_vae: Any
    opt_state_disc: Any
    step: jnp.ndarray


class LDMTrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params for sampling (standard
    # diffusion practice, additive to the reference which samples raw
    # weights). None = EMA disabled; pytree structure then matches
    # pre-EMA checkpoints.
    ema_params: Any = None


def init_ema(params: Any) -> Any:
    """A deep copy of params to seed the EMA. A copy, not the same tree:
    aliasing the same buffers in both state fields breaks buffer donation
    (`donate_argnums`) — the runtime rejects donating one buffer twice."""
    return jax.tree.map(jnp.copy, params)


def random_crop_batch(images: jnp.ndarray, crop: int, key: jax.Array) -> jnp.ndarray:
    """One random crop offset applied to the whole batch (torchvision
    RandomCrop on a batched tensor picks a single offset,
    train_vae.py:57,109)."""
    b, h, w, c = images.shape
    ky, kx = jax.random.split(key)
    top = jax.random.randint(ky, (), 0, h - crop + 1)
    left = jax.random.randint(kx, (), 0, w - crop + 1)
    return jax.lax.dynamic_slice(images, (0, top, left, 0), (b, crop, crop, c))


def make_vae_train_step(
    encoder,
    decoder,
    quantizer,
    discriminator,
    tx_vae: optax.GradientTransformation,
    tx_disc: optax.GradientTransformation,
    weight_recon: float = 10.0,
    weight_reg: float = 1.0,
    weight_adv: float = 0.1,
    crop_size: int = 192,
    noise_gain: float = 0.1,
) -> Callable:
    """Returns step(state, images, key) -> (state, metrics,
    (recon_images, cropped_inputs)).

    The cropped inputs are returned so debug dumps can save the exact
    tensor the reconstruction corresponds to (the reference saves the
    actual cropped input, train_vae.py:139-149 — a fixed top-left crop
    would not match the random crop used in the step)."""

    def step(state: VAETrainState, images: jnp.ndarray, key: jax.Array):
        # fp32 entry cast ON DEVICE: BatchLoader(device_cast=True) ships
        # the fp16 cache as-is (half the H2D bytes + host work); the
        # cast here is lossless — the cached values are fp16-quantized
        # either way — and a no-op for fp32 batches
        images = images.astype(jnp.float32)
        k_crop, k_noise = jax.random.split(key)
        if crop_size and crop_size < images.shape[1]:
            images = random_crop_batch(images, crop_size, k_crop)

        def vae_loss_fn(vp):
            z = encoder.apply({"params": vp["encoder"]}, images)
            z = z + jax.random.normal(k_noise, z.shape, dtype=z.dtype) * noise_gain
            b, h, w, d = z.shape
            reg = quantizer.apply(
                {"params": vp["quantizer"]}, z.reshape(b, h * w, d)
            )
            y = decoder.apply({"params": vp["decoder"]}, z)
            recon = jnp.mean(
                jnp.abs(images.astype(jnp.float32) - y.astype(jnp.float32))
            )
            logit_fake = discriminator.apply({"params": state.disc_params}, y)
            adv = jax.nn.relu(-logit_fake)  # hinge G loss (train_vae.py:113)
            loss = weight_recon * recon + weight_reg * reg + weight_adv * adv
            return loss, (recon, reg, adv, y)

        (loss, (recon, reg, adv, y)), grads = jax.value_and_grad(
            vae_loss_fn, has_aux=True
        )(state.vae_params)
        updates, new_opt_vae = tx_vae.update(
            grads, state.opt_state_vae, state.vae_params
        )
        new_vae_params = optax.apply_updates(state.vae_params, updates)

        y_detached = jax.lax.stop_gradient(y)

        def disc_loss_fn(dp):
            logit_fake = discriminator.apply({"params": dp}, y_detached)
            logit_real = discriminator.apply({"params": dp}, images)
            # hinge D loss (train_vae.py:121-126)
            return jax.nn.relu(1.0 + logit_fake) + jax.nn.relu(1.0 - logit_real)

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)
        d_updates, new_opt_disc = tx_disc.update(
            d_grads, state.opt_state_disc, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        new_state = state.replace(
            vae_params=new_vae_params,
            disc_params=new_disc_params,
            opt_state_vae=new_opt_vae,
            opt_state_disc=new_opt_disc,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "recon": recon,
            "reg": reg,
            "adv": adv,
            "d_loss": d_loss,
        }
        return new_state, metrics, (y_detached, images)

    return step


def make_ldm_train_step(
    unet,
    schedule: DiffusionSchedule,
    tx: optax.GradientTransformation,
    loss: str = "l1",
    stochastic_depth: bool = True,
    prediction: str = "eps",
    ema_decay: "float | None" = None,
    num_classes: int = 0,
    cond_drop: float = 0.1,
    apply_fn: "Callable | None" = None,
    min_snr_gamma: "float | None" = None,
) -> Callable:
    """Returns step(state, latents, key, labels=None) -> (state, metrics).

    apply_fn: optional replacement for unet.apply with signature
    (params, x_t, t, cond, deterministic, rngs) -> eps — used by the
    pipeline-parallel mode (parallel/pipelined_unet.pipelined_unet_apply
    partial) to run the forward through the GPipe schedule while the
    loss/optimizer/EMA plumbing stays identical.

    Works for both latent diffusion (train_ldm.py) and pixel-space DDPM
    (train_ddpm.py) — the input is whatever space the UNet denoises.

    ema_decay: when set (and state.ema_params is not None), maintains an
    EMA of params with warmup `min(decay, (1+step)/(10+step))` so early
    steps aren't dominated by the random init. Free on TPU: the EMA
    update fuses into the same jitted step (pure VPU elementwise, no
    extra HBM round-trips beyond the EMA tree itself).

    num_classes > 0 + labels: class-conditional training — each label is
    replaced by the null class (index num_classes) with probability
    cond_drop, so the model learns the unconditional branch that
    classifier-free guidance samples against (Ho & Salimans 2022,
    arXiv:2207.12598). The RNG stream for the unconditional case is
    untouched (the drop key is derived only when labels are given).

    min_snr_gamma: Min-SNR loss weighting (arXiv:2303.09556, see
    diffusion.ddpm_loss) — None keeps the reference's uniform weighting.
    """

    def step(state: LDMTrainState, x: jnp.ndarray, key: jax.Array,
             labels=None):
        # fp32 entry cast on device (see make_vae_train_step): keeps the
        # loss noise draw and targets fp32 when the loader ships fp16
        x = x.astype(jnp.float32)
        cond = None
        if labels is not None and num_classes > 0:
            k_drop = jax.random.fold_in(key, 0x5EED)
            drop = jax.random.uniform(k_drop, labels.shape) < cond_drop
            cond = jnp.where(drop, num_classes, labels).astype(jnp.int32)

        def loss_fn(params):
            def denoise(x_t, t, k):
                k_moe, k_sd = jax.random.split(k)
                rngs = {"moe": k_moe, "sd": k_sd}
                if apply_fn is not None:
                    return apply_fn(
                        params, x_t, t, cond,
                        not stochastic_depth, rngs,
                    ).astype(jnp.float32)
                return unet.apply(
                    params,
                    x_t,
                    t,
                    cond,
                    deterministic=not stochastic_depth,
                    rngs=rngs,
                ).astype(jnp.float32)

            return ddpm_loss(denoise, schedule, x, key, loss=loss,
                             prediction=prediction,
                             min_snr_gamma=min_snr_gamma)

        loss_val, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and new_ema is not None:
            step_f = state.step.astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + step_f) / (10.0 + step_f))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params,
            )
        new_state = state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1,
            ema_params=new_ema,
        )
        return new_state, {"loss": loss_val}

    return step


def make_lr_schedule(learning_rate: float, schedule: str = "constant",
                     warmup_steps: int = 0, total_steps: int = 0):
    """LR schedule factory (training-stability controls, round-5: the
    reference's constant AdamW at lr=1e-4, /root/reference/train_ldm.py:67,
    diverges at production horizons — raw-weight KID rose 1.58 -> 8.13
    over 4000 steps in quality/metrics.jsonl while the loss kept
    falling). Returns a float (constant, no warmup) or an optax schedule.

    schedule: 'constant' or 'cosine' (cosine decays to 10% of peak over
    total_steps, the standard diffusion recipe). warmup_steps > 0
    prepends a linear 0 -> lr ramp (protects the early steps where Adam's
    second-moment estimates are noise)."""
    if schedule == "constant":
        if warmup_steps <= 0:
            return learning_rate
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    if schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule needs total_steps > 0")
        if warmup_steps >= total_steps:
            # optax counts decay_steps from step 0 INCLUDING warmup
            raise ValueError(
                f"warmup_steps {warmup_steps} must be < total_steps "
                f"{total_steps} (decay_steps includes the warmup)"
            )
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=total_steps, end_value=0.1 * learning_rate,
        )
    raise ValueError(f"unknown lr schedule {schedule!r}")


def make_optimizer(name: str, learning_rate: float = 1e-4,
                   accumulate: int = 1, grad_clip: float = 0.0,
                   lr_schedule: str = "constant", warmup_steps: int = 0,
                   total_steps: int = 0) -> optax.GradientTransformation:
    """Optimizers used by the reference trainers:
    adafactor (train_vae.py:95-97), adamw (train_ldm.py:67),
    radam (train_ddpm.py:27). accumulate>1 wraps in MultiSteps
    (correct version of train_ldm.py's -bm gating).

    grad_clip > 0 prepends optax.clip_by_global_norm and
    lr_schedule/warmup_steps/total_steps select make_lr_schedule —
    both default OFF (exact reference recipe); see make_lr_schedule for
    why production runs want them."""
    if name == "adafactor":
        # transformers.Adafactor default (train_vae.py:95-97) uses the
        # relative step size min(1e-2, 1/sqrt(step)); optax.adafactor with
        # learning_rate=None applies no step-size scaling at all, so supply
        # the same schedule explicitly.
        rel_step = lambda step: jnp.minimum(1e-2, jax.lax.rsqrt(step + 1.0))
        tx = optax.adafactor(learning_rate=rel_step)
    elif name == "adamw":
        lr = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                              total_steps)
        tx = optax.adamw(lr)
    elif name == "radam":
        lr = make_lr_schedule(learning_rate, lr_schedule, warmup_steps,
                              total_steps)
        tx = optax.radam(lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if grad_clip and grad_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx
