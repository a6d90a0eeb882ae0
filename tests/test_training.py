"""Tiny-config integration tests: a few train steps must reduce the loss
(SURVEY.md §4 integration tier)."""
import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import (
    DDPMConfig,
    DiscriminatorConfig,
    UNetConfig,
    VAEConfig,
)
from ldm_image_generator_tpu.diffusion import make_schedule
from ldm_image_generator_tpu.models import (
    Decoder,
    Discriminator,
    Encoder,
    UNet,
    VectorQuantizer,
)
from ldm_image_generator_tpu.train import (
    LDMTrainState,
    VAETrainState,
    make_ldm_train_step,
    make_optimizer,
    make_vae_train_step,
)


def test_vae_train_step_decreases_loss():
    cfg = VAEConfig().tiny()
    dcfg = DiscriminatorConfig(channels=(8, 8), stages=(1, 1))
    enc, dec = Encoder(cfg), Decoder(cfg)
    q = VectorQuantizer(cfg.num_embeddings, cfg.embedding_dim)
    disc = Discriminator(dcfg)

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (2, 16, 16, 3), minval=-1, maxval=1)
    vp = {
        "encoder": enc.init(key, img)["params"],
        "decoder": dec.init(key, jnp.zeros((2, 8, 8, 8)))["params"],
        "quantizer": q.init(key, jnp.zeros((2, 64, 8)))["params"],
    }
    dp = disc.init(key, img)["params"]
    tx_vae = make_optimizer("adafactor")
    tx_d = make_optimizer("adafactor")
    state = VAETrainState(
        vae_params=vp,
        disc_params=dp,
        opt_state_vae=tx_vae.init(vp),
        opt_state_disc=tx_d.init(dp),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(
        make_vae_train_step(enc, dec, q, disc, tx_vae, tx_d, crop_size=0)
    )
    losses = []
    for i in range(10):
        state, metrics, (recon, cropped) = step(state, img, jax.random.PRNGKey(i))
        losses.append(float(metrics["recon"]))
    assert losses[-1] < losses[0], losses
    assert recon.shape == img.shape
    # with crop_size=0 the "cropped" input is the input itself
    np.testing.assert_array_equal(np.asarray(cropped), np.asarray(img))


def test_vae_train_step_returns_matching_crop():
    """The returned input is the exact random crop the recon was computed
    from (round-2 verdict: a top-left crop dump doesn't correspond)."""
    cfg = VAEConfig().tiny()
    dcfg = DiscriminatorConfig(channels=(8, 8), stages=(1, 1))
    enc, dec = Encoder(cfg), Decoder(cfg)
    q = VectorQuantizer(cfg.num_embeddings, cfg.embedding_dim)
    disc = Discriminator(dcfg)
    key = jax.random.PRNGKey(0)
    crop = 16
    img = jax.random.uniform(key, (1, 32, 32, 3), minval=-1, maxval=1)
    small = jnp.zeros((1, crop, crop, 3))
    vp = {
        "encoder": enc.init(key, small)["params"],
        "decoder": dec.init(key, jnp.zeros((1, 8, 8, 8)))["params"],
        "quantizer": q.init(key, jnp.zeros((1, 64, 8)))["params"],
    }
    dp = disc.init(key, small)["params"]
    tx_vae, tx_d = make_optimizer("adafactor"), make_optimizer("adafactor")
    state = VAETrainState(
        vae_params=vp, disc_params=dp, opt_state_vae=tx_vae.init(vp),
        opt_state_disc=tx_d.init(dp), step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(
        make_vae_train_step(enc, dec, q, disc, tx_vae, tx_d, crop_size=crop)
    )
    _, _, (recon, cropped) = step(state, img, jax.random.PRNGKey(3))
    assert recon.shape == (1, crop, crop, 3)
    assert cropped.shape == (1, crop, crop, 3)
    # the returned crop is a contiguous window of the input image
    full = np.asarray(img[0])
    got = np.asarray(cropped[0])
    found = any(
        np.array_equal(full[i:i + crop, j:j + crop], got)
        for i in range(full.shape[0] - crop + 1)
        for j in range(full.shape[1] - crop + 1)
    )
    assert found, "returned crop is not a window of the input batch"


def test_ldm_train_step_decreases_loss():
    cfg = UNetConfig(input_channels=4, stages=(1, 1), channels=(16, 32))
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, 4))
    t = jnp.zeros((4,), jnp.int32)
    params = unet.init({"params": key, "moe": key, "sd": key}, x, t)
    tx = make_optimizer("adamw", 1e-3)
    state = LDMTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    step = jax.jit(make_ldm_train_step(unet, schedule, tx))
    losses = []
    for i in range(15):
        state, metrics = step(state, x, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_grad_accumulation_multisteps():
    """MultiSteps applies an update every k micro-steps (the corrected
    version of the reference's -bm gating, train_ldm.py:76-86)."""
    cfg = UNetConfig(input_channels=2, stages=(1,), channels=(16,))
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=50))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4, 2))
    params = unet.init(
        {"params": key, "moe": key, "sd": key}, x, jnp.zeros((2,), jnp.int32)
    )
    tx = make_optimizer("adamw", 1e-3, accumulate=2)
    state = LDMTrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    step = jax.jit(make_ldm_train_step(unet, schedule, tx))

    def flat(p):
        return np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(p)])

    p0 = flat(state.params)
    state, _ = step(state, x, jax.random.PRNGKey(1))
    p1 = flat(state.params)
    np.testing.assert_array_equal(p0, p1)  # first micro-step only buffers
    state, _ = step(state, x, jax.random.PRNGKey(2))
    p2 = flat(state.params)
    assert not np.allclose(p1, p2)  # second micro-step applies the update


def test_remat_training_matches_no_remat():
    """cfg.remat changes memory behavior, not numerics."""
    import dataclasses

    base = UNetConfig(input_channels=2, stages=(1, 1), channels=(16, 32),
                      stochastic_depth=0.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 2))
    t = jnp.zeros((2,), jnp.int32)
    schedule = make_schedule(DDPMConfig(num_timesteps=50))

    losses = {}
    grads = {}
    for name, cfg in [("plain", base),
                      ("remat", dataclasses.replace(base, remat=True))]:
        unet = UNet(cfg)
        params = unet.init({"params": key, "moe": key, "sd": key}, x, t)

        def loss_fn(p):
            def denoise(xt, tt, k):
                return unet.apply(p, xt, tt, deterministic=True,
                                  rngs={"moe": jax.random.PRNGKey(9)})

            from ldm_image_generator_tpu.diffusion import ddpm_loss

            return ddpm_loss(denoise, schedule, x, jax.random.PRNGKey(1))

        losses[name], grads[name] = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(losses["plain"]), float(losses["remat"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads["plain"]),
                    jax.tree.leaves(grads["remat"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_clip_bounds_update_norm():
    """make_optimizer(grad_clip=...) must cap the global gradient norm
    entering AdamW: a gradient scaled 1000x must produce the same first
    update as the clipped original (both hit the clip ceiling)."""
    import optax

    from ldm_image_generator_tpu.train import make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    g = {"w": jnp.full((4, 4), 3.0), "b": jnp.full((4,), -2.0)}
    g_big = jax.tree.map(lambda a: a * 1000.0, g)

    tx = make_optimizer("adamw", 1e-3, grad_clip=0.1)
    u1, _ = tx.update(g, tx.init(params), params)
    u2, _ = tx.update(g_big, tx.init(params), params)
    for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    # tiny gradients (norm below the ceiling) are untouched by the clip
    g_small = jax.tree.map(lambda a: a * 1e-6, g)
    tx_noclip = make_optimizer("adamw", 1e-3)
    ua, _ = tx.update(g_small, tx.init(params), params)
    ub, _ = tx_noclip.update(g_small, tx_noclip.init(params), params)
    for a, b in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-9)


def test_lr_schedules():
    """make_lr_schedule: cosine warms 0 -> peak over warmup_steps then
    decays to 10% of peak at total_steps; constant+warmup ramps then
    holds; bare constant returns the float unchanged."""
    from ldm_image_generator_tpu.train import make_lr_schedule

    peak, warm, total = 1e-4, 100, 1000
    cos = make_lr_schedule(peak, "cosine", warm, total)
    assert float(cos(0)) < 1e-6
    np.testing.assert_allclose(float(cos(warm)), peak, rtol=1e-6)
    np.testing.assert_allclose(float(cos(total)), 0.1 * peak, rtol=1e-3)
    # monotone decay after warmup
    vals = [float(cos(s)) for s in range(warm, total, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))

    cw = make_lr_schedule(peak, "constant", warmup_steps=warm)
    assert float(cw(0)) < 1e-6
    np.testing.assert_allclose(float(cw(warm)), peak, rtol=1e-6)
    np.testing.assert_allclose(float(cw(10 * total)), peak, rtol=1e-6)

    assert make_lr_schedule(peak, "constant") == peak

    import pytest

    with pytest.raises(ValueError):
        make_lr_schedule(peak, "cosine", warm, 0)
    with pytest.raises(ValueError):
        make_lr_schedule(peak, "nope")
