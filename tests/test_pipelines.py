"""Jitted sampling pipeline tests: shapes, dtype, determinism
(fixed PRNG key => bit-identical images, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.pipelines import DDPMPipeline, LDMPipeline, to_uint8


def _tiny_ldm():
    unet_cfg = UNetConfig(input_channels=8, stages=(1, 1), channels=(16, 32))
    vae_cfg = VAEConfig().tiny()
    return LDMPipeline(
        unet_cfg, vae_cfg, DDPMConfig(num_timesteps=50), dtype=jnp.float32
    )


def test_ldm_pipeline_shapes_and_determinism():
    pipe = _tiny_ldm()
    key = jax.random.PRNGKey(0)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up = pipe.unet.init(
        {"params": key, "moe": key}, z, jnp.zeros((1,), jnp.int32)
    )
    dp = pipe.decoder.init(key, z)

    img1 = pipe.sample(up, dp, jax.random.PRNGKey(3), batch=2,
                       image_size=16, num_steps=4)
    img2 = pipe.sample(up, dp, jax.random.PRNGKey(3), batch=2,
                       image_size=16, num_steps=4)
    assert img1.shape == (2, 16, 16, 3)
    assert img1.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))

    img3 = pipe.sample(up, dp, jax.random.PRNGKey(4), batch=2,
                       image_size=16, num_steps=4)
    assert not np.array_equal(np.asarray(img1), np.asarray(img3))


def test_ddpm_pipeline_pixel_space():
    cfg = UNetConfig(input_channels=3, stages=(1, 1), channels=(16, 32))
    pipe = DDPMPipeline(cfg, DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 3))
    params = pipe.unet.init(
        {"params": key, "moe": key}, x, jnp.zeros((1,), jnp.int32)
    )
    img = pipe.sample(params, jax.random.PRNGKey(0), batch=3,
                      image_size=8, num_steps=4)
    assert img.shape == (3, 8, 8, 3)
    assert img.dtype == jnp.uint8


def test_to_uint8_range():
    x = jnp.array([[-2.0, -1.0, 0.0, 1.0, 2.0]])
    out = np.asarray(to_uint8(x))
    np.testing.assert_array_equal(out, [[0, 0, 127, 255, 255]])


def test_ldm_pipeline_dpm_solver():
    pipe = _tiny_ldm()
    key = jax.random.PRNGKey(0)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up = pipe.unet.init({"params": key, "moe": key}, z,
                        jnp.zeros((1,), jnp.int32))
    dp = pipe.decoder.init(key, z)
    img = pipe.sample(up, dp, jax.random.PRNGKey(1), batch=2, image_size=16,
                      num_steps=5, sampler="dpm++2m")
    assert img.shape == (2, 16, 16, 3) and img.dtype == jnp.uint8
    ddim = pipe.sample(up, dp, jax.random.PRNGKey(1), batch=2, image_size=16,
                       num_steps=5, sampler="ddim")
    assert not np.array_equal(np.asarray(img), np.asarray(ddim))
