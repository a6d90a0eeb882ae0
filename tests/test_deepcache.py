"""DeepCache-style deep-feature reuse (models/unet.py deep/with_deep +
diffusion/ddpm.py ddim_sample deep_cache + LDMPipeline cache_interval).

The invariant that makes the approximation well-defined: reusing the
deep output OF THE SAME INPUT must reproduce the full forward exactly —
then the only approximation during sampling is temporal staleness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.config import (
    DDPMConfig, UNetConfig, VAEConfig,
)
from ldm_image_generator_tpu.models import UNet
from ldm_image_generator_tpu.pipelines import LDMPipeline


def _unet_and_params(cfg):
    unet = UNet(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, cfg.input_channels))
    t = jnp.zeros((1,), jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t)
    return unet, params


def test_deep_reuse_of_same_input_is_exact():
    cfg = UNetConfig().tiny()
    unet, params = _unet_and_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 8, 8, cfg.input_channels))
    t = jnp.full((1,), 37, jnp.int32)
    rngs = {"moe": jax.random.PRNGKey(2)}

    out_full, deep = unet.apply(params, x, t, deterministic=True,
                                rngs=rngs, with_deep=True)
    assert deep.shape == (2, 8, 8, cfg.channels[0])
    out_reuse = unet.apply(params, x, t, deterministic=True, rngs=rngs,
                           deep=deep)
    np.testing.assert_array_equal(np.asarray(out_full),
                                  np.asarray(out_reuse))


def test_deep_reuse_with_stale_input_differs():
    """Sanity: the cached path actually skips the deep core (a stale
    deep changes the output)."""
    cfg = UNetConfig().tiny()
    unet, params = _unet_and_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, 8, 8, cfg.input_channels))
    t = jnp.full((1,), 37, jnp.int32)
    rngs = {"moe": jax.random.PRNGKey(2)}
    _, deep = unet.apply(params, x, t, deterministic=True, rngs=rngs,
                         with_deep=True)
    out_stale = unet.apply(params, x * 1.5, t, deterministic=True,
                           rngs=rngs, deep=deep)
    out_fresh = unet.apply(params, x * 1.5, t, deterministic=True,
                           rngs=rngs)
    assert not np.allclose(np.asarray(out_stale), np.asarray(out_fresh))


@pytest.mark.parametrize("interval", [2, 5])
def test_pipeline_cache_interval_samples(interval):
    pipe = LDMPipeline(UNetConfig().tiny(), VAEConfig().tiny(),
                       DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, pipe.unet_cfg.input_channels))
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(key, z)

    img = pipe.sample(up, dp, key, batch=2, image_size=64, num_steps=5,
                      cache_interval=interval)
    assert img.shape == (2, 64, 64, 3)
    assert img.dtype == jnp.uint8
    # not degenerate: uint8 output has real dynamic range
    assert int(np.asarray(img).std()) > 0

    base = pipe.sample(up, dp, key, batch=2, image_size=64, num_steps=5)
    assert base.shape == img.shape


def test_pipeline_cache_interval_rejects_unsupported():
    pipe = LDMPipeline(UNetConfig().tiny(), VAEConfig().tiny(),
                       DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, pipe.unet_cfg.input_channels))
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(key, z)
    cond = jnp.zeros((1,), jnp.int32)
    import dataclasses
    ucfg_c = dataclasses.replace(UNetConfig().tiny(), num_classes=3)
    pipe_c = LDMPipeline(ucfg_c, VAEConfig().tiny(),
                         DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    up_c = pipe_c.unet.init({"params": key, "moe": key}, z, t)
    with pytest.raises(ValueError):
        pipe_c.sample(up_c, dp, key, batch=1, image_size=64, num_steps=4,
                      condition=cond, guidance_scale=2.0,
                      cache_interval=2)


def test_pipeline_cache_interval_dpm2m_samples():
    pipe = LDMPipeline(UNetConfig().tiny(), VAEConfig().tiny(),
                       DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, pipe.unet_cfg.input_channels))
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(key, z)
    img = pipe.sample(up, dp, key, batch=1, image_size=64, num_steps=6,
                      sampler="dpm++2m", cache_interval=2)
    assert img.shape == (1, 64, 64, 3)
    assert int(np.asarray(img).std()) >= 0
