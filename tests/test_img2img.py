"""img2img / inpainting pipeline tests (SDEdit-style partial diffusion —
a capability the reference lacks: its sampler always starts from pure
noise, ddpm.py:62)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.diffusion import ddim_sample, make_schedule
from ldm_image_generator_tpu.pipelines import LDMPipeline, to_uint8


def _tiny_ldm():
    unet_cfg = UNetConfig(input_channels=8, stages=(1, 1), channels=(16, 32))
    vae_cfg = VAEConfig().tiny()
    return LDMPipeline(
        unet_cfg, vae_cfg, DDPMConfig(num_timesteps=50), dtype=jnp.float32
    )


@pytest.fixture(scope="module")
def pipe_and_params():
    pipe = _tiny_ldm()
    key = jax.random.PRNGKey(0)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up = pipe.unet.init(
        {"params": key, "moe": key}, z, jnp.zeros((1,), jnp.int32)
    )
    dp = pipe.decoder.init(key, z)
    ep = pipe.encoder.init(key, jnp.zeros((1, 16, 16, 3)))
    return pipe, up, dp, ep


def test_img2img_shapes_determinism_strength(pipe_and_params):
    pipe, up, dp, ep = pipe_and_params
    img = jax.random.uniform(
        jax.random.PRNGKey(7), (2, 16, 16, 3), minval=-1, maxval=1
    )
    out1 = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img,
                        strength=0.5, num_steps=6)
    out1b = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img,
                         strength=0.5, num_steps=6)
    assert out1.shape == (2, 16, 16, 3)
    assert out1.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))

    # a different strength runs a different sub-schedule
    out2 = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img,
                        strength=0.9, num_steps=6)
    assert not np.array_equal(np.asarray(out1), np.asarray(out2))

    # dpm++2m path compiles and runs on the sub-schedule too
    out3 = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img,
                        strength=0.5, num_steps=6, sampler="dpm++2m")
    assert out3.shape == (2, 16, 16, 3)


def test_img2img_low_strength_stays_close(pipe_and_params):
    """At very low strength the result must be closer to the encode ->
    decode roundtrip of the input than a high-strength run is (the whole
    point of SDEdit's t_start dial)."""
    pipe, up, dp, ep = pipe_and_params
    img = jax.random.uniform(
        jax.random.PRNGKey(8), (1, 16, 16, 3), minval=-1, maxval=1
    )
    z0 = pipe.encoder.apply(ep, img)
    base = np.asarray(to_uint8(pipe.decoder.apply(dp, z0))).astype(np.int32)
    low = np.asarray(
        pipe.img2img(up, dp, ep, jax.random.PRNGKey(1), img,
                     strength=0.05, num_steps=20)
    ).astype(np.int32)
    high = np.asarray(
        pipe.img2img(up, dp, ep, jax.random.PRNGKey(1), img,
                     strength=1.0, num_steps=20)
    ).astype(np.int32)
    err_low = np.abs(low - base).mean()
    err_high = np.abs(high - base).mean()
    assert err_low < err_high


def test_inpaint_keep_all_is_exact_roundtrip(pipe_and_params):
    """mask == 0 everywhere (keep everything): the terminal projection
    pastes the exact encoder latent, so the output must be bit-equal to
    decode(encode(img)) regardless of the denoiser's outputs."""
    pipe, up, dp, ep = pipe_and_params
    img = jax.random.uniform(
        jax.random.PRNGKey(9), (1, 16, 16, 3), minval=-1, maxval=1
    )
    mask = jnp.zeros((1, 16, 16, 1))
    out = pipe.img2img(up, dp, ep, jax.random.PRNGKey(2), img,
                       strength=0.7, num_steps=5, mask=mask)
    z0 = pipe.encoder.apply(ep, img).astype(jnp.float32)
    expect = to_uint8(pipe.decoder.apply(dp, z0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_inpaint_mask_validation(pipe_and_params):
    pipe, up, dp, ep = pipe_and_params
    img = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError, match="ddim"):
        pipe.img2img(up, dp, ep, jax.random.PRNGKey(0), img,
                     mask=jnp.ones((1, 16, 16, 1)), sampler="dpm++2m")
    with pytest.raises(ValueError, match="strength"):
        pipe.img2img(up, dp, ep, jax.random.PRNGKey(0), img, strength=0.0)


def test_ddim_project_fn_pastes_known_region():
    """ddim_sample's project_fn hook: with a projection that pastes z0
    outside the mask at every step, the kept region of the final latent
    equals z0 exactly while the regenerated region does not."""
    from ldm_image_generator_tpu.diffusion.ddpm import q_sample

    schedule = make_schedule(DDPMConfig(num_timesteps=50))
    key = jax.random.PRNGKey(0)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    m = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)  # top half regenerated

    def denoise(x, t_vec, k):
        return jax.random.normal(k, x.shape)  # arbitrary model

    def project(x, t_next, final, k):
        noise = jax.random.normal(k, z0.shape)
        known = jnp.where(final, z0, q_sample(schedule, z0, t_next, noise))
        return m * x + (1.0 - m) * known

    out = ddim_sample(denoise, schedule, key, z0.shape, num_steps=5,
                      project_fn=project)
    np.testing.assert_array_equal(
        np.asarray(out[:, 4:]), np.asarray(z0[:, 4:])
    )
    assert not np.array_equal(np.asarray(out[:, :4]), np.asarray(z0[:, :4]))
