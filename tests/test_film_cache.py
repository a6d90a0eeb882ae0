"""FiLM schedule cache (models/unet.py collect_film/film, pipelines.
make_cached_denoise).

The cache is a pure sampling optimization — the FiLM towers depend only
on (t, H, W) (unet.py:9-23 semantics: encodings are built from positional
+ time encodings, never from x) — so replaying a precomputed slice must
be numerically identical to the inline path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.models import UNet


def tiny_cfg(**kw):
    return UNetConfig(
        input_channels=4,
        channels=(8, 16),
        stages=(1, 2),
        head_dim=4,
        window_size=6,
        **kw,
    )


def test_collect_film_structure():
    cfg = tiny_cfg()
    unet = UNet(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    key = jax.random.PRNGKey(0)
    params = unet.init({"params": key, "moe": key}, x, jnp.zeros((1,), jnp.int32))
    ts = jnp.asarray([999, 500, 0], dtype=jnp.int32)
    film = unet.apply(params, x, ts, deterministic=True, collect_film=True)
    assert set(film) == {"enc_stage_0", "enc_stage_1",
                         "dec_stage_0", "dec_stage_1"}
    mul, bias = film["enc_stage_0"]["block_0"]
    assert mul.shape == (3, 16, 16, 8)
    assert bias.shape == (3, 16, 16, 8)
    # stage 1 runs at half resolution, double channels
    mul1, _ = film["dec_stage_1"]["block_1"]
    assert mul1.shape == (3, 8, 8, 16)


def test_film_replay_matches_inline():
    cfg = tiny_cfg()
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t0 = jnp.full((1,), 500, jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t0)
    moe = {"moe": jax.random.PRNGKey(7)}

    out_inline = unet.apply(params, x, t0, deterministic=True, rngs=moe)

    ts = jnp.asarray([999, 500, 0], dtype=jnp.int32)
    film = unet.apply(
        params, jnp.zeros((1, 16, 16, 4)), ts, deterministic=True,
        collect_film=True,
    )
    film_1 = jax.tree.map(lambda a: a[1][None], film)  # ts[1] == 500
    out_replay = unet.apply(
        params, x, t0, deterministic=True, film=film_1, rngs=moe
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_inline), rtol=0, atol=1e-6
    )


def test_film_replay_with_remat_and_nondefault_moe():
    cfg = tiny_cfg(remat=True, num_experts=3)
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    t0 = jnp.full((1,), 123, jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t0)
    moe = {"moe": jax.random.PRNGKey(3)}
    out_inline = unet.apply(params, x, t0, deterministic=True, rngs=moe)
    film = unet.apply(
        params, jnp.zeros((1, 8, 8, 4)), t0, deterministic=True,
        collect_film=True,
    )
    film_0 = jax.tree.map(lambda a: a[0][None], film)
    out_replay = unet.apply(
        params, x, t0, deterministic=True, film=film_0, rngs=moe
    )
    np.testing.assert_allclose(
        np.asarray(out_replay), np.asarray(out_inline), rtol=0, atol=1e-6
    )


def test_pipeline_film_cache_bitexact():
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = tiny_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    img_cached = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=2,
                             image_size=16, num_steps=4, film_cache=True)
    img_inline = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=2,
                             image_size=16, num_steps=4, film_cache=False)
    np.testing.assert_array_equal(np.asarray(img_cached),
                                  np.asarray(img_inline))


def test_cache_miss_poisons_with_nan():
    """Checked invariant (round-2 verdict): a timestep outside the cached
    schedule must fail loudly (NaN output), not silently pick index 0."""
    from ldm_image_generator_tpu.pipelines import make_cached_denoise

    cfg = tiny_cfg()
    unet = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    params = unet.init({"params": key, "moe": key}, x, t0)
    denoise = make_cached_denoise(unet, params, 1000, 4, (1, 16, 16, 4))

    ts_hit = jnp.asarray(np.linspace(0, 999, 4).astype(np.int32))
    out_hit = denoise(x, ts_hit[2:3], jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out_hit)).all()

    # 123 is not on the linspace(0, 999, 4) grid
    out_miss = denoise(x, jnp.full((1,), 123, jnp.int32),
                       jax.random.PRNGKey(2))
    assert np.isnan(np.asarray(out_miss)).all()


def test_cache_respects_custom_steps():
    """An explicit step schedule threaded through the pipeline must build
    the cache from the same schedule (no silent miss)."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = tiny_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)
    custom = (7, 311, 641, 998)  # off the linspace grid on purpose
    a = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, film_cache=True, steps=custom)
    b = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, film_cache=False, steps=custom)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loud failure check at the pipeline level: cache built for the
    # default grid but sampler stepped on a custom one would be all-NaN
    # (to_uint8 of NaN is deterministic garbage, so compare against the
    # matched run instead): the matched run must be finite-valued.
    assert np.asarray(a).dtype == np.uint8


def test_pipeline_film_cache_dpm_sampler():
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = tiny_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)
    a = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, sampler="dpm++2m", film_cache=True)
    b = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, sampler="dpm++2m", film_cache=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
