"""Prepared-state cache (pipelines._PrepCache): repeated sampling with
the same weight trees must skip the seed-independent prep (cast + FiLM
schedule) with numerics IDENTICAL to the per-call in-program path, and
the identity-keyed memo must never serve stale state for a different
tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.pipelines import (
    DDPMPipeline,
    LDMPipeline,
    _PREP_CAST_MAX,
    _PREP_FILM_MAX,
)


def _tiny():
    ucfg = UNetConfig(input_channels=8, stages=(1, 1), channels=(16, 32))
    return LDMPipeline(
        ucfg, VAEConfig().tiny(), DDPMConfig(num_timesteps=50),
        dtype=jnp.float32,
    )


def _params(pipe):
    key = jax.random.PRNGKey(0)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up = pipe.unet.init({"params": key, "moe": key}, z,
                        jnp.zeros((1,), jnp.int32))
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)
    return up, dp


def test_prep_path_matches_inprogram_path(monkeypatch):
    """The cached-prep fast path must be numerically identical to
    LDM_PREP_CACHE=0 (cast + film collected inside the jitted call)."""
    pipe = _tiny()
    up, dp = _params(pipe)
    kw = dict(batch=2, image_size=16, num_steps=4)
    fast = pipe.sample(up, dp, jax.random.PRNGKey(3), **kw)
    assert pipe._prep.cast and pipe._prep.film  # fast path engaged

    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    pipe2 = _tiny()
    slow = pipe2.sample(up, dp, jax.random.PRNGKey(3), **kw)
    assert not pipe2._prep.cast  # gate respected
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_cache_hits_reuse_entries():
    pipe = _tiny()
    up, dp = _params(pipe)
    pipe.sample(up, dp, jax.random.PRNGKey(0), batch=1, image_size=16,
                num_steps=4)
    cast_vals = [v[1] for v in pipe._prep.cast.values()]
    film_vals = [v[1] for v in pipe._prep.film.values()]
    pipe.sample(up, dp, jax.random.PRNGKey(1), batch=1, image_size=16,
                num_steps=4)
    # same entries, same prepared objects — no recompute on a hit
    assert [v[1] for v in pipe._prep.cast.values()] == cast_vals
    assert len(pipe._prep.film) == len(film_vals)
    for (old, new) in zip(film_vals,
                          [v[1] for v in pipe._prep.film.values()]):
        assert jax.tree.all(
            jax.tree.map(lambda a, b: a is b, old, new)
        )


def test_new_tree_gets_new_entry_and_distinct_output():
    pipe = _tiny()
    up, dp = _params(pipe)
    img1 = pipe.sample(up, dp, jax.random.PRNGKey(3), batch=1,
                       image_size=16, num_steps=4)
    # a different weight tree (fresh init) must MISS and change output
    key = jax.random.PRNGKey(9)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up2 = pipe.unet.init({"params": key, "moe": key}, z,
                         jnp.zeros((1,), jnp.int32))
    img2 = pipe.sample(up2, dp, jax.random.PRNGKey(3), batch=1,
                       image_size=16, num_steps=4)
    assert not np.array_equal(np.asarray(img1), np.asarray(img2))


def test_lru_eviction_is_bounded():
    pipe = _tiny()
    up, dp = _params(pipe)
    # distinct film keys: several (num_steps) variants for one tree
    for n in (2, 3, 4, 5, 6, 7):
        pipe.sample(up, dp, jax.random.PRNGKey(0), batch=1, image_size=16,
                    num_steps=n)
    assert len(pipe._prep.film) <= _PREP_FILM_MAX
    assert len(pipe._prep.cast) <= _PREP_CAST_MAX
    pipe.clear_prep_cache()
    assert not pipe._prep.cast and not pipe._prep.film


def test_traced_params_bypass_cache():
    """Calling sample on traced params (inside someone else's jit) must
    fall back to in-program prep — the Python memo must not capture
    tracers."""
    pipe = _tiny()
    up, dp = _params(pipe)

    @jax.jit
    def outer(up, dp, key):
        return pipe.sample(up, dp, key, batch=1, image_size=16,
                           num_steps=4)

    out = outer(up, dp, jax.random.PRNGKey(3))
    assert out.shape == (1, 16, 16, 3)
    assert not pipe._prep.cast and not pipe._prep.film
    direct = pipe.sample(up, dp, jax.random.PRNGKey(3), batch=1,
                         image_size=16, num_steps=4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(direct))


def test_explicit_steps_and_dpm_equivalence(monkeypatch):
    pipe = _tiny()
    up, dp = _params(pipe)
    custom = (7, 21, 43, 49)
    a = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, steps=custom, sampler="dpm++2m")
    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    b = pipe.sample(up, dp, jax.random.PRNGKey(2), batch=1, image_size=16,
                    num_steps=4, steps=custom, sampler="dpm++2m")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conditional_guided_equivalence(monkeypatch):
    ucfg = UNetConfig(input_channels=8, stages=(1, 1), channels=(16, 32),
                      num_classes=3)
    pipe = LDMPipeline(ucfg, VAEConfig().tiny(),
                       DDPMConfig(num_timesteps=50), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    latent = 16 // pipe.vae_cfg.downscale
    z = jnp.zeros((1, latent, latent, 8))
    up = pipe.unet.init({"params": key, "moe": key}, z,
                        jnp.zeros((1,), jnp.int32))
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)
    cond = jnp.asarray([0, 2], jnp.int32)
    kw = dict(batch=2, image_size=16, num_steps=4, condition=cond,
              guidance_scale=2.0, cfg_rescale=0.5)
    a = pipe.sample(up, dp, jax.random.PRNGKey(2), **kw)
    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    b = pipe.sample(up, dp, jax.random.PRNGKey(2), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_img2img_equivalence(monkeypatch):
    pipe = _tiny()
    up, dp = _params(pipe)
    ep = pipe.encoder.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 16, 16, 3)))
    img = jax.random.uniform(jax.random.PRNGKey(5), (1, 16, 16, 3),
                             minval=-1.0, maxval=1.0)
    kw = dict(strength=0.5, num_steps=4)
    a = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img, **kw)
    assert pipe._prep.cast  # fast path engaged (incl. encoder cast)
    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    b = pipe.img2img(up, dp, ep, jax.random.PRNGKey(3), img, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_pipeline_equivalence(monkeypatch):
    cfg = UNetConfig(input_channels=3, stages=(1, 1), channels=(16, 32))
    pipe = DDPMPipeline(cfg, DDPMConfig(num_timesteps=50),
                        dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 3))
    params = pipe.unet.init({"params": key, "moe": key}, x,
                            jnp.zeros((1,), jnp.int32))
    a = pipe.sample(params, jax.random.PRNGKey(0), batch=2, image_size=8,
                    num_steps=4)
    assert pipe._prep.cast and pipe._prep.film
    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    b = pipe.sample(params, jax.random.PRNGKey(0), batch=2, image_size=8,
                    num_steps=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_film_cache_false_still_precasts():
    pipe = _tiny()
    up, dp = _params(pipe)
    out = pipe.sample(up, dp, jax.random.PRNGKey(0), batch=1,
                      image_size=16, num_steps=4, film_cache=False)
    assert out.shape == (1, 16, 16, 3)
    assert pipe._prep.cast and not pipe._prep.film


def test_deepcache_with_prep_cache(monkeypatch):
    """DeepCache (cache_interval > 1) rides the film-cached base: both
    prep modes must agree."""
    pipe = _tiny()
    up, dp = _params(pipe)
    kw = dict(batch=1, image_size=16, num_steps=4, cache_interval=2)
    a = pipe.sample(up, dp, jax.random.PRNGKey(4), **kw)
    monkeypatch.setenv("LDM_PREP_CACHE", "0")
    b = pipe.sample(up, dp, jax.random.PRNGKey(4), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
