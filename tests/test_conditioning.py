"""Class-conditional generation surface (round-3 addition).

The reference stubs conditioning out end to end: DDPM.sample hardcodes
condition=None (ddpm.py:78), UNet drops the argument (unet.py:93,101)
and CrossAttention returns None (attention.py:92-99). Here the path is
a product surface: a learned class-embedding table (UNetConfig.
num_classes) feeds the decoder stages' cross-attention, train steps
apply CFG cond-drop, and LDMPipeline.sample takes class ids +
guidance_scale through the jitted chain.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig, VAEConfig
from ldm_image_generator_tpu.diffusion import make_schedule
from ldm_image_generator_tpu.models import UNet


def cond_cfg(**kw):
    return UNetConfig(
        input_channels=4,
        channels=(8, 16),
        stages=(1, 2),
        head_dim=4,
        window_size=6,
        num_classes=3,
        cond_channels=12,
        cond_tokens=2,
        **kw,
    )


def _init(unet, x, t, cond=None):
    key = jax.random.PRNGKey(0)
    return unet.init({"params": key, "moe": key}, x, t, cond)


def test_class_embed_params_created_even_unconditioned():
    cfg = cond_cfg()
    unet = UNet(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    params = _init(unet, x, t)
    emb = params["params"]["class_embed"]["embedding"]
    # num_classes + 1: the extra row is the learned null (CFG uncond)
    assert emb.shape == (4, cfg.cond_channels * cfg.cond_tokens)
    # cross-attention kv projections sized by cond width, not stage width
    wk = params["params"]["dec_stage_1"]["block_1"]["cross_attention"][
        "mha"]["wk"]
    assert wk.shape == (cfg.cond_channels, 16)


def test_condition_changes_output_per_class():
    cfg = cond_cfg()
    unet = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.full((1,), 500, jnp.int32)
    params = _init(unet, x, t)
    moe = {"moe": jax.random.PRNGKey(7)}
    y0 = unet.apply(params, x, t, jnp.asarray([0, 0]), rngs=moe)
    y1 = unet.apply(params, x, t, jnp.asarray([1, 1]), rngs=moe)
    ynull = unet.apply(params, x, t, jnp.asarray([3, 3]), rngs=moe)
    yun = unet.apply(params, x, t, None, rngs=moe)
    assert float(jnp.max(jnp.abs(y0 - y1))) > 1e-6
    assert float(jnp.max(jnp.abs(y0 - ynull))) > 1e-6
    # all finite
    for y in (y0, y1, ynull, yun):
        assert bool(jnp.isfinite(y).all())


def test_unconditional_default_params_unchanged():
    """num_classes=0 keeps the round-2 param tree (square cross-attn kv,
    no class_embed) so existing checkpoints keep loading."""
    cfg = dataclasses.replace(cond_cfg(), num_classes=0)
    unet = UNet(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    params = _init(unet, x, t)
    assert "class_embed" not in params["params"]
    wk = params["params"]["dec_stage_1"]["block_1"]["cross_attention"][
        "mha"]["wk"]
    assert wk.shape == (16, 16)


def test_film_cache_with_condition_matches_inline():
    from ldm_image_generator_tpu.pipelines import make_cached_denoise

    cfg = cond_cfg()
    unet = UNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    params = _init(unet, x, jnp.zeros((1,), jnp.int32))
    denoise = make_cached_denoise(unet, params, 1000, 4, (1, 16, 16, 4))
    ts = jnp.asarray(np.linspace(0, 999, 4).astype(np.int32))
    labels = jnp.asarray([2, 0])
    k = jax.random.PRNGKey(3)
    got = denoise(x, ts[1:2], k, labels)
    want = unet.apply(params, x, ts[1:2], labels, deterministic=True,
                      rngs={"moe": k}).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_pipeline_guidance_scale_changes_output():
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    cond = jnp.asarray([1, 2], jnp.int32)
    kw = dict(batch=2, image_size=16, num_steps=4)
    uncond = pipe.sample(up, dp, jax.random.PRNGKey(2), **kw)
    guided = pipe.sample(up, dp, jax.random.PRNGKey(2), condition=cond,
                         guidance_scale=3.0, **kw)
    guided2 = pipe.sample(up, dp, jax.random.PRNGKey(2), condition=cond,
                          guidance_scale=3.0, **kw)
    plain_c = pipe.sample(up, dp, jax.random.PRNGKey(2), condition=cond,
                          guidance_scale=1.0, **kw)
    # deterministic per seed
    np.testing.assert_array_equal(np.asarray(guided), np.asarray(guided2))
    # conditioning and guidance both actually change the samples
    assert np.any(np.asarray(guided) != np.asarray(uncond))
    assert np.any(np.asarray(guided) != np.asarray(plain_c))


def test_per_sample_guidance_scales_match_static():
    """guidance_scales (traced f32 [batch]) must reproduce the static
    guidance_scale per row: mixed-scale requests coalesced into one
    batch (the serving layer's CFG bucketing) sample exactly what each
    request would get in a single-scale batch."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    cond = jnp.asarray([1, 2], jnp.int32)
    kw = dict(batch=2, image_size=16, num_steps=4, condition=cond)
    seed = jax.random.PRNGKey(2)
    mixed = pipe.sample(up, dp, seed,
                        guidance_scales=jnp.asarray([1.0, 3.0]), **kw)
    static1 = pipe.sample(up, dp, seed, guidance_scale=1.0, **kw)
    static3 = pipe.sample(up, dp, seed, guidance_scale=3.0, **kw)
    # scale-1.0 row: CFG with gs=1 collapses to the conditional branch
    # (pred_u + 1*(pred_c - pred_u)); allow one uint8 rounding step
    assert np.max(np.abs(np.asarray(mixed[0], np.int32)
                         - np.asarray(static1[0], np.int32))) <= 1
    # scale-3.0 row matches the statically-baked 3.0 program
    assert np.max(np.abs(np.asarray(mixed[1], np.int32)
                         - np.asarray(static3[1], np.int32))) <= 1
    # and the two rows really got different guidance
    assert np.any(np.asarray(mixed[1]) != np.asarray(static1[1]))


def test_conditional_train_step_runs_and_learns():
    from ldm_image_generator_tpu.train import (
        LDMTrainState,
        make_ldm_train_step,
        make_optimizer,
    )

    cfg = cond_cfg()
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 4))
    labels = jnp.asarray([0, 1, 2, 1], jnp.int32)
    params = unet.init({"params": key, "moe": key, "sd": key}, x,
                       jnp.zeros((4,), jnp.int32), labels)
    tx = make_optimizer("adamw", 1e-3)
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_ldm_train_step(
        unet, schedule, tx, num_classes=cfg.num_classes, cond_drop=0.25))
    losses = []
    for i in range(15):
        state, metrics = step(state, x, jax.random.PRNGKey(100 + i), labels)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_loader_yields_labels_per_source_dir(tmp_path):
    from PIL import Image

    from ldm_image_generator_tpu.data import BatchLoader, ImageDataset

    rng = np.random.default_rng(0)
    for d, n in (("a", 3), ("b", 5)):
        (tmp_path / d).mkdir()
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            ).save(tmp_path / d / f"{i}.png")
    ds = ImageDataset([str(tmp_path / "a"), str(tmp_path / "b")],
                      cache_dir=str(tmp_path / "cache"), size=8)
    assert sorted(ds.labels) == [0] * 3 + [1] * 5
    loader = BatchLoader(ds, 4, shuffle=False, with_labels=True, prefetch=1)
    batches = list(loader)
    assert len(batches) == 2
    imgs, labels = batches[0]
    assert imgs.shape == (4, 8, 8, 3)
    assert labels.dtype == np.int32 and labels.shape == (4,)
    all_labels = np.concatenate([b[1] for b in batches])
    np.testing.assert_array_equal(all_labels, ds.labels[:8])


def test_cfg_rescale_changes_guided_samples_only():
    """cfg_rescale (arXiv:2305.08891 §3.4): phi > 0 must change guided
    output at scale > 1, be (near-)identity at scale 1 (guided ==
    conditional there, so the std ratio is ~1), and stay deterministic."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    cond = jnp.asarray([1, 2], jnp.int32)
    kw = dict(batch=2, image_size=16, num_steps=4, condition=cond)
    seed = jax.random.PRNGKey(2)

    plain = pipe.sample(up, dp, seed, guidance_scale=3.0, **kw)
    resc = pipe.sample(up, dp, seed, guidance_scale=3.0,
                       cfg_rescale=0.7, **kw)
    resc2 = pipe.sample(up, dp, seed, guidance_scale=3.0,
                        cfg_rescale=0.7, **kw)
    np.testing.assert_array_equal(np.asarray(resc), np.asarray(resc2))
    assert np.any(np.asarray(resc) != np.asarray(plain))

    # at scale 1 guided == conditional, so rescale is a ~no-op
    # (std_c/std_g == 1 up to the 1e-6 epsilon); allow uint8 rounding
    s1 = pipe.sample(up, dp, seed, guidance_scale=1.0, **kw)
    s1r = pipe.sample(up, dp, seed, guidance_scale=1.0,
                      cfg_rescale=0.7, **kw)
    assert np.max(np.abs(np.asarray(s1, np.int32)
                         - np.asarray(s1r, np.int32))) <= 1


def test_cfg_rescale_matches_reference_formula():
    """The in-pipeline rescale must equal the paper's formula applied to
    the same cond/uncond predictions (checked through _denoise_fn with a
    tiny UNet, one denoise call)."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t1)

    cond = jnp.asarray([1, 1], jnp.int32)
    gs, phi = 3.0, 0.7
    denoise, base, use_cfg = pipe._denoise_fn(
        up, 8, 4, None, False, cond, gs, cfg_rescale=phi)
    assert use_cfg

    x = jax.random.normal(jax.random.PRNGKey(3),
                          (2, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.full((2,), 10, jnp.int32)
    k = jax.random.PRNGKey(4)
    got = denoise(x, t, k)

    null = jnp.full_like(cond, ucfg.num_classes)
    pred_c = base(x, t, k, cond)
    pred_u = base(x, t, k, null)
    guided = pred_u + gs * (pred_c - pred_u)
    ax = (1, 2, 3)
    std_c = jnp.std(pred_c, axis=ax, keepdims=True)
    std_g = jnp.std(guided, axis=ax, keepdims=True)
    want = phi * (guided * (std_c / (std_g + 1e-6))) \
        + (1 - phi) * guided
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_per_sample_cfg_rescales_match_static():
    """cfg_rescales (traced f32 [batch] phi vector, the serving layer's
    per-request rescale knob): each row must match the static-phi
    program at that row's value — phi 0 rows are EXACT plain CFG (the
    coalescing contract: requests with and without a rescale share one
    compiled batch, pipelines._denoise_fn apply_rescale)."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    cond = jnp.asarray([1, 2], jnp.int32)
    kw = dict(batch=2, image_size=16, num_steps=4, condition=cond,
              guidance_scale=3.0)
    seed = jax.random.PRNGKey(2)

    mixed = pipe.sample(up, dp, seed,
                        cfg_rescales=jnp.asarray([0.7, 0.0]), **kw)
    static = pipe.sample(up, dp, seed, cfg_rescale=0.7, **kw)
    plain = pipe.sample(up, dp, seed, **kw)

    # phi 0.7 row == static-0.7 program's row (same math, traced phi;
    # allow one uint8 step for fusion-order rounding)
    assert np.max(np.abs(np.asarray(mixed[0], np.int32)
                         - np.asarray(static[0], np.int32))) <= 1
    # phi 0 row is exact plain CFG (0 * rescaled + 1 * guided)
    np.testing.assert_array_equal(np.asarray(mixed[1]),
                                  np.asarray(plain[1]))
    # and the two rows genuinely differ from swapping programs
    assert np.any(np.asarray(mixed[0]) != np.asarray(plain[0]))


def test_negative_condition_null_is_noop_and_steers():
    """Negative-class guidance (pipelines._denoise_fn negative_condition):
    the null id (== num_classes) must reproduce plain CFG bit-exactly
    per SAMPLE (the coalescing contract serving relies on), and a real
    negative class must change that sample's output."""
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    cond = jnp.asarray([1, 1], jnp.int32)
    null = ucfg.num_classes
    kw = dict(batch=2, image_size=16, num_steps=4, condition=cond,
              guidance_scale=3.0)
    seed = jax.random.PRNGKey(2)
    plain = np.asarray(pipe.sample(up, dp, seed, **kw))
    # all-null negative ids == plain CFG, bit-exact
    allnull = np.asarray(pipe.sample(
        up, dp, seed,
        negative_condition=jnp.asarray([null, null], jnp.int32), **kw))
    np.testing.assert_array_equal(plain, allnull)
    # mixed batch: row 0 rides null (unchanged), row 1 steers away
    # from class 0 (changed) — per-sample independence under batching
    mixed = np.asarray(pipe.sample(
        up, dp, seed,
        negative_condition=jnp.asarray([null, 0], jnp.int32), **kw))
    np.testing.assert_array_equal(plain[0], mixed[0])
    assert np.any(plain[1] != mixed[1])


def test_negative_condition_validation():
    from ldm_image_generator_tpu.pipelines import LDMPipeline

    ucfg = cond_cfg()
    vcfg = VAEConfig().tiny()
    pipe = LDMPipeline(ucfg, vcfg, DDPMConfig(), dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 8, 8, ucfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    up = pipe.unet.init({"params": key, "moe": key}, z, t)
    dp = pipe.decoder.init(jax.random.PRNGKey(1), z)

    neg = jnp.asarray([0], jnp.int32)
    import pytest

    # no condition -> error
    with pytest.raises(ValueError, match="negative_condition requires"):
        pipe.sample(up, dp, key, batch=1, image_size=16, num_steps=2,
                    negative_condition=neg)
    # guidance 1.0 (CFG off) -> error, it would silently do nothing
    with pytest.raises(ValueError, match="no effect at guidance 1.0"):
        pipe.sample(up, dp, key, batch=1, image_size=16, num_steps=2,
                    condition=jnp.asarray([1], jnp.int32),
                    guidance_scale=1.0, negative_condition=neg)
    # per-sample guidance_scales lift the static-1.0 restriction
    out = pipe.sample(up, dp, key, batch=1, image_size=16, num_steps=2,
                      condition=jnp.asarray([1], jnp.int32),
                      guidance_scales=jnp.asarray([2.0], jnp.float32),
                      negative_condition=neg)
    assert out.shape == (1, 16, 16, 3)
