"""SwinBlock core megakernel (kernels/block_core.py) vs its XLA
reference and vs the unfused SwinBlock composition (interpret mode on
CPU; the real-hardware equivalence run is scripted, docs/PERF.md)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldm_image_generator_tpu.kernels.block_core import (
    block_core_pallas,
    block_core_xla,
    repack_conv_blocks,
)


def _setup(b=2, hh=8, ww=8, c=128, m=128, gw=32, e=4, film_b=None, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 20)
    r = lambda k, shape, s=0.05: jax.random.normal(k, shape) * s
    fb = film_b or b
    x = jax.random.normal(ks[0], (b, hh, ww, c))
    mul = jax.random.normal(ks[1], (fb, hh, ww, c)) * 0.2 + 1.0
    bias = r(ks[2], (fb, hh, ww, c), 0.2)
    gwa, gwb = r(ks[3], (c, m)), r(ks[4], (c, m))
    gwc = r(ks[5], (m, c))
    gba, gbb, gbc = r(ks[6], (m,)), r(ks[7], (m,)), r(ks[8], (c,))
    wa, wb = r(ks[9], (e, c, m)), r(ks[10], (e, c, m))
    wc = r(ks[11], (e, m, c))
    ba, bb, bc = r(ks[12], (e, m)), r(ks[13], (e, m)), r(ks[14], (e, c))
    ck = r(ks[15], (3, 3, gw, c), 0.1)
    cb = r(ks[16], (c,), 0.1)
    return (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc, ck, cb)


@pytest.mark.parametrize(
    "b,hh,ww,c,m,film_b,res",
    [
        (2, 8, 8, 128, 128, None, True),
        (2, 8, 8, 128, 128, 1, True),     # film schedule-cache batch 1
        (1, 4, 4, 1024, 1024, 1, True),   # hidden-chunked C=1024 stage
        (3, 6, 6, 256, 256, None, False),  # no residual fold, odd batch
        (2, 8, 8, 128, 128, 1, False),
    ],
)
def test_block_core_kernel_matches_xla(b, hh, ww, c, m, film_b, res):
    args = _setup(b=b, hh=hh, ww=ww, c=c, m=m, film_b=film_b)
    ids = jnp.asarray([1, 3], jnp.int32)
    ref_out, ref_h = block_core_xla(*args, 1, 3, add_residual=res)
    out, h = block_core_pallas(*args, ids, add_residual=res, interpret=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=5e-4)


@pytest.mark.parametrize(
    "b,hh,ww,c,m,film_b,res,th",
    [
        (1, 8, 8, 128, 128, 1, True, 2),    # 4 bands: edge + middle halos
        (2, 8, 8, 256, 256, None, True, 4),  # multi-group conv, batch film
        (1, 6, 6, 128, 128, 1, False, 3),   # no residual, odd band size
    ],
)
def test_block_core_row_banded_matches_xla(b, hh, ww, c, m, film_b, res, th):
    """The row-banded schedule (conv halo via neighbor-indexed block
    refs) must be exact vs the XLA reference, including the zeroed
    halo at the top/bottom image edges."""
    args = _setup(b=b, hh=hh, ww=ww, c=c, m=m, film_b=film_b)
    ids = jnp.asarray([1, 3], jnp.int32)
    ref_out, ref_h = block_core_xla(*args, 1, 3, add_residual=res)
    out, h = block_core_pallas(*args, ids, add_residual=res,
                               interpret=True, row_tile=th)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=5e-4)


def test_block_core_row_banded_quantized_matches_fake_quant():
    from ldm_image_generator_tpu.kernels.ffn_block import fake_quantize

    args = _setup(b=1, hh=8, ww=8, c=128, m=128, film_b=1)
    (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc_, ck, cb) = args
    ids = jnp.asarray([0, 2], jnp.int32)
    qgwa, qgba = fake_quantize(gwa, gba)
    qgwb, qgbb = fake_quantize(gwb, gbb)
    qgwc, qgbc = fake_quantize(gwc, gbc)
    qwa, qba = fake_quantize(wa, ba)
    qwb, qbb = fake_quantize(wb, bb)
    qwc, qbc = fake_quantize(wc, bc_)
    ref_out, ref_h = block_core_xla(
        x, mul, bias, qgwa, qgba, qgwb, qgbb, qgwc, qgbc,
        qwa, qba, qwb, qbb, qwc, qbc, ck, cb, 0, 2, add_residual=True)
    out, h = block_core_pallas(
        x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc_, ck, cb, ids, add_residual=True,
        interpret=True, quantized=True, row_tile=2)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-3, atol=2e-3)


def test_block_core_xla_matches_unfused_swinblock():
    """The XLA reference must equal the real SwinBlock composition
    (norm -> FiLM -> MoE + grouped conv -> +residual) with shared
    params, on a non-attention block."""
    from ldm_image_generator_tpu.models.layers import SwinBlock

    c = 64
    block = SwinBlock(c, head_dim=32, attention=False,
                      stochastic_depth=0.0, fixed_expert_indices=(0, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, c))
    t = jnp.full((1,), 500, jnp.int32)
    params = block.init({"params": jax.random.PRNGKey(1)}, x, t)
    ref = block.apply(params, x, t, deterministic=True)

    p = params["params"]
    # FiLM tensors straight from the Encodings submodule
    from ldm_image_generator_tpu.models.layers import Encodings

    enc = Encodings(c)
    mul, bias = enc.apply({"params": p["encodings"]}, x, t, return_film=True)
    f = p["ffn"]
    out, h = block_core_xla(
        x, mul, bias,
        f["gwa"], f["gba"], f["gwb"], f["gbb"], f["gwc"], f["gbc"],
        f["wa"], f["ba"], f["wb"], f["bb"], f["wc"], f["bc"],
        p["conv"]["kernel"], p["conv"]["bias"], 0, 2, add_residual=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_repack_conv_blocks_roundtrip():
    """Block-diagonal repack must reproduce the grouped conv exactly."""
    c, gw = 256, 32
    ck = jax.random.normal(jax.random.PRNGKey(0), (3, 3, gw, c)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, c))
    ref = jax.lax.conv_general_dilated(
        x, ck, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c // gw,
    )
    wblk = repack_conv_blocks(ck)  # [9*gb, 128, 128]
    gb = c // 128
    got = jnp.zeros_like(ref)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for ky in range(3):
        for kx in range(3):
            sh = xp[:, ky:ky + 6, kx:kx + 6, :]
            for g in range(gb):
                blk = wblk[(ky * 3 + kx) * gb + g]
                got = got.at[..., g * 128:(g + 1) * 128].add(
                    sh[..., g * 128:(g + 1) * 128] @ blk
                )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_block_core_custom_vjp_grads_match_xla():
    from unittest import mock

    import ldm_image_generator_tpu.kernels.block_core as bc

    args = _setup(b=2, hh=6, ww=6, c=128, m=128, film_b=1)
    (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc_, ck, cb) = args
    ids = jnp.asarray([0, 2], jnp.int32)

    orig = bc.block_core_pallas
    with mock.patch.object(
        bc, "block_core_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ):
        def f_fused(x, mul, gwa, wa, ck):
            out, h = bc._fused_block_core(
                x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
                wa, ba, wb, bb, wc, bc_, ck, cb, ids, True, False)
            return jnp.sum(out ** 2) + jnp.sum(h ** 2)

        g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(
            x, mul, gwa, wa, ck)

    def f_ref(x, mul, gwa, wa, ck):
        out, h = bc.block_core_xla(
            x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc_, ck, cb, 0, 2, add_residual=True)
        return jnp.sum(out ** 2) + jnp.sum(h ** 2)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, mul, gwa, wa, ck)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_swinblock_block_core_wiring_falls_back_on_cpu():
    """The fuse gate requires a TPU backend; on CPU the block must run
    the unfused path and stay finite with the default ffn_backend."""
    from ldm_image_generator_tpu.models.layers import SwinBlock

    block = SwinBlock(128, head_dim=32, attention=True,
                      stochastic_depth=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 128))
    t = jnp.zeros((1,), jnp.int32)
    params = block.init({"params": jax.random.PRNGKey(1),
                         "moe": jax.random.PRNGKey(2)}, x, t)
    out = block.apply(params, x, t, deterministic=True,
                      rngs={"moe": jax.random.PRNGKey(3)})
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_block_core_xla_bf16_differentiable():
    """Regression: the b<=2 bf16 TRAINING path differentiates through
    block_core_xla (the custom VJP's recompute); a bf16 conv kernel
    against the fp32 cotangent made lax.conv's transpose rule raise
    (found by a real bf16 b2 train_ldm run on TPU)."""
    import ldm_image_generator_tpu.kernels.block_core as bc

    args = _setup(b=2, hh=6, ww=6, c=128, m=128, film_b=2)
    args = tuple(
        a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a
        for a in args
    )
    (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc_, ck, cb) = args

    def f(x, ck):
        out, h = bc.block_core_xla(
            x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc_, ck, cb, 0, 2, add_residual=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, gk = jax.grad(f, argnums=(0, 1))(x, ck)
    assert gx.shape == x.shape and gk.shape == ck.shape
    assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())
