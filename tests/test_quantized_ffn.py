"""int8-quantized FFN weights (kernels quantize_cols + quantized kernel
paths + the ffn_quant config flag).

Inference/serving optimization: per-output-channel symmetric int8,
quantized in XLA (hoisted out of sampling scans so the scan streams
int8) and dequantized inside the Pallas kernels. These tests pin:
the scheme's algebra (dequant-after-matmul == matmul-of-dequant), the
interpret-mode kernels vs the fake-quantized XLA reference, bounded
error vs full precision, and that the config flag changes outputs
everywhere (never a silent no-op)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldm_image_generator_tpu.kernels.ffn_block import (
    dequantize_cols,
    fake_quantize,
    ffn_block_pallas,
    ffn_block_xla,
    quantize_cols,
)


def _setup(n=64, c=128, m=128, e=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 16)
    r = lambda k, shape, s=0.05: jax.random.normal(k, shape) * s
    x = jax.random.normal(ks[0], (n, c))
    mul = jax.random.normal(ks[1], (n, c)) * 0.2 + 1.0
    bias = r(ks[2], (n, c), 0.2)
    gwa, gwb = r(ks[3], (c, m)), r(ks[4], (c, m))
    gwc = r(ks[5], (m, c))
    gba, gbb, gbc = r(ks[6], (m,)), r(ks[7], (m,)), r(ks[8], (c,))
    wa, wb = r(ks[9], (e, c, m)), r(ks[10], (e, c, m))
    wc = r(ks[11], (e, m, c))
    ba, bb, bc = r(ks[12], (e, m)), r(ks[13], (e, m)), r(ks[14], (e, c))
    return (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(1), (96,))
    wq, sb = quantize_cols(w, b)
    assert wq.dtype == jnp.int8
    wdq, b2 = dequantize_cols(wq, sb)
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))
    # per-column max error <= scale/2 (symmetric rounding)
    err = np.abs(np.asarray(wdq - w))
    scale = np.asarray(sb[0])
    assert (err <= scale / 2 + 1e-9).all()
    # stacked (expert) form
    we = jax.random.normal(jax.random.PRNGKey(2), (4, 32, 48))
    be = jnp.zeros((4, 48))
    wqe, sbe = quantize_cols(we, be)
    assert wqe.shape == we.shape and sbe.shape == (4, 2, 48)


@pytest.mark.parametrize("c,m", [(128, 128), (1024, 1024)])
def test_quantized_kernel_matches_fake_quant_xla(c, m):
    args = _setup(n=32, c=c, m=m)
    (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc) = args
    ids = jnp.asarray([0, 2], jnp.int32)

    out_q, h_q = ffn_block_pallas(
        x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, ids, interpret=True, quantized=True)

    fq = fake_quantize
    qgwa, qgba = fq(gwa, gba)
    qgwb, qgbb = fq(gwb, gbb)
    qgwc, qgbc = fq(gwc, gbc)
    qwa, qba = fq(wa, ba)
    qwb, qbb = fq(wb, bb)
    qwc, qbc = fq(wc, bc)
    out_ref, h_ref = ffn_block_xla(
        x, mul, bias, qgwa, qgba, qgwb, qgbb, qgwc, qgbc,
        qwa, qba, qwb, qbb, qwc, qbc, 0, 2)
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-3, atol=1e-3)


def test_quantized_error_vs_full_precision_bounded():
    args = _setup(n=64, c=128, m=128)
    (x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc) = args
    ids = jnp.asarray([1, 3], jnp.int32)
    out_f, _ = ffn_block_pallas(
        x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, ids, interpret=True)
    out_q, _ = ffn_block_pallas(
        x, mul, bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, ids, interpret=True, quantized=True)
    rel = float(
        jnp.linalg.norm(out_q - out_f) / (jnp.linalg.norm(out_f) + 1e-9)
    )
    assert rel < 0.02, rel  # ~0.3% typical for per-channel int8


def test_fake_quantize_straight_through_gradient():
    """fake_quantize must carry straight-through gradients: rounding has
    zero derivative a.e., so differentiating through it would silently
    kill FFN weight gradients on the non-fused (CPU) path while the
    fused TPU path uses a full-precision recompute VJP."""
    w = jax.random.normal(jax.random.PRNGKey(0), (16, 24)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(1), (24,)) * 0.1
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 16))

    def loss(w_, b_):
        wq, bq = fake_quantize(w_, b_)
        return jnp.sum((v @ wq + bq) ** 2)

    gw, gb = jax.grad(loss, argnums=(0, 1))(w, b)
    assert float(jnp.linalg.norm(gw)) > 0.0
    assert float(jnp.linalg.norm(gb)) > 0.0
    # straight-through == gradient of the same loss at the dequantized
    # point w.r.t. the dequantized weights (identity jacobian)
    wq, bq = fake_quantize(w, b)
    gw_ref, gb_ref = jax.grad(
        lambda w_, b_: jnp.sum((v @ w_ + b_) ** 2), argnums=(0, 1)
    )(jax.lax.stop_gradient(wq), jax.lax.stop_gradient(bq))
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref), rtol=1e-6)


def test_pick_tiles_reports_infeasible():
    """C beyond the VMEM envelope must report fits=False so the
    dispatcher falls back to XLA instead of failing Mosaic compile."""
    from ldm_image_generator_tpu.kernels.ffn_block import _pick_tiles

    tm, mk, fits = _pick_tiles(64, 1024, 1024)
    assert fits
    # 4096x4096 weights: 9*4096*256*2*2 bytes ≈ 18.9MB > 12MB at the
    # mk=256 floor -> infeasible
    _, _, fits_big = _pick_tiles(64, 4096, 4096)
    assert not fits_big


def test_block_core_quantized_interpret():
    from ldm_image_generator_tpu.kernels.block_core import (
        block_core_pallas, block_core_xla,
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 20)
    r = lambda k, shape, s=0.05: jax.random.normal(k, shape) * s
    b, hh, ww, c = 2, 8, 8, 128
    m, e = c, 4
    x = jax.random.normal(ks[0], (b, hh, ww, c))
    mul = jax.random.normal(ks[1], (1, hh, ww, c)) * 0.2 + 1.0
    bias = r(ks[2], (1, hh, ww, c), 0.2)
    args = (x, mul, bias, r(ks[3], (c, m)), r(ks[6], (m,)),
            r(ks[4], (c, m)), r(ks[7], (m,)), r(ks[5], (m, c)),
            r(ks[8], (c,)), r(ks[9], (e, c, m)), r(ks[12], (e, m)),
            r(ks[10], (e, c, m)), r(ks[13], (e, m)),
            r(ks[11], (e, m, c)), r(ks[14], (e, c)),
            r(ks[15], (3, 3, 32, c), 0.1), r(ks[16], (c,), 0.1))
    ids = jnp.asarray([1, 2], jnp.int32)
    out_q, h_q = block_core_pallas(*args, ids, add_residual=True,
                                   interpret=True, quantized=True)
    out_f, _ = block_core_xla(*args, 1, 2, add_residual=True)
    rel = float(
        jnp.linalg.norm(out_q.astype(jnp.float32) - out_f.astype(jnp.float32))
        / (jnp.linalg.norm(out_f.astype(jnp.float32)) + 1e-9)
    )
    assert rel < 0.02, rel
    assert bool(jnp.isfinite(out_q).all())


def test_ffn_quant_flag_changes_output_on_cpu():
    """ffn_quant='int8' must not be a silent no-op anywhere — on CPU the
    non-fused path applies simulated quantization."""
    import dataclasses

    from ldm_image_generator_tpu.config import UNetConfig
    from ldm_image_generator_tpu.models import UNet

    cfg = UNetConfig(input_channels=4, channels=(128,), stages=(1,),
                     fixed_expert_indices=(0, 1))
    cfg_q = dataclasses.replace(cfg, ffn_quant="int8")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    key = jax.random.PRNGKey(1)
    u, uq = UNet(cfg), UNet(cfg_q)
    params = u.init({"params": key, "moe": key}, x, t)
    y = u.apply(params, x, t, rngs={"moe": key})
    yq = uq.apply(params, x, t, rngs={"moe": key})
    diff = float(jnp.max(jnp.abs(y - yq)))
    rel = float(jnp.linalg.norm(y - yq) / jnp.linalg.norm(y))
    assert diff > 0.0  # flag has an effect
    assert rel < 0.05  # but a small one
