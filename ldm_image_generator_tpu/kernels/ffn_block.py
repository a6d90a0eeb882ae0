"""Fused SwinBlock FFN prologue (Pallas TPU kernel).

Covers the block region
    hn  = channel_norm(x)                      (modules.py:18-25 semantics)
    h   = hn * film_mul + film_bias            (unet.py:22-23)
    out = ReGLU_general(h) + ReGLU_ei(h) + ReGLU_ej(h)   (modules.py:28-36)
returning (out, h); the conv / attention branches and the residual stay
outside (they also consume h). Fusing keeps hn and the five FFN
intermediates in VMEM — at batch 8 the XLA lowering round-trips ~20MB of
them to HBM per block, ~0.9GB per denoise step.

Expert routing: the two selected expert ids arrive as *scalar prefetch*
arguments (PrefetchScalarGridSpec) and drive the index maps of the
stacked [E, C, M] expert tensors — only the selected experts' weights
are ever read from HBM, matching the lax.switch XLA path's zero-copy
property while staying a single kernel for any (i, j).

Large stages (C=1024: 9 CxC weight mats = 18.9MB bf16 > VMEM) are
handled by a second grid dimension over chunks of the ReGLU hidden dim:
out = sum_k (a_k * relu(b_k)) @ wc[k] accumulated in an fp32 VMEM
scratch, with only one hidden chunk's weights resident per grid step.
The row tile, h, and the accumulator keep constant block indices across
k, so Mosaic leaves them in VMEM for the whole reduction.

Differentiable via custom VJP (XLA recompute backward, like the other
kernels in this package).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.ops.norm import channel_norm


def ffn_block_xla(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                  wa, ba, wb, bb, wc, bc, e1, e2):
    """Reference implementation. x/film_*: [N, C]; g*: general ReGLU
    params; wa..bc: stacked expert params [E, ...]; e1, e2: expert ids.
    Returns (ffn_out [N, C], h [N, C])."""
    h = channel_norm(x) * film_mul + film_bias

    def reglu(h, wa_, ba_, wb_, bb_, wc_, bc_):
        return (
            (h @ wa_ + ba_) * jax.nn.relu(h @ wb_ + bb_)
        ) @ wc_ + bc_

    out = reglu(h, gwa, gba, gwb, gbb, gwc, gbc)
    out = out + reglu(h, wa[e1], ba[e1], wb[e1], bb[e1], wc[e1], bc[e1])
    out = out + reglu(h, wa[e2], ba[e2], wb[e2], bb[e2], wc[e2], bc[e2])
    return out, h


def quantize_cols(w: jnp.ndarray, bias: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization.

    w: [..., in, out], bias: [..., out] -> (int8 w, scale_bias
    [..., 2, out] fp32 with rows [scale; bias]). Inside a jitted
    sampling scan this computation is loop-invariant, so XLA hoists it
    and the scan streams the int8 arrays — half the HBM bytes of bf16.
    The matching dequant happens INSIDE the Pallas kernel (a custom-call
    boundary XLA cannot hoist through), as out_cols * scale after the
    matmul: exact for the per-output-channel scheme."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.round(w.astype(jnp.float32) / scale[..., None, :]).astype(
        jnp.int8
    )
    sb = jnp.stack([scale, bias.astype(jnp.float32)], axis=-2)
    return wq, sb


def dequantize_cols(wq: jnp.ndarray, sb: jnp.ndarray):
    """Inverse of quantize_cols: (fp32 w, bias)."""
    scale, bias = sb[..., 0, :], sb[..., 1, :]
    return wq.astype(jnp.float32) * scale[..., None, :], bias


def _kernel(eps, out_dtype, quantized: bool = False):
    def kernel(sidx, x_ref, mul_ref, bias_ref,
               gwa, gba, gwb, gbb, gwc, gbc,
               wa1, ba1, wb1, bb1, wc1, bc1,
               wa2, ba2, wb2, bb2, wc2, bc2,
               out_ref, h_ref, acc_ref):
        from jax.experimental import pallas as pl

        k = pl.program_id(1)
        nk = pl.num_programs(1)

        def sb2(ref):
            """scale_bias ref [.., 2, d] -> (scale [1, d], bias [1, d])."""
            v = ref[:].reshape(2, ref.shape[-1])
            return v[0:1, :], v[1:2, :]

        def bias_of(ref):
            if quantized:
                return sb2(ref)[1]
            return ref[:].reshape(1, -1).astype(jnp.float32)

        @pl.when(k == 0)
        def _init():
            xf = x_ref[:].astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.var(xf, axis=-1, keepdims=True, ddof=1)
            hn = (xf - mean) * jax.lax.rsqrt(var + eps)
            h = (
                hn * mul_ref[:].astype(jnp.float32)
                + bias_ref[:].astype(jnp.float32)
            ).astype(out_dtype)
            h_ref[:] = h
            # output biases are k-independent: fold them into the init
            acc_ref[:] = jnp.broadcast_to(
                bias_of(gbc) + bias_of(bc1) + bias_of(bc2),
                acc_ref.shape,
            )

        h = h_ref[:]

        def proj(x_, w_ref, b_ref, with_bias=True):
            """x_ @ w (+ scale) (+ bias) with int8 dequant-by-column."""
            w = w_ref[:].reshape(w_ref.shape[-2], w_ref.shape[-1])
            y = jax.lax.dot_general(
                x_, w.astype(out_dtype) if quantized else w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                scale, bias = sb2(b_ref)
                y = y * scale
                return y + bias if with_bias else y
            if with_bias:
                return y + b_ref[:].reshape(1, -1).astype(jnp.float32)
            return y

        def reglu_chunk(wa_, ba_, wb_, bb_, wc_, bc_):
            """One hidden chunk's contribution: (a_k * relu(b_k)) @ wc_k.
            The chunk's output bias was already folded at init; for the
            quantized path the output-column scale still applies here."""
            a = proj(h, wa_, ba_)
            b = proj(h, wb_, bb_)
            g = (a * jax.nn.relu(b)).astype(out_dtype)
            if quantized:
                scale, _ = sb2(bc_)
                w = wc_[:].reshape(wc_.shape[-2], wc_.shape[-1])
                return jax.lax.dot_general(
                    g, w.astype(out_dtype), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            w = wc_[:].reshape(wc_.shape[-2], wc_.shape[-1])
            return jax.lax.dot_general(
                g, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc_ref[:] += (
            reglu_chunk(gwa, gba, gwb, gbb, gwc, gbc)
            + reglu_chunk(wa1, ba1, wb1, bb1, wc1, bc1)
            + reglu_chunk(wa2, ba2, wb2, bb2, wc2, bc2)
        )

        @pl.when(k == nk - 1)
        def _flush():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _pick_tiles(n: int, c: int, m: int, x_item: int = 2, w_item: int = 2):
    """(tile_rows, hidden_chunk, fits): keep resident weights + tiles
    within ~12MB of VMEM. Small stages run unchunked (nk=1, the round-1
    kernel schedule); C=1024 runs 4 chunks of 256. `fits` is False when
    no (tm, mk) meets the budget (mk floors at 256, tm at 128) — the
    dispatcher must then take the XLA path instead of handing Mosaic a
    kernel that cannot compile.

    x_item/w_item: element sizes of the activations/weights. The budget
    must scale with the REAL dtypes: fp32 training (-fp16 false, the
    reference's default) doubles both, and a hardcoded bf16 budget let
    the C=1024 stage hand Mosaic an 18.5MB kernel (> 16MB scoped VMEM)
    — found by a real fp32 train_ldm run on TPU, 2026-08-18."""
    tm = min(512, n)
    mk = m
    # 3 ReGLUs x (2 [C, mk] + 1 [mk, C]) weight blocks resident,
    # double-buffered by Mosaic while streaming
    weight_bytes = lambda mk_: 9 * c * mk_ * w_item * 2
    # x/mul/bias/h/out row tiles + the fp32 accumulator
    tile_bytes = lambda tm_: tm_ * c * (5 * x_item + 4)
    while weight_bytes(mk) + tile_bytes(tm) > 12 * 1024 * 1024:
        if mk % 2 == 0 and mk > 256:
            mk //= 2
        elif tm > 128:
            tm //= 2
        else:
            break
    fits = weight_bytes(mk) + tile_bytes(tm) <= 12 * 1024 * 1024
    # NOTE (measured, do not "optimize"): growing row tiles beyond 512
    # to cut per-tile weight re-streaming was tried (tm up to 2048 with
    # mk shrunk to fit a 10MB budget) and measured in-model: b64 neutral
    # (16.97 vs 16.91 ms), b1 -4% (3.13 vs 3.27), but b8 REGRESSED 2x
    # (8.43 vs 4.54 ms) — Mosaic's DMA/compute overlap already hides the
    # re-fetches, and the larger tiles cost pipelining granularity. The
    # 512-row tile stands.
    if n <= tm:
        # single row tile: chunk the hidden dim anyway so Mosaic can
        # pipeline the weight DMAs across grid steps — measured ~2x
        # faster weight streaming in the small-batch regime. (With
        # multiple row tiles the k index cycles and chunks would be
        # re-fetched per tile, so only do this when nt == 1.)
        target = 256 if m >= 512 else 128
        if m % target == 0:
            mk = min(mk, target)
    return tm, mk, fits


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "tile_rows", "hidden_chunk", "quantized"),
)
def ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                     wa, ba, wb, bb, wc, bc, expert_ids,
                     interpret: bool = False, tile_rows: int = 0,
                     hidden_chunk: int = 0, quantized: bool = False):
    """x/film_*: [N, C]; expert_ids: int32 [2]. Returns (out, h).

    quantized=True: weights are quantized to per-output-channel int8 in
    XLA (hoisted out of any enclosing scan) and dequantized inside the
    kernel — the scan streams half the weight bytes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    m = wa.shape[-1]
    e = wa.shape[0]
    tm, mk, _ = _pick_tiles(n, c, m, jnp.dtype(x.dtype).itemsize,
                            jnp.dtype(wa.dtype).itemsize)
    if not tile_rows or not hidden_chunk:
        # LDM_FFN_TM / LDM_FFN_MK: tuning-sweep overrides (same pattern
        # as window_attention's LDM_ATTN_TN; benchmarks/attn_inmodel.py)
        import os

        tile_rows = tile_rows or int(os.environ.get("LDM_FFN_TM", "0"))
        hidden_chunk = hidden_chunk or int(os.environ.get("LDM_FFN_MK", "0"))
    if tile_rows:
        tm = min(tile_rows, n)
    if hidden_chunk and m % hidden_chunk == 0:
        mk = hidden_chunk
    pad = (-n) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        film_mul = jnp.pad(film_mul, ((0, pad), (0, 0)))
        film_bias = jnp.pad(film_bias, ((0, pad), (0, 0)))
    nt = (n + pad) // tm
    nk = m // mk

    if quantized:
        gwa, gba = quantize_cols(gwa, gba)   # gba -> [2, m]
        gwb, gbb = quantize_cols(gwb, gbb)
        gwc, gbc = quantize_cols(gwc, gbc)   # gbc -> [2, c]
        wa, ba = quantize_cols(wa, ba)       # ba -> [E, 2, m]
        wb, bb = quantize_cols(wb, bb)
        wc, bc = quantize_cols(wc, bc)       # bc -> [E, 2, c]
    else:
        gba, gbb, gbc = (gba.reshape(1, m), gbb.reshape(1, m),
                         gbc.reshape(1, c))
        ba, bb = ba.reshape(e, 1, m), bb.reshape(e, 1, m)
        bc = bc.reshape(e, 1, c)
    br = 2 if quantized else 1  # bias block rows ([scale; bias] if quant)

    row = lambda: pl.BlockSpec((tm, c), lambda i, k, s: (i, 0),
                               memory_space=pltpu.VMEM)
    # general weights: chunk index on the hidden dim
    g_in = lambda: pl.BlockSpec((c, mk), lambda i, k, s: (0, k),
                                memory_space=pltpu.VMEM)
    g_out = lambda: pl.BlockSpec((mk, c), lambda i, k, s: (k, 0),
                                 memory_space=pltpu.VMEM)
    gb_in = lambda: pl.BlockSpec((br, mk), lambda i, k, s: (0, k),
                                 memory_space=pltpu.VMEM)
    gb_out = lambda: pl.BlockSpec((br, c), lambda i, k, s: (0, 0),
                                  memory_space=pltpu.VMEM)
    # expert-selected slices: scalar-prefetched ids drive the index maps
    e_in = lambda j: pl.BlockSpec((1, c, mk), lambda i, k, s: (s[j], 0, k),
                                  memory_space=pltpu.VMEM)
    e_out = lambda j: pl.BlockSpec((1, mk, c), lambda i, k, s: (s[j], k, 0),
                                   memory_space=pltpu.VMEM)
    # stacked expert biases travel as [E, br, d] so the trailing block
    # dims satisfy the TPU (8, 128) tiling rule
    eb_in = lambda j: pl.BlockSpec((1, br, mk), lambda i, k, s: (s[j], 0, k),
                                   memory_space=pltpu.VMEM)
    eb_out = lambda j: pl.BlockSpec((1, br, c), lambda i, k, s: (s[j], 0, 0),
                                    memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, nk),
        in_specs=[
            row(), row(), row(),
            g_in(), gb_in(), g_in(), gb_in(), g_out(), gb_out(),
            e_in(0), eb_in(0), e_in(0), eb_in(0), e_out(0), eb_out(0),
            e_in(1), eb_in(1), e_in(1), eb_in(1), e_out(1), eb_out(1),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda i, k, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i, k, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
    )
    out, h = pl.pallas_call(
        _kernel(1e-4, x.dtype, quantized),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n + pad, c), x.dtype),
            jax.ShapeDtypeStruct((n + pad, c), x.dtype),
        ],
        interpret=interpret,
    )(
        expert_ids.astype(jnp.int32),
        x, film_mul, film_bias,
        gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc,
        wa, ba, wb, bb, wc, bc,
    )
    return out[:n], h[:n]


def fake_quantize(w, bias):
    """Round-trip through the int8 per-output-channel scheme — the XLA
    reference semantics of `quantized=True` (for CPU fallback/tests).

    Gradients are straight-through to the full-precision weights
    (w + stop_grad(dequant(quant(w)) - w)): differentiating through the
    round() would zero the weight gradient a.e., silently diverging from
    the fused TPU path's full-precision recompute VJP."""
    wq, sb = quantize_cols(w, bias)
    wdq, b = dequantize_cols(wq, sb)
    wdq = wdq.astype(w.dtype)
    b = b.astype(bias.dtype)
    w_ste = w + jax.lax.stop_gradient(wdq - w)
    b_ste = bias + jax.lax.stop_gradient(b - bias)
    return w_ste, b_ste


def ffn_block(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
              wa, ba, wb, bb, wc, bc, expert_ids,
              quantized: bool = False):
    """Dispatcher: Pallas on TPU, XLA composition elsewhere.
    Differentiable (XLA-recompute VJP on the Pallas path; quantized
    gradients are straight-through w.r.t. the full-precision weights).
    Returns (ffn_out, h)."""
    if (
        jax.default_backend() in ("tpu", "axon")
        and x.shape[-1] % 128 == 0
        and wa.shape[-1] % 128 == 0
        # VMEM feasibility at the REAL dtypes: a config no (tile, chunk)
        # schedule fits (e.g. C > 1024, or fp32 at C = 1024) must fall
        # back rather than fail Mosaic compile
        and _pick_tiles(x.shape[0], x.shape[-1], wa.shape[-1],
                        jnp.dtype(x.dtype).itemsize,
                        jnp.dtype(wa.dtype).itemsize)[2]
    ):
        from ldm_image_generator_tpu.kernels.dispatch import pallas_usable

        arrs = (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                wa, ba, wb, bb, wc, bc, expert_ids)
        sig = tuple((a.shape, jnp.dtype(a.dtype).name) for a in arrs) + (
            quantized,
        )
        thunk = lambda: ffn_block_pallas.lower(
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs],
            quantized=quantized,
        ).compile()
        if pallas_usable("ffn_block", sig, thunk):
            return _fused_ffn_block(x, film_mul, film_bias, gwa, gba, gwb,
                                    gbb, gwc, gbc, wa, ba, wb, bb, wc, bc,
                                    expert_ids, quantized)
    if quantized:
        gwa, gba = fake_quantize(gwa, gba)
        gwb, gbb = fake_quantize(gwb, gbb)
        gwc, gbc = fake_quantize(gwc, gbc)
        wa, ba = fake_quantize(wa, ba)
        wb, bb = fake_quantize(wb, bb)
        wc, bc = fake_quantize(wc, bc)
    e1, e2 = expert_ids[0], expert_ids[1]
    # dynamic-index XLA fallback (gathers two expert slices)
    return ffn_block_xla(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc,
                         gbc, wa, ba, wb, bb, wc, bc, e1, e2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16,))
def _fused_ffn_block(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                     wa, ba, wb, bb, wc, bc, expert_ids, quantized):
    return ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb,
                            gwc, gbc, wa, ba, wb, bb, wc, bc, expert_ids,
                            quantized=quantized)


def _ffb_fwd(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
             wa, ba, wb, bb, wc, bc, expert_ids, quantized):
    out = ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb,
                           gwc, gbc, wa, ba, wb, bb, wc, bc, expert_ids,
                           quantized=quantized)
    return out, (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                 wa, ba, wb, bb, wc, bc, expert_ids)


def _ffb_bwd(quantized, res, g):
    (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc, expert_ids) = res
    e1, e2 = expert_ids[0], expert_ids[1]
    _, vjp = jax.vjp(
        lambda *diff: ffn_block_xla(*diff, e1, e2),
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc,
    )
    grads = vjp(g)
    return grads + (None,)


_fused_ffn_block.defvjp(_ffb_fwd, _ffb_bwd)
