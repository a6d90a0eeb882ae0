"""SwinBlock core megakernel (Pallas TPU): norm + FiLM + MoE FFN +
grouped 3x3 conv + residual in ONE kernel.

Covers the whole non-attention body of a SwinBlock (unet.py:38-48
semantics):

    h   = channel_norm(x) * film_mul + film_bias
    out = [x +] ReGLU_general(h) + ReGLU_e1(h) + ReGLU_e2(h) + conv3x3(h)

and returns (out, h) — attention blocks add window-attention(h) outside
(8 of the default 36 blocks), everything else is done when the kernel
returns. Motivation (measured, docs/PERF.md): at batch 1 the denoise
step is dominated by per-op dispatch across ~36 blocks and by HBM
round-trips of h / branch partial sums; at batch 64 the same traffic is
bandwidth. One kernel per block removes both.

Layout strategy:
  * Grid (batch_tiles, hidden_chunks). Each grid step holds `bt` whole
    images [bt, H, W, C] in VMEM, so the 3x3 conv needs no halo
    exchange: spatial pad + 9 shifted slices stay in VMEM (probed: exact
    vs lax.conv on hardware).
  * The conv uses the same 128-wide block-diagonal repack as
    GroupedConv2d (4x nominal FLOPs, ~10x MXU utilization): per output
    block g, sum over 9 taps of shifted_h[:, g*128:(g+1)*128] @ W[t, g].
  * MoE FFN: hidden-dim chunked accumulation with scalar-prefetched
    expert ids exactly as kernels/ffn_block.py; fp32 VMEM accumulator.
  * FiLM tensors arrive at their natural batch (1 during sampling via
    the FiLM schedule cache) and broadcast in VMEM — the unfused path
    materializes the [B, H, W, C] broadcast in HBM.

Differentiable via custom VJP: backward recomputes through the XLA
reference composition (plain grouped lax.conv + matmuls), so training
gradients stay exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.kernels.ffn_block import ffn_block_xla


def block_core_xla(x, film_mul, film_bias,
                   gwa, gba, gwb, gbb, gwc, gbc,
                   wa, ba, wb, bb, wc, bc,
                   conv_kernel, conv_bias, e1, e2,
                   add_residual: bool = True):
    """Reference composition. x/film: [B,H,W,C]; conv_kernel:
    [3, 3, gw, C] grouped-HWIO (GroupedConv2d layout). Returns (out, h)
    with out = [x +] ffn(h) + conv(h)."""
    b, hh, ww, c = x.shape
    rows = lambda v: jnp.broadcast_to(v, x.shape).reshape(-1, c)
    ffn, h = ffn_block_xla(
        x.reshape(-1, c), rows(film_mul), rows(film_bias),
        gwa, gba, gwb, gbb, gwc, gbc, wa, ba, wb, bb, wc, bc, e1, e2,
    )
    h4 = h.reshape(x.shape)
    gw = conv_kernel.shape[2]
    # fp32 for BOTH conv operands: mixing a bf16 kernel with the fp32
    # cotangent (preferred_element_type) makes lax.conv's transpose rule
    # raise under jax.vjp — hit by the b<=2 bf16 TRAINING path, whose
    # custom VJP recomputes through this composition (_bc_bwd). This is
    # the fallback/backward path only; the fused kernel serves the fwd.
    conv = jax.lax.conv_general_dilated(
        h4.astype(jnp.float32), conv_kernel.astype(jnp.float32),
        (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c // gw,
    ) + conv_bias.astype(jnp.float32)
    out = ffn.reshape(x.shape).astype(jnp.float32) + conv
    if add_residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype), h4


def repack_conv_blocks(conv_kernel: jnp.ndarray, pw: int = 128):
    """[3, 3, gw, C] grouped kernel -> [9 * (C//pw), pw, pw] block-
    diagonal tap matrices (the GroupedConv2d repack, reshaped for
    per-tap per-block matmuls inside the kernel)."""
    kh, kw, gw, c = conv_kernel.shape
    gb = c // pw
    if gw == pw:
        wbig = conv_kernel
    else:
        m = pw // gw
        eye = jnp.eye(m, dtype=conv_kernel.dtype)
        wr = conv_kernel.reshape(kh, kw, gw, gb, m, gw)
        wbig = jnp.einsum("hwibqo,pq->hwpibqo", wr, eye).reshape(
            kh, kw, pw, c
        )
    # [3,3,pw,C] -> [9, pw, gb, pw] -> [9*gb, pw, pw]
    return (
        wbig.reshape(kh * kw, pw, gb, pw)
        .transpose(0, 2, 1, 3)
        .reshape(kh * kw * gb, pw, pw)
    )


def _kernel(eps, out_dtype, bt, hh, ww, c, gb, film_b1, add_residual,
            quantized=False):
    rows = bt * hh * ww

    def kernel(sidx, x_ref, mul_ref, bias_ref,
               gwa, gba, gwb, gbb, gwc, gbc,
               wa1, ba1, wb1, bb1, wc1, bc1,
               wa2, ba2, wb2, bb2, wc2, bc2,
               wconv, bconv,
               out_ref, h_ref, acc_ref):
        from jax.experimental import pallas as pl

        k = pl.program_id(1)
        nk = pl.num_programs(1)

        def sb2(ref):
            v = ref[:].reshape(2, ref.shape[-1])
            return v[0:1, :], v[1:2, :]

        def bias_of(ref):
            if quantized:
                return sb2(ref)[1]
            return ref[:].reshape(1, -1).astype(jnp.float32)

        @pl.when(k == 0)
        def _init():
            xf = x_ref[:].astype(jnp.float32)
            xr = xf.reshape(rows, c)
            mean = jnp.mean(xr, axis=-1, keepdims=True)
            var = jnp.var(xr, axis=-1, keepdims=True, ddof=1)
            hn = (xr - mean) * jax.lax.rsqrt(var + eps)
            mul4 = mul_ref[:].astype(jnp.float32)
            bia4 = bias_ref[:].astype(jnp.float32)
            if film_b1:
                mul4 = jnp.broadcast_to(mul4, (bt, hh, ww, c))
                bia4 = jnp.broadcast_to(bia4, (bt, hh, ww, c))
            h = (
                hn * mul4.reshape(rows, c) + bia4.reshape(rows, c)
            ).astype(out_dtype)
            h_ref[:] = h.reshape(bt, hh, ww, c)

            # 3x3 block-diagonal grouped conv, 9 shifted-slice matmuls
            hp = jnp.pad(
                h.reshape(bt, hh, ww, c), ((0, 0), (1, 1), (1, 1), (0, 0))
            )
            conv = jnp.zeros((rows, c), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    sh = hp[:, ky:ky + hh, kx:kx + ww, :].reshape(rows, c)
                    parts = []
                    for g in range(gb):
                        blk = wconv[(ky * 3 + kx) * gb + g]
                        parts.append(jax.lax.dot_general(
                            sh[:, g * 128:(g + 1) * 128], blk,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                    conv = conv + (
                        parts[0] if gb == 1
                        else jnp.concatenate(parts, axis=-1)
                    )

            base = conv + bconv[:].reshape(1, c).astype(jnp.float32) + (
                bias_of(gbc) + bias_of(bc1) + bias_of(bc2)
            )
            if add_residual:
                base = base + xr
            acc_ref[:] = base

        h = h_ref[:].reshape(rows, c)

        def proj(x_, w_ref, b_ref):
            w = w_ref[:].reshape(w_ref.shape[-2], w_ref.shape[-1])
            y = jax.lax.dot_general(
                x_, w.astype(out_dtype) if quantized else w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                scale, bias = sb2(b_ref)
                return y * scale + bias
            return y + b_ref[:].reshape(1, -1).astype(jnp.float32)

        def reglu_chunk(wa_, ba_, wb_, bb_, wc_, bc_):
            a = proj(h, wa_, ba_)
            b = proj(h, wb_, bb_)
            g = (a * jax.nn.relu(b)).astype(out_dtype)
            w = wc_[:].reshape(wc_.shape[-2], wc_.shape[-1])
            y = jax.lax.dot_general(
                g, w.astype(out_dtype) if quantized else w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                y = y * sb2(bc_)[0]
            return y

        acc_ref[:] += (
            reglu_chunk(gwa, gba, gwb, gbb, gwc, gbc)
            + reglu_chunk(wa1, ba1, wb1, bb1, wc1, bc1)
            + reglu_chunk(wa2, ba2, wb2, bb2, wc2, bc2)
        )

        @pl.when(k == nk - 1)
        def _flush():
            out_ref[:] = acc_ref[:].reshape(bt, hh, ww, c).astype(out_dtype)

    return kernel


def _row_kernel(eps, out_dtype, th, w, c, gb, nr, film_b1, add_residual,
                quantized=False):
    """Row-banded variant: each grid step holds a [th, W, C] horizontal
    band; the 3x3 conv's one-row halo comes from NEIGHBOR-indexed block
    refs of the same x/film arrays (up/down bands, clamped at the image
    edge and zeroed in-kernel to match SAME padding). Bands' h halo rows
    are recomputed locally (norm+FiLM are row-local), so no cross-band
    communication exists and the band grid parallelizes freely."""
    rows = th * w

    def kernel(sidx, x_ref, xu_ref, xd_ref, mul_ref, mu_ref, md_ref,
               bias_ref, bu_ref, bd_ref,
               gwa, gba, gwb, gbb, gwc, gbc,
               wa1, ba1, wb1, bb1, wc1, bc1,
               wa2, ba2, wb2, bb2, wc2, bc2,
               wconv, bconv,
               out_ref, h_ref, acc_ref):
        from jax.experimental import pallas as pl

        k = pl.program_id(1)
        nk = pl.num_programs(1)
        ri = pl.program_id(0) % nr

        def sb2(ref):
            v = ref[:].reshape(2, ref.shape[-1])
            return v[0:1, :], v[1:2, :]

        def bias_of(ref):
            if quantized:
                return sb2(ref)[1]
            return ref[:].reshape(1, -1).astype(jnp.float32)

        def norm_film(x2, mul2, bia2):
            """x2/mul2/bia2: [rows', C] fp32 -> h rows."""
            mean = jnp.mean(x2, axis=-1, keepdims=True)
            var = jnp.var(x2, axis=-1, keepdims=True, ddof=1)
            hn = (x2 - mean) * jax.lax.rsqrt(var + eps)
            return (hn * mul2 + bia2).astype(out_dtype)

        @pl.when(k == 0)
        def _init():
            film = lambda ref, r0, r1: (
                ref[:].astype(jnp.float32)[0, r0:r1].reshape(-1, c)
            )
            h = norm_film(
                x_ref[:].astype(jnp.float32).reshape(rows, c),
                film(mul_ref, 0, th), film(bias_ref, 0, th),
            )
            h_ref[:] = h.reshape(1, th, w, c)

            # halo rows: last row of the band above, first row of the
            # band below (refs are edge-clamped; zero them at the image
            # boundary to reproduce SAME conv padding)
            top = norm_film(
                xu_ref[:].astype(jnp.float32)[0, th - 1].reshape(w, c),
                film(mu_ref, th - 1, th), film(bu_ref, th - 1, th),
            ) * jnp.where(ri == 0, 0.0, 1.0).astype(out_dtype)
            bot = norm_film(
                xd_ref[:].astype(jnp.float32)[0, 0].reshape(w, c),
                film(md_ref, 0, 1), film(bd_ref, 0, 1),
            ) * jnp.where(ri == nr - 1, 0.0, 1.0).astype(out_dtype)

            hp = jnp.concatenate(
                [top.reshape(1, w, c), h.reshape(th, w, c),
                 bot.reshape(1, w, c)], axis=0,
            )
            hp = jnp.pad(hp, ((0, 0), (1, 1), (0, 0)))  # [th+2, W+2, C]
            conv = jnp.zeros((rows, c), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    sh = hp[ky:ky + th, kx:kx + w, :].reshape(rows, c)
                    parts = []
                    for g in range(gb):
                        blk = wconv[(ky * 3 + kx) * gb + g]
                        parts.append(jax.lax.dot_general(
                            sh[:, g * 128:(g + 1) * 128], blk,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ))
                    conv = conv + (
                        parts[0] if gb == 1
                        else jnp.concatenate(parts, axis=-1)
                    )

            base = conv + bconv[:].reshape(1, c).astype(jnp.float32) + (
                bias_of(gbc) + bias_of(bc1) + bias_of(bc2)
            )
            if add_residual:
                base = base + x_ref[:].astype(jnp.float32).reshape(rows, c)
            acc_ref[:] = base

        h = h_ref[:].reshape(rows, c)

        def proj(x_, w_ref, b_ref):
            w_ = w_ref[:].reshape(w_ref.shape[-2], w_ref.shape[-1])
            y = jax.lax.dot_general(
                x_, w_.astype(out_dtype) if quantized else w_,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                scale, bias = sb2(b_ref)
                return y * scale + bias
            return y + b_ref[:].reshape(1, -1).astype(jnp.float32)

        def reglu_chunk(wa_, ba_, wb_, bb_, wc_, bc_):
            a = proj(h, wa_, ba_)
            b = proj(h, wb_, bb_)
            g = (a * jax.nn.relu(b)).astype(out_dtype)
            w_ = wc_[:].reshape(wc_.shape[-2], wc_.shape[-1])
            y = jax.lax.dot_general(
                g, w_.astype(out_dtype) if quantized else w_,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quantized:
                y = y * sb2(bc_)[0]
            return y

        acc_ref[:] += (
            reglu_chunk(gwa, gba, gwb, gbb, gwc, gbc)
            + reglu_chunk(wa1, ba1, wb1, bb1, wc1, bc1)
            + reglu_chunk(wa2, ba2, wb2, bb2, wc2, bc2)
        )

        @pl.when(k == nk - 1)
        def _flush():
            out_ref[:] = acc_ref[:].reshape(1, th, w, c).astype(out_dtype)

    return kernel


def _pick_tiles(b: int, hw: int, c: int, m: int, film_b1: bool):
    """(batch_tile, hidden_chunk, fits) against the 16MB scoped-VMEM
    limit, using a VERIFIED-ENVELOPE rule rather than an analytic
    model: Mosaic's kernel-stack temporaries (fp32 norm/film
    intermediates, the padded conv input, per-tap shifted slices and —
    for multi-group convs — the per-tap column concats) dominate the
    blocks-only estimate and proved hard to predict. Observed on
    hardware:

      * C=128 (single 128-group conv, no concat): tiles up to
        rows*C = 512K elems compile (b1 latent-64) — cap there.
      * C>=256 (gb>=2): rows*C = 262K OOMed at 16.43MB (b2 512px
        C=256 stage); everything at rows*C <= 64K has compiled and run
        repeatedly (all latent-32 b<=2 stages) — cap at 64K.
      * FFN weights stream in hidden chunks; 9*C*mk*2 resident bf16
        bytes capped at ~10MB (C=1024 runs mk=256 = 9.4MB)."""
    gb = c // 128
    # chunk the hidden dim so Mosaic pipelines the weight DMAs (see
    # ffn_block._pick_tiles: ~2x streaming in the small-batch regime;
    # at this kernel's b <= 2 gate the nb<=2 chunk re-fetch is cheap)
    mk = m
    target = 256 if m >= 512 else 128
    if m % target == 0:
        mk = min(mk, target)

    def ok(bt_):
        if gb <= 1:
            # single-group conv (no per-tap concat): verified up to
            # rows*C = 512K elems (b1 latent-64 C=128 compiles ~15.5MB)
            return bt_ * hw * c <= 524288
        # multi-group: fp32 per-tap temporaries measure ~90B/elem
        # (C=1024: rows 16 -> ~12.2MB vs rows 64 -> 16.5MB OOM;
        # C=256: rows 1024 -> 16.43MB OOM). Weights resident once,
        # conv taps double-buffered.
        est = (9 * c * mk * 2 + 9 * c * 128 * 2 * 2
               + bt_ * hw * c * 90)
        return est <= 14 * 1024 * 1024

    bt = b
    while bt > 1 and not ok(bt):
        bt //= 2
    fits = ok(bt) and 9 * c * mk * 2 <= 10 * 1024 * 1024
    return bt, mk, fits


def _pick_row_tile(hh: int, ww: int, c: int, m: int):
    """(row_tile, hidden_chunk, fits) for the row-banded schedule
    (bt = 1 per band): used when a whole image exceeds the VMEM
    envelope. Same verified 90B/elem temporaries rule as _pick_tiles,
    applied to a (th+2)-row band (the two halo rows live in VMEM during
    the conv assembly). th must divide H so bands tile exactly."""
    gb = c // 128
    mk = m
    target = 256 if m >= 512 else 128
    if m % target == 0:
        mk = min(mk, target)
    weights = 9 * c * mk * 2 + 9 * gb * 128 * 128 * 2 * 2

    def ok(th_):
        return weights + (th_ + 2) * ww * c * 90 <= 14 * 1024 * 1024

    import os

    if os.environ.get("LDM_BC_NO_ROWS", "").strip() in ("1", "true"):
        return 0, mk, False  # A/B gate (benchmarks/bc_rows_probe.py)
    th = hh // 2  # whole image already failed; start from half
    while th > 1 and (hh % th or not ok(th)):
        th //= 2
    fits = th >= 1 and hh % th == 0 and ok(th) and (
        9 * c * mk * 2 <= 10 * 1024 * 1024
    )
    return th, mk, fits


def block_core_supported(x_shape, hidden: int, group_width: int,
                         film_batch: int, dtype=None) -> bool:
    """Whether the megakernel is the right backend for this shape.

    Measured regime split (docs/PERF.md): the whole-block kernel wins
    where per-op dispatch dominates — batch <= 2 denoise steps (b1
    latent-32 1.91 -> 1.72 ms/step; b1 latent-64 2.95 -> 2.30) — and
    loses at larger batches where XLA's batched grouped conv is already
    compute-efficient (b8 3.44 -> 3.67; b64 regressed). Larger batches
    use the fused-FFN kernel + XLA conv instead. Shapes whose whole
    image exceeds the VMEM envelope (latent-64 C>=256 stages) run the
    row-banded schedule (_row_kernel) instead of falling back."""
    b, hh, ww, c = x_shape
    if dtype is not None and jnp.dtype(dtype).itemsize != 2:
        # the VMEM envelope above is CALIBRATED on bf16 operands
        # (observed Mosaic compiles); fp32 (-fp16 false) doubles every
        # term and was never measured — take the XLA path
        return False
    if not (
        jax.default_backend() in ("tpu", "axon")
        and b <= 2
        and c % 128 == 0
        and hidden % 128 == 0
        and 128 % group_width == 0
    ):
        return False
    if _pick_tiles(b, hh * ww, c, hidden, film_batch == 1)[2]:
        return True
    return _pick_row_tile(hh, ww, c, hidden)[2]


@functools.partial(
    jax.jit,
    static_argnames=("add_residual", "interpret", "batch_tile", "quantized",
                     "row_tile"),
)
def block_core_pallas(x, film_mul, film_bias,
                      gwa, gba, gwb, gbb, gwc, gbc,
                      wa, ba, wb, bb, wc, bc,
                      conv_kernel, conv_bias, expert_ids,
                      add_residual: bool = True,
                      interpret: bool = False,
                      batch_tile: int = 0,
                      quantized: bool = False,
                      row_tile: int = 0):
    """x: [B,H,W,C]; film_mul/bias: [1 or B, H, W, C]; conv_kernel:
    [3,3,gw,C]; expert_ids: int32 [2]. Returns (out, h), both [B,H,W,C].

    quantized=True: per-output-channel int8 FFN weights, quantized in
    XLA (hoisted out of an enclosing scan) and dequantized in-kernel —
    the scan streams half the FFN weight bytes. Conv stays bf16 (tiny).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ldm_image_generator_tpu.kernels.ffn_block import quantize_cols

    b, hh, ww, c = x.shape
    m = wa.shape[-1]
    e = wa.shape[0]
    film_b1 = film_mul.shape[0] == 1
    bt, mk, fits_whole = _pick_tiles(b, hh * ww, c, m, film_b1)
    if not row_tile and not fits_whole and not batch_tile:
        # whole images exceed the VMEM envelope: row-banded schedule
        row_tile, mk, fits_rows = _pick_row_tile(hh, ww, c, m)
        if not fits_rows:
            row_tile = 0
    if row_tile and hh % row_tile:
        row_tile = 0
    if batch_tile:
        bt = batch_tile
    while b % bt:
        bt -= 1
    nb = b // bt
    nk = m // mk
    gb = c // 128
    wblk = repack_conv_blocks(conv_kernel.astype(x.dtype))

    if quantized:
        gwa, gba = quantize_cols(gwa, gba)
        gwb, gbb = quantize_cols(gwb, gbb)
        gwc, gbc = quantize_cols(gwc, gbc)
        wa, ba = quantize_cols(wa, ba)
        wb, bb = quantize_cols(wb, bb)
        wc, bc = quantize_cols(wc, bc)
    else:
        gba, gbb, gbc = (gba.reshape(1, m), gbb.reshape(1, m),
                         gbc.reshape(1, c))
        ba, bb = ba.reshape(e, 1, m), bb.reshape(e, 1, m)
        bc = bc.reshape(e, 1, c)
    br = 2 if quantized else 1

    if row_tile:
        th = row_tile
        nr = hh // th
        rb = lambda ridx: pl.BlockSpec(
            (1, th, ww, c),
            lambda i, k, s, _r=ridx: (i // nr, _r(i % nr), 0, 0),
            memory_space=pltpu.VMEM,
        )
        fb = lambda ridx: pl.BlockSpec(
            (1, th, ww, c),
            (lambda i, k, s, _r=ridx: (0, _r(i % nr), 0, 0)) if film_b1
            else (lambda i, k, s, _r=ridx: (i // nr, _r(i % nr), 0, 0)),
            memory_space=pltpu.VMEM,
        )
        mid = lambda r: r
        up = lambda r: jnp.maximum(r - 1, 0)
        dn = lambda r: jnp.minimum(r + 1, nr - 1)
        g_in_r = lambda: pl.BlockSpec((c, mk), lambda i, k, s: (0, k),
                                      memory_space=pltpu.VMEM)
        g_out_r = lambda: pl.BlockSpec((mk, c), lambda i, k, s: (k, 0),
                                       memory_space=pltpu.VMEM)
        gb_in_r = lambda: pl.BlockSpec((br, mk), lambda i, k, s: (0, k),
                                       memory_space=pltpu.VMEM)
        gb_out_r = lambda: pl.BlockSpec((br, c), lambda i, k, s: (0, 0),
                                        memory_space=pltpu.VMEM)
        e_in_r = lambda j: pl.BlockSpec(
            (1, c, mk), lambda i, k, s: (s[j], 0, k),
            memory_space=pltpu.VMEM)
        e_out_r = lambda j: pl.BlockSpec(
            (1, mk, c), lambda i, k, s: (s[j], k, 0),
            memory_space=pltpu.VMEM)
        eb_in_r = lambda j: pl.BlockSpec(
            (1, br, mk), lambda i, k, s: (s[j], 0, k),
            memory_space=pltpu.VMEM)
        eb_out_r = lambda j: pl.BlockSpec(
            (1, br, c), lambda i, k, s: (s[j], 0, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * nr, nk),
            in_specs=[
                rb(mid), rb(up), rb(dn), fb(mid), fb(up), fb(dn),
                fb(mid), fb(up), fb(dn),
                g_in_r(), gb_in_r(), g_in_r(), gb_in_r(), g_out_r(),
                gb_out_r(),
                e_in_r(0), eb_in_r(0), e_in_r(0), eb_in_r(0), e_out_r(0),
                eb_out_r(0),
                e_in_r(1), eb_in_r(1), e_in_r(1), eb_in_r(1), e_out_r(1),
                eb_out_r(1),
                pl.BlockSpec(wblk.shape, lambda i, k, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i, k, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, ww, c), lambda i, k, s:
                             (i // nr, i % nr, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, ww, c), lambda i, k, s:
                             (i // nr, i % nr, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((th * ww, c), jnp.float32)],
        )
        out, h = pl.pallas_call(
            _row_kernel(1e-4, x.dtype, th, ww, c, gb, nr, film_b1,
                        add_residual, quantized),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
                jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
            ],
            interpret=interpret,
        )(
            expert_ids.astype(jnp.int32),
            x, x, x, film_mul, film_mul, film_mul,
            film_bias, film_bias, film_bias,
            gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc,
            wa, ba, wb, bb, wc, bc,
            wblk, conv_bias.reshape(1, c),
        )
        return out, h

    img = lambda: pl.BlockSpec((bt, hh, ww, c), lambda i, k, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    film = lambda: pl.BlockSpec(
        (1 if film_b1 else bt, hh, ww, c),
        (lambda i, k, s: (0, 0, 0, 0)) if film_b1
        else (lambda i, k, s: (i, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    g_in = lambda: pl.BlockSpec((c, mk), lambda i, k, s: (0, k),
                                memory_space=pltpu.VMEM)
    g_out = lambda: pl.BlockSpec((mk, c), lambda i, k, s: (k, 0),
                                 memory_space=pltpu.VMEM)
    gb_in = lambda: pl.BlockSpec((br, mk), lambda i, k, s: (0, k),
                                 memory_space=pltpu.VMEM)
    gb_out = lambda: pl.BlockSpec((br, c), lambda i, k, s: (0, 0),
                                  memory_space=pltpu.VMEM)
    e_in = lambda j: pl.BlockSpec((1, c, mk), lambda i, k, s: (s[j], 0, k),
                                  memory_space=pltpu.VMEM)
    e_out = lambda j: pl.BlockSpec((1, mk, c), lambda i, k, s: (s[j], k, 0),
                                   memory_space=pltpu.VMEM)
    eb_in = lambda j: pl.BlockSpec((1, br, mk), lambda i, k, s: (s[j], 0, k),
                                   memory_space=pltpu.VMEM)
    eb_out = lambda j: pl.BlockSpec((1, br, c), lambda i, k, s: (s[j], 0, 0),
                                    memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nk),
        in_specs=[
            img(), film(), film(),
            g_in(), gb_in(), g_in(), gb_in(), g_out(), gb_out(),
            e_in(0), eb_in(0), e_in(0), eb_in(0), e_out(0), eb_out(0),
            e_in(1), eb_in(1), e_in(1), eb_in(1), e_out(1), eb_out(1),
            pl.BlockSpec(wblk.shape, lambda i, k, s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, k, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, hh, ww, c), lambda i, k, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hh, ww, c), lambda i, k, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((bt * hh * ww, c), jnp.float32)],
    )
    out, h = pl.pallas_call(
        _kernel(1e-4, x.dtype, bt, hh, ww, c, gb, film_b1, add_residual,
                quantized),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), x.dtype),
        ],
        interpret=interpret,
    )(
        expert_ids.astype(jnp.int32),
        x, film_mul, film_bias,
        gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc,
        wa, ba, wb, bb, wc, bc,
        wblk, conv_bias.reshape(1, c),
    )
    return out, h


def block_core(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
               wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids,
               add_residual: bool = True, quantized: bool = False):
    """Dispatcher: Pallas megakernel on TPU when shapes qualify, XLA
    composition elsewhere. Differentiable (XLA-recompute VJP on the
    Pallas path). Returns (out, h)."""
    if block_core_supported(x.shape, wa.shape[-1], conv_kernel.shape[2],
                            film_mul.shape[0]):
        from ldm_image_generator_tpu.kernels.dispatch import pallas_usable

        arrs = (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids)
        sig = tuple((a.shape, jnp.dtype(a.dtype).name) for a in arrs) + (
            add_residual, quantized,
        )
        thunk = lambda: block_core_pallas.lower(
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrs],
            add_residual=add_residual, quantized=quantized,
        ).compile()
        if pallas_usable("block_core", sig, thunk):
            return _fused_block_core(
                x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids,
                add_residual, quantized,
            )
    if quantized:
        from ldm_image_generator_tpu.kernels.ffn_block import fake_quantize

        gwa, gba = fake_quantize(gwa, gba)
        gwb, gbb = fake_quantize(gwb, gbb)
        gwc, gbc = fake_quantize(gwc, gbc)
        wa, ba = fake_quantize(wa, ba)
        wb, bb = fake_quantize(wb, bb)
        wc, bc = fake_quantize(wc, bc)
    return block_core_xla(
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias,
        expert_ids[0], expert_ids[1], add_residual,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(18, 19))
def _fused_block_core(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                      wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias,
                      expert_ids, add_residual, quantized):
    return block_core_pallas(
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids,
        add_residual=add_residual, quantized=quantized,
    )


def _bc_fwd(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
            wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids,
            add_residual, quantized):
    out = block_core_pallas(
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids,
        add_residual=add_residual, quantized=quantized,
    )
    return out, (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                 wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids)


def _bc_bwd(add_residual, quantized, res, g):
    (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias, expert_ids) = res
    e1, e2 = expert_ids[0], expert_ids[1]
    # film tensors may be batch-broadcast inside; vjp against the
    # original (possibly batch-1) shapes sums the cotangents correctly
    _, vjp = jax.vjp(
        lambda *diff: block_core_xla(*diff, e1, e2, add_residual),
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc, conv_kernel, conv_bias,
    )
    grads = vjp(g)
    return grads + (None,)


_fused_block_core.defvjp(_bc_fwd, _bc_bwd)
