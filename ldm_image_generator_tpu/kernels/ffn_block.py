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


def _bwd_kernel(out_dtype):
    """Backward of the FFN tower given h (saved from the forward — it is
    a forward OUTPUT, so saving it is free) and the out-cotangent g:

        per ReGLU r:  a_r = h @ wa_r + ba_r ; b_r = h @ wb_r + bb_r
                      dg_r   = g @ wc_r^T
                      da_r   = dg_r * relu(b_r)
                      db_r   = dg_r * a_r * [b_r > 0]
                      dwc_r += (a_r * relu(b_r))^T @ g
                      dwa_r += h^T @ da_r ;  dwb_r += h^T @ db_r
                      dba_r += sum_rows(da_r) ; dbb_r += sum_rows(db_r)
                      dh    += da_r @ wa_r^T + db_r @ wb_r^T

    Same 24-matmul FLOP count as the XLA-recompute VJP (6 recompute +
    18 grad matmuls), but a/b/dg/da/db live only in VMEM and the weight
    grads accumulate in fp32 VMEM blocks across row tiles — none of the
    [N, M] intermediates ever round-trips HBM. Grid is (nk, nt) with the
    hidden chunk OUTER so each weight-grad block stays resident while
    every row tile streams past; dh is emitted as per-chunk partials
    [nk, N, C] and summed (with the h-output cotangent) in XLA.
    """

    def kernel(sidx, h_ref, g_ref,
               gwa, gba, gwb, gbb, gwc,
               wa1, ba1, wb1, bb1, wc1,
               wa2, ba2, wb2, bb2, wc2,
               dgwa, dgba, dgwb, dgbb, dgwc,
               dwa1, dba1, dwb1, dbb1, dwc1,
               dwa2, dba2, dwb2, dbb2, dwc2,
               dh_ref, *scratch):
        from jax.experimental import pallas as pl

        i = pl.program_id(1)
        nt = pl.num_programs(1)

        h = h_ref[:]
        g = g_ref[:]
        gf = g.astype(out_dtype)

        def mm(x_, w_, contract_x=1, contract_w=0):
            return jax.lax.dot_general(
                x_, w_, (((contract_x,), (contract_w,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # Weight grads accumulate in PERSISTENT VMEM SCRATCH and each
        # output block is written exactly once (at the last row tile).
        # Accumulating directly on output refs computed wrong values on
        # hardware whenever BOTH grid dims were > 1 (verified
        # 2026-08-18: nt>1 or nk>1 alone exact, nt>1 AND nk>1 off by up
        # to 50% — Mosaic mis-schedules revisited accumulating outputs
        # when sibling outputs advance every step). Scratch persists
        # across grid steps by construction, so this is layout-safe.
        def bias_row(ref):
            # bias inputs travel as 8-sublane blocks (row 0 = bias,
            # rows 1-7 zero padding): 1-sublane INPUT blocks whose
            # block index advances along the lane axis are mis-DMAed on
            # this Mosaic build, exactly like the 1-row accumulating
            # OUTPUT blocks (bisected 2026-08-18: repro4 without bias
            # inputs exact, repro5 adding (1, mk) bias blocks wrong)
            r = ref[:].reshape(-1, ref.shape[-1])
            return r[0:1].astype(jnp.float32)

        def reglu_bwd(wa_, ba_, wb_, bb_, wc_,
                      dwa_, dba_, dwb_, dbb_, dwc_,
                      swa, sba, swb, sbb, swc):
            wa2d = wa_[:].reshape(wa_.shape[-2], wa_.shape[-1])
            wb2d = wb_[:].reshape(wb_.shape[-2], wb_.shape[-1])
            wc2d = wc_[:].reshape(wc_.shape[-2], wc_.shape[-1])
            a = mm(h, wa2d) + bias_row(ba_)
            b = mm(h, wb2d) + bias_row(bb_)
            relu_b = jnp.maximum(b, 0.0)
            dg = mm(gf, wc2d, contract_x=1, contract_w=1)  # [tm, mk]
            da = (dg * relu_b).astype(out_dtype)
            db = (dg * a * (b > 0.0)).astype(out_dtype)
            gate = (a * relu_b).astype(out_dtype)

            @pl.when(i == 0)
            def _init():
                swa[:] = jnp.zeros_like(swa)
                swb[:] = jnp.zeros_like(swb)
                swc[:] = jnp.zeros_like(swc)
                sba[:] = jnp.zeros_like(sba)
                sbb[:] = jnp.zeros_like(sbb)

            swa[:] += mm(h, da, contract_x=0, contract_w=0)
            swb[:] += mm(h, db, contract_x=0, contract_w=0)
            swc[:] += mm(gate, gf, contract_x=0, contract_w=0)
            # bias grads: row-sum as a ones-matmul on the MXU. An
            # in-kernel jnp.sum(axis=0) into a 1-row block computed
            # WRONG values on hardware (verified 2026-08-18; interpret
            # mode agrees with XLA). Every row of the (8, mk) block
            # holds the sum; row 0 is sliced in XLA.
            ones8 = jnp.ones((8, h.shape[0]), da.dtype)
            sba[:] += mm(ones8, da)
            sbb[:] += mm(ones8, db)

            @pl.when(i == nt - 1)
            def _flush():
                dwa_[:] = swa[:].reshape(dwa_.shape)
                dwb_[:] = swb[:].reshape(dwb_.shape)
                dwc_[:] = swc[:].reshape(dwc_.shape)
                dba_[:] = sba[:].reshape(dba_.shape)
                dbb_[:] = sbb[:].reshape(dbb_.shape)

            # dh contribution: da @ wa^T + db @ wb^T (contract hidden)
            return (mm(da, wa2d, contract_x=1, contract_w=1)
                    + mm(db, wb2d, contract_x=1, contract_w=1))

        dh = reglu_bwd(gwa, gba, gwb, gbb, gwc,
                       dgwa, dgba, dgwb, dgbb, dgwc, *scratch[0:5])
        dh += reglu_bwd(wa1, ba1, wb1, bb1, wc1,
                        dwa1, dba1, dwb1, dbb1, dwc1, *scratch[5:10])
        dh += reglu_bwd(wa2, ba2, wb2, bb2, wc2,
                        dwa2, dba2, dwb2, dbb2, dwc2, *scratch[10:15])
        dh_ref[:] = dh.astype(out_dtype).reshape(dh_ref.shape)

    return kernel


def _pick_bwd_tiles(n: int, c: int, m: int):
    """(tile_rows, hidden_chunk, fits) for the backward kernel.

    VERIFIED ENVELOPE (hardware Mosaic compiles, 2026-08-18): Mosaic
    double-buffers OUTPUT blocks as well as inputs, so the fp32
    weight-grad accumulators count at 8B/elem, the bf16 weight chunks
    at 4B/elem: 9*c*mk*12 total. Observed: C=512 mk=256 (14.2MB) and
    C=1024 mk=128 (14.2MB) crash the remote compile helper; C=512
    mk=128 / C=256 mk=256 / C=128 mk=128 (<=10.2MB) compile and run.
    mk floors at 64 (half-lane matmuls beat falling back entirely);
    below that `fits` is False and the dispatcher keeps the
    XLA-recompute VJP.

    C=1024 crashes the remote Mosaic compile at EVERY probed tiling
    (mk 64/128/256, tm 128/256) including well-under-budget ones —
    suspected internal limit on the dim-0-contraction (h^T @ da) with
    1024-wide operands. Gated to the XLA fallback; that stage is ~6% of
    the b64 backward FLOPs (6 blocks at N=1024 rows)."""
    if c > 512:
        return min(512, n), m, False
    tm = min(512, n)
    mk = m
    # bf16 weight chunks (x2 dbuf) + fp32 out blocks (x2) + fp32 scratch
    weight_bytes = lambda mk_: 9 * c * mk_ * 16
    tile_bytes = lambda tm_: tm_ * c * 12  # h,g dbuf + dh partial dbuf
    while weight_bytes(mk) + tile_bytes(tm) > 12 * 1024 * 1024:
        if mk % 2 == 0 and mk > 64:
            mk //= 2
        elif tm > 128:
            tm //= 2
        else:
            break
    fits = weight_bytes(mk) + tile_bytes(tm) <= 12 * 1024 * 1024
    return tm, mk, fits


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile_rows", "hidden_chunk"),
)
def ffn_block_bwd_pallas(h, g, gwa, gba, gwb, gbb, gwc,
                         wa, ba, wb, bb, wc, expert_ids,
                         interpret: bool = False, tile_rows: int = 0,
                         hidden_chunk: int = 0):
    """h, g: [N, C] (saved forward output h and the out-cotangent).
    Returns (dh, dgwa, dgba, dgwb, dgbb, dgwc, dwa_s0, dba_s0, dwb_s0,
    dbb_s0, dwc_s0, dwa_s1, ..., dwc_s1): dh [N, C] in h.dtype, weight
    grads fp32 (accumulated in fp32; the caller casts/scatters)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = h.shape
    m = wa.shape[-1]
    e = wa.shape[0]
    tm, mk, _ = _pick_bwd_tiles(n, c, m)
    if tile_rows:
        tm = min(tile_rows, n)
    if hidden_chunk and m % hidden_chunk == 0:
        mk = hidden_chunk
    pad = (-n) % tm
    if pad:
        # zero cotangent rows contribute nothing to the weight grads
        h = jnp.pad(h, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    nt = (n + pad) // tm
    nk = m // mk

    # biases padded to 8 sublanes (row 0 = bias): see bias_row in the
    # kernel — 1-sublane input blocks are mis-DMAed on this Mosaic build
    gba2 = jnp.pad(gba.reshape(1, m), ((0, 7), (0, 0)))
    gbb2 = jnp.pad(gbb.reshape(1, m), ((0, 7), (0, 0)))
    ba2 = jnp.pad(ba.reshape(e, 1, m), ((0, 0), (0, 7), (0, 0)))
    bb2 = jnp.pad(bb.reshape(e, 1, m), ((0, 0), (0, 7), (0, 0)))

    def ser(k, i):
        # Serpentine row order: forward on even hidden chunks, reverse
        # on odd, so neither the h/g input blocks nor the dh output
        # block index ever jumps backward when the outer chunk index k
        # advances (i: nt-1 -> 0 was the jump). Accumulation order over
        # row tiles is irrelevant to the weight grads.
        return i + (k % 2) * (nt - 1 - 2 * i)

    row = lambda: pl.BlockSpec((tm, c), lambda k, i, s: (ser(k, i), 0),
                               memory_space=pltpu.VMEM)
    g_in = lambda: pl.BlockSpec((c, mk), lambda k, i, s: (0, k),
                                memory_space=pltpu.VMEM)
    g_outw = lambda: pl.BlockSpec((mk, c), lambda k, i, s: (k, 0),
                                  memory_space=pltpu.VMEM)
    gb_in = lambda: pl.BlockSpec((8, mk), lambda k, i, s: (0, k),
                                 memory_space=pltpu.VMEM)
    e_in = lambda j: pl.BlockSpec((1, c, mk), lambda k, i, s: (s[j], 0, k),
                                  memory_space=pltpu.VMEM)
    e_outw = lambda j: pl.BlockSpec((1, mk, c), lambda k, i, s: (s[j], k, 0),
                                    memory_space=pltpu.VMEM)
    eb_in = lambda j: pl.BlockSpec((1, 8, mk), lambda k, i, s: (s[j], 0, k),
                                   memory_space=pltpu.VMEM)
    # weight-grad outputs: block index constant while i runs -> fp32
    # accumulation in VMEM, one HBM write per (k, expert) block
    d_in = lambda: pl.BlockSpec((c, mk), lambda k, i, s: (0, k),
                                memory_space=pltpu.VMEM)
    d_outw = lambda: pl.BlockSpec((mk, c), lambda k, i, s: (k, 0),
                                  memory_space=pltpu.VMEM)
    # bias-grad outputs travel as 8-row blocks (sum in row 0, rest
    # zero): 1-row accumulating output blocks are wrong on hardware
    db_in = lambda: pl.BlockSpec((8, mk), lambda k, i, s: (0, k),
                                 memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nk, nt),
        in_specs=[
            row(), row(),
            g_in(), gb_in(), g_in(), gb_in(), g_outw(),
            e_in(0), eb_in(0), e_in(0), eb_in(0), e_outw(0),
            e_in(1), eb_in(1), e_in(1), eb_in(1), e_outw(1),
        ],
        out_specs=[
            d_in(), db_in(), d_in(), db_in(), d_outw(),
            d_in(), db_in(), d_in(), db_in(), d_outw(),
            d_in(), db_in(), d_in(), db_in(), d_outw(),
            pl.BlockSpec((1, tm, c), lambda k, i, s: (k, ser(k, i), 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            s for _ in range(3) for s in (
                pltpu.VMEM((c, mk), jnp.float32),   # dwa acc
                pltpu.VMEM((8, mk), jnp.float32),   # dba acc
                pltpu.VMEM((c, mk), jnp.float32),   # dwb acc
                pltpu.VMEM((8, mk), jnp.float32),   # dbb acc
                pltpu.VMEM((mk, c), jnp.float32),   # dwc acc
            )
        ],
    )
    f32 = jnp.float32
    outs = pl.pallas_call(
        _bwd_kernel(h.dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c, m), f32),      # dgwa
            jax.ShapeDtypeStruct((8, m), f32),      # dgba (row 0)
            jax.ShapeDtypeStruct((c, m), f32),      # dgwb
            jax.ShapeDtypeStruct((8, m), f32),      # dgbb
            jax.ShapeDtypeStruct((m, c), f32),      # dgwc
            jax.ShapeDtypeStruct((c, m), f32),      # dwa slot 0
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((c, m), f32),
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((m, c), f32),
            jax.ShapeDtypeStruct((c, m), f32),      # dwa slot 1
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((c, m), f32),
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((m, c), f32),
            jax.ShapeDtypeStruct((nk, n + pad, c), h.dtype),  # dh partials
        ],
        interpret=interpret,
    )(
        expert_ids.astype(jnp.int32),
        h, g,
        gwa, gba2, gwb, gbb2, gwc,
        wa, ba2, wb, bb2, wc,
        wa, ba2, wb, bb2, wc,
    )
    dh = jnp.sum(outs[-1].astype(jnp.float32), axis=0)[:n]
    bias_slots = {1, 3, 6, 8, 11, 13}
    outs = [o[0:1] if j in bias_slots else o
            for j, o in enumerate(outs[:-1])]
    return (dh,) + tuple(outs)


def _ffn_tower_bwd(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                   wa, ba, wb, bb, wc, bc, expert_ids, h, g, gh,
                   interpret: bool = False, tile_rows: int = 0,
                   hidden_chunk: int = 0):
    """Full backward for the fused FFN block using the Pallas backward
    kernel: FFN-tower grads from (h, g), then the norm/FiLM backward in
    XLA (row-local elementwise), plus the h-output cotangent gh."""
    e = wa.shape[0]
    n, c = x.shape
    (dh_ffn, dgwa, dgba, dgwb, dgbb, dgwc,
     dwa0, dba0, dwb0, dbb0, dwc0,
     dwa1, dba1, dwb1, dbb1, dwc1) = ffn_block_bwd_pallas(
        h, g, gwa, gba, gwb, gbb, gwc, wa, ba, wb, bb, wc, expert_ids,
        interpret=interpret, tile_rows=tile_rows,
        hidden_chunk=hidden_chunk)
    dh = dh_ffn + gh.astype(jnp.float32)

    # output biases: d(bc) = sum over rows of g, for each tower
    dbc_row = jnp.sum(g.astype(jnp.float32), axis=0)

    # scatter the two selected experts' grads into the stacked arrays
    def scatter(s0, s1, like):
        z = jnp.zeros(like.shape, jnp.float32)
        return z.at[expert_ids[0]].add(s0).at[expert_ids[1]].add(s1)

    dwa = scatter(dwa0, dwa1, wa)
    dba = scatter(dba0.reshape(-1), dba1.reshape(-1), ba)
    dwb = scatter(dwb0, dwb1, wb)
    dbb = scatter(dbb0.reshape(-1), dbb1.reshape(-1), bb)
    dwc = scatter(dwc0, dwc1, wc)
    dbc = jnp.zeros(bc.shape, jnp.float32).at[expert_ids[0]].add(
        dbc_row).at[expert_ids[1]].add(dbc_row)

    # norm + FiLM backward (h = channel_norm(x) * mul + bias)
    _, nf_vjp = jax.vjp(
        lambda x_, m_, b_: channel_norm(x_) * m_ + b_,
        x, film_mul, film_bias,
    )
    dx, dmul, dbias = nf_vjp(dh.astype(h.dtype))

    cast = lambda v, ref: v.astype(ref.dtype)
    return (dx, dmul, dbias,
            cast(dgwa, gwa), cast(dgba.reshape(-1), gba),
            cast(dgwb, gwb), cast(dgbb.reshape(-1), gbb),
            cast(dgwc, gwc), cast(dbc_row, gbc),
            cast(dwa, wa), cast(dba, ba), cast(dwb, wb), cast(dbb, bb),
            cast(dwc, wc), cast(dbc, bc))


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
    # out[1] is h — saving it costs nothing extra to compute (it is a
    # forward output) and lets the Pallas backward skip the norm/FiLM/
    # projection recompute the old XLA-recompute VJP paid
    return out, (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                 wa, ba, wb, bb, wc, bc, expert_ids, out[1])


def _bwd_kernel_usable(x, wa, quantized: bool) -> bool:
    """Pallas backward availability: same shape rules as the forward,
    full-precision weights only (the quantized path's straight-through
    gradients go through fake_quantize in XLA).

    ON by default (opt out with ``LDM_FFN_BWD=xla``). The round-4
    "miscompile" verdict was a comparison artifact, not a Mosaic bug:
    hardware-vs-interpret max-rel diffs of 1-12% traced to a HANDFUL of
    elements (2 of 65536 at b4096) whose pre-activation sits within
    ~5e-5 of the ReLU/bf16-rounding boundary — fp32 accumulation ORDER
    differs between MXU tiling and interpret's single dot, the one-ulp
    difference flips the discrete (b > 0) / bf16-rounding decision, and
    a max-rel metric with a 1e-3 floor reports each flip as a huge
    error. At nt==1 or nk==1 the tile order coincides with
    interpret's, which is why those looked "exact". Any bf16 pipeline
    (including the XLA recompute VJP vs the Pallas forward) has
    identical boundary-flip behavior, so boundary flips are not a
    correctness regression.
    Hardware gate: benchmarks/ffn_bwd_truth_check.py compares BOTH
    backends against a torch-fp64 autograd ground truth on the real
    training shapes — the Pallas backward must be at least as accurate
    as the XLA recompute VJP per gradient. PASSED on this hardware
    2026-08-18 (all 15 grads x 4 shapes; Pallas is *more* accurate on
    most weight grads, ratios 0.57-1.03, because its weight-grad
    accumulators stay fp32 in VMEM)."""
    import os

    if quantized or os.environ.get("LDM_FFN_BWD", "") == "xla":
        return False
    return (
        jax.default_backend() in ("tpu", "axon")
        and x.shape[-1] % 128 == 0
        and wa.shape[-1] % 128 == 0
        and jnp.dtype(x.dtype).itemsize == 2
        and _pick_bwd_tiles(x.shape[0], x.shape[-1], wa.shape[-1])[2]
    )


def _ffb_bwd(quantized, res, g):
    (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
     wa, ba, wb, bb, wc, bc, expert_ids, h) = res
    g_out, gh = g
    if _bwd_kernel_usable(x, wa, quantized):
        from ldm_image_generator_tpu.kernels.dispatch import pallas_usable

        sig = ("bwd", h.shape, jnp.dtype(h.dtype).name, wa.shape)
        thunk = lambda: ffn_block_bwd_pallas.lower(
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in
              (h, g_out, gwa, gba, gwb, gbb, gwc, wa, ba, wb, bb, wc,
               expert_ids)],
        ).compile()
        if pallas_usable("ffn_block_bwd", sig, thunk):
            return _ffn_tower_bwd(
                x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                wa, ba, wb, bb, wc, bc, expert_ids, h, g_out, gh,
            ) + (None,)
    e1, e2 = expert_ids[0], expert_ids[1]
    _, vjp = jax.vjp(
        lambda *diff: ffn_block_xla(*diff, e1, e2),
        x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
        wa, ba, wb, bb, wc, bc,
    )
    grads = vjp(g)
    return grads + (None,)


_fused_ffn_block.defvjp(_ffb_fwd, _ffb_bwd)
