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


def _kernel(eps, out_dtype):
    def kernel(sidx, x_ref, mul_ref, bias_ref,
               gwa, gba, gwb, gbb, gwc, gbc,
               wa1, ba1, wb1, bb1, wc1, bc1,
               wa2, ba2, wb2, bb2, wc2, bc2,
               out_ref, h_ref, acc_ref):
        from jax.experimental import pallas as pl

        k = pl.program_id(1)
        nk = pl.num_programs(1)

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
                gbc[:].reshape(1, -1).astype(jnp.float32)
                + bc1[:].reshape(1, -1).astype(jnp.float32)
                + bc2[:].reshape(1, -1).astype(jnp.float32),
                acc_ref.shape,
            )

        h = h_ref[:]

        def reglu_chunk(wa_, ba_, wb_, bb_, wc_):
            """One hidden chunk's contribution: (a_k * relu(b_k)) @ wc_k."""
            m2 = lambda w: w[:].reshape(w.shape[-2], w.shape[-1])
            a = jax.lax.dot_general(
                h, m2(wa_), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + ba_[:].reshape(1, -1).astype(jnp.float32)
            b = jax.lax.dot_general(
                h, m2(wb_), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bb_[:].reshape(1, -1).astype(jnp.float32)
            g = (a * jax.nn.relu(b)).astype(out_dtype)
            return jax.lax.dot_general(
                g, m2(wc_), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc_ref[:] += (
            reglu_chunk(gwa, gba, gwb, gbb, gwc)
            + reglu_chunk(wa1, ba1, wb1, bb1, wc1)
            + reglu_chunk(wa2, ba2, wb2, bb2, wc2)
        )

        @pl.when(k == nk - 1)
        def _flush():
            out_ref[:] = acc_ref[:].astype(out_dtype)

    return kernel


def _pick_tiles(n: int, c: int, m: int):
    """(tile_rows, hidden_chunk): keep resident weights + tiles within
    ~12MB of VMEM. Small stages run unchunked (nk=1, the round-1 kernel
    schedule); C=1024 runs 4 chunks of 256."""
    tm = min(512, n)
    mk = m
    # 3 ReGLUs x (2 [C, mk] + 1 [mk, C]) bf16 weight blocks resident,
    # double-buffered by Mosaic while streaming
    weight_bytes = lambda mk_: 9 * c * mk_ * 2 * 2
    # x/mul/bias/h/out row tiles (bf16) + the fp32 accumulator
    tile_bytes = lambda tm_: tm_ * c * (5 * 2 + 4)
    while weight_bytes(mk) + tile_bytes(tm) > 12 * 1024 * 1024:
        if mk % 2 == 0 and mk > 256:
            mk //= 2
        elif tm > 128:
            tm //= 2
        else:
            break
    return tm, mk


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                     wa, ba, wb, bb, wc, bc, expert_ids,
                     interpret: bool = False, tile_rows: int = 0):
    """x/film_*: [N, C]; expert_ids: int32 [2]. Returns (out, h)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    m = wa.shape[-1]
    e = wa.shape[0]
    tm, mk = _pick_tiles(n, c, m)
    if tile_rows:
        tm = min(tile_rows, n)
    pad = (-n) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        film_mul = jnp.pad(film_mul, ((0, pad), (0, 0)))
        film_bias = jnp.pad(film_bias, ((0, pad), (0, 0)))
    nt = (n + pad) // tm
    nk = m // mk

    row = lambda: pl.BlockSpec((tm, c), lambda i, k, s: (i, 0),
                               memory_space=pltpu.VMEM)
    # general weights: chunk index on the hidden dim
    g_in = lambda: pl.BlockSpec((c, mk), lambda i, k, s: (0, k),
                                memory_space=pltpu.VMEM)
    g_out = lambda: pl.BlockSpec((mk, c), lambda i, k, s: (k, 0),
                                 memory_space=pltpu.VMEM)
    gb_in = lambda: pl.BlockSpec((1, mk), lambda i, k, s: (0, k),
                                 memory_space=pltpu.VMEM)
    gb_out = lambda: pl.BlockSpec((1, c), lambda i, k, s: (0, 0),
                                  memory_space=pltpu.VMEM)
    # expert-selected slices: scalar-prefetched ids drive the index maps
    e_in = lambda j: pl.BlockSpec((1, c, mk), lambda i, k, s: (s[j], 0, k),
                                  memory_space=pltpu.VMEM)
    e_out = lambda j: pl.BlockSpec((1, mk, c), lambda i, k, s: (s[j], k, 0),
                                   memory_space=pltpu.VMEM)
    # stacked expert biases travel as [E, 1, d] so the trailing block
    # dims satisfy the TPU (8, 128) tiling rule
    eb_in = lambda j: pl.BlockSpec((1, 1, mk), lambda i, k, s: (s[j], 0, k),
                                   memory_space=pltpu.VMEM)
    eb_out = lambda j: pl.BlockSpec((1, 1, c), lambda i, k, s: (s[j], 0, 0),
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
        _kernel(1e-4, x.dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n + pad, c), x.dtype),
            jax.ShapeDtypeStruct((n + pad, c), x.dtype),
        ],
        interpret=interpret,
    )(
        expert_ids.astype(jnp.int32),
        x, film_mul, film_bias,
        gwa, gba.reshape(1, m), gwb, gbb.reshape(1, m), gwc,
        gbc.reshape(1, c),
        wa, ba.reshape(e, 1, m), wb, bb.reshape(e, 1, m),
        wc, bc.reshape(e, 1, c),
        wa, ba.reshape(e, 1, m), wb, bb.reshape(e, 1, m),
        wc, bc.reshape(e, 1, c),
    )
    return out[:n], h[:n]


def ffn_block(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
              wa, ba, wb, bb, wc, bc, expert_ids):
    """Dispatcher: Pallas on TPU, XLA composition elsewhere.
    Differentiable (XLA-recompute VJP on the Pallas path).
    Returns (ffn_out, h)."""
    if (
        jax.default_backend() in ("tpu", "axon")
        and x.shape[-1] % 128 == 0
        and wa.shape[-1] % 128 == 0
    ):
        return _fused_ffn_block(x, film_mul, film_bias, gwa, gba, gwb, gbb,
                                gwc, gbc, wa, ba, wb, bb, wc, bc, expert_ids)
    e1, e2 = expert_ids[0], expert_ids[1]
    # dynamic-index XLA fallback (gathers two expert slices)
    return ffn_block_xla(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc,
                         gbc, wa, ba, wb, bb, wc, bc, e1, e2)


@jax.custom_vjp
def _fused_ffn_block(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                     wa, ba, wb, bb, wc, bc, expert_ids):
    return ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb,
                            gwc, gbc, wa, ba, wb, bb, wc, bc, expert_ids)


def _ffb_fwd(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
             wa, ba, wb, bb, wc, bc, expert_ids):
    out = ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb,
                           gwc, gbc, wa, ba, wb, bb, wc, bc, expert_ids)
    return out, (x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                 wa, ba, wb, bb, wc, bc, expert_ids)


def _ffb_bwd(res, g):
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
