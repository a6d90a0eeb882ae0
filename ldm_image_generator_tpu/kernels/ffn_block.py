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

Differentiable via custom VJP (XLA recompute backward, like
kernels/window_attention.py).
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
               out_ref, h_ref):
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True, ddof=1)
        hn = (xf - mean) * jax.lax.rsqrt(var + eps)
        h = (
            hn * mul_ref[:].astype(jnp.float32)
            + bias_ref[:].astype(jnp.float32)
        ).astype(out_dtype)
        h_ref[:] = h

        def reglu(wa_, ba_, wb_, bb_, wc_, bc_):
            a = jax.lax.dot_general(
                h, wa_[:].reshape(wa_.shape[-2], wa_.shape[-1]),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + ba_[:].reshape(1, -1).astype(jnp.float32)
            b = jax.lax.dot_general(
                h, wb_[:].reshape(wb_.shape[-2], wb_.shape[-1]),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bb_[:].reshape(1, -1).astype(jnp.float32)
            g = (a * jax.nn.relu(b)).astype(out_dtype)
            return jax.lax.dot_general(
                g, wc_[:].reshape(wc_.shape[-2], wc_.shape[-1]),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bc_[:].reshape(1, -1).astype(jnp.float32)

        out = (
            reglu(gwa, gba, gwb, gbb, gwc, gbc)
            + reglu(wa1, ba1, wb1, bb1, wc1, bc1)
            + reglu(wa2, ba2, wb2, bb2, wc2, bc2)
        )
        out_ref[:] = out.astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def ffn_block_pallas(x, film_mul, film_bias, gwa, gba, gwb, gbb, gwc, gbc,
                     wa, ba, wb, bb, wc, bc, expert_ids,
                     interpret: bool = False, tile_rows: int = 512):
    """x/film_*: [N, C]; expert_ids: int32 [2]. Returns (out, h)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x.shape
    m = wa.shape[-1]
    e = wa.shape[0]
    tm = min(tile_rows, n)
    pad = (-n) % tm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        film_mul = jnp.pad(film_mul, ((0, pad), (0, 0)))
        film_bias = jnp.pad(film_bias, ((0, pad), (0, 0)))
    nt = (n + pad) // tm

    row = lambda: pl.BlockSpec((tm, c), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM)
    w_g = lambda d0, d1: pl.BlockSpec((d0, d1), lambda i, s: (0, 0),
                                      memory_space=pltpu.VMEM)
    # expert-selected slices: scalar-prefetched ids drive the index maps
    w_e = lambda d0, d1, k: pl.BlockSpec(
        (1, d0, d1), lambda i, s: (s[k], 0, 0), memory_space=pltpu.VMEM
    )
    # stacked expert biases travel as [E, 1, d] so the trailing block
    # dims satisfy the TPU (8, 128) tiling rule
    b_e = lambda d, k: pl.BlockSpec(
        (1, 1, d), lambda i, s: (s[k], 0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            row(), row(), row(),
            w_g(c, m), w_g(1, m), w_g(c, m), w_g(1, m), w_g(m, c), w_g(1, c),
            w_e(c, m, 0), b_e(m, 0), w_e(c, m, 0), b_e(m, 0),
            w_e(m, c, 0), b_e(c, 0),
            w_e(c, m, 1), b_e(m, 1), w_e(c, m, 1), b_e(m, 1),
            w_e(m, c, 1), b_e(c, 1),
        ],
        out_specs=[
            pl.BlockSpec((tm, c), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
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
    """Dispatcher: Pallas on TPU (when the weights fit VMEM), XLA
    composition elsewhere. Differentiable (XLA-recompute VJP on the
    Pallas path). Returns (ffn_out, h)."""
    c = x.shape[-1]
    m = wa.shape[-1]
    vmem_ok = 9 * c * m * 2 <= 10 * 1024 * 1024  # resident weights, bf16
    if (
        jax.default_backend() in ("tpu", "axon")
        and c % 128 == 0
        and m % 128 == 0
        and vmem_ok
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
