"""Fused windowed multi-head self-attention (Pallas TPU kernel).

The UNet's window attention runs MHA over many small windows (ws^2 = 36
tokens each, attention.py:43-51 semantics). The XLA lowering writes
q/k/v/scores/probs to HBM between matmuls; this kernel processes a tile
of TN windows per grid step entirely in VMEM:

    x[TN*L, C] -> qkv projections (MXU) -> per-window per-head scores
    [TN, H, L, L] (fp32, never leaves VMEM) -> masked softmax ->
    attention-weighted values -> output projection -> y[TN*L, C]

The projection weights use constant index maps, so Mosaic keeps them
resident across grid steps. No online softmax is needed — a whole
window's scores fit comfortably in VMEM. The key-padding mask travels as
a float additive bias (0 / -1e9), sidestepping packed-bool layouts.

Training: fused_window_mha carries a custom VJP whose backward pass is
the XLA reference implementation's VJP (forward recompute) — gradients
flow, and the backward matmuls are plain XLA.

Status (round 2, measured per production shape at b64): WINS where the
per-head loop is short relative to the saved HBM traffic — 4-head
36-token windows (2.21 vs 3.62 ms, -39%) and <=16-token full-map
attention at 32 heads (0.25 vs 0.39 ms, -36%); ties at 8 heads and
loses ~12% at 16-head 36-token windows. The default 'auto' backend
(models/layers.MultiHeadAttention) engages it exactly in the winning
regimes. Scaling limit: Mosaic's tpu.matmul takes one batch dim, so
heads loop statically over small [TN, L, L] matmuls; both the
(TN*H)-batching 4-D transpose and a head-folding block-masked joint
matmul (exact in interpret mode) crash this environment's Mosaic
compiler.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def window_mha_xla(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads: int):
    """Reference implementation. x: [N, L, C]; mask: [N, L] bool or None."""
    n, l, c = x.shape
    h = num_heads
    d = c // h
    q = (x @ wq + bq).reshape(n, l, h, d)
    k = (x @ wk + bk).reshape(n, l, h, d)
    v = (x @ wv + bv).reshape(n, l, h, d)
    scores = jnp.einsum("nlhd,nshd->nhls", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(d).astype(jnp.float32))
    if mask is not None:
        scores = scores + jnp.where(mask[:, None, None, :], NEG_INF, 0.0)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhls,nshd->nlhd", probs, v).reshape(n, l, c)
    return out @ wo + bo


def _make_kernel(num_heads: int, tn: int, l: int, c: int, out_dtype):
    d = c // num_heads
    scale = 1.0 / float(d) ** 0.5

    def kernel(x_ref, bias_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
               bv_ref, wo_ref, bo_ref, out_ref):
        x = x_ref[:].reshape(tn * l, c)

        def dot(a, w_ref, b_ref):
            y = jax.lax.dot_general(
                a, w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[:].astype(jnp.float32)  # b_ref: [1, C]
            return y.astype(x.dtype)

        q = dot(x, wq_ref, bq_ref).reshape(tn, l, c)
        k = dot(x, wk_ref, bk_ref).reshape(tn, l, c)
        v = dot(x, wv_ref, bv_ref).reshape(tn, l, c)
        bias = bias_ref[:][:, None, :]  # [TN, 1, L]

        # Mosaic's tpu.matmul supports a single batch dim, so loop heads
        # statically; each head's [TN, L, L] fp32 scores live in VMEM only.
        outs = []
        for i in range(num_heads):
            qi = q[:, :, i * d : (i + 1) * d]
            ki = k[:, :, i * d : (i + 1) * d]
            vi = v[:, :, i * d : (i + 1) * d]
            scores = jax.lax.dot_general(
                qi, ki,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [TN, L, S]
            scores = scores * scale + bias
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            outs.append(
                jax.lax.dot_general(
                    probs, vi,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)
            )  # [TN, L, D]
        out = jnp.concatenate(outs, axis=-1).reshape(tn * l, c)
        out_ref[:] = dot(out, wo_ref, bo_ref).reshape(tn, l, c).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "tile_windows", "interpret")
)
def window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                      num_heads: int, tile_windows: int = 0,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, l, c = x.shape
    if tile_windows == 0:
        # measured: 8 windows/tile best at 36-token windows, 16 at the
        # short (<=16 token) full-map sequences
        tile_windows = 8 if l > 16 else 16
    tn = min(tile_windows, n)
    if mask is None:
        bias = jnp.zeros((n, l), dtype=jnp.float32)
    else:
        bias = jnp.where(mask, jnp.float32(NEG_INF), jnp.float32(0.0))
    n_pad = (-n) % tn
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0)))
        # padded windows keep bias 0 (valid) so softmax stays finite;
        # their outputs are cropped below
        bias = jnp.pad(bias, ((0, n_pad), (0, 0)))
    nt = (n + n_pad) // tn

    b2 = lambda: pl.BlockSpec((1, c), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    w2 = lambda: pl.BlockSpec((c, c), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(num_heads, tn, l, c, x.dtype),
        out_shape=jax.ShapeDtypeStruct((n + n_pad, l, c), x.dtype),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((tn, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            w2(), b2(), w2(), b2(), w2(), b2(), w2(), b2(),
        ],
        out_specs=pl.BlockSpec((tn, l, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x, bias,
        wq, bq.reshape(1, c), wk, bk.reshape(1, c),
        wv, bv.reshape(1, c), wo, bo.reshape(1, c),
    )
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_window_mha(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                     num_heads: int):
    """Differentiable fused window MHA: Pallas forward, XLA-VJP backward."""
    return window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                             num_heads=num_heads)


def _fwd(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads):
    out = window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                            num_heads=num_heads)
    return out, (x, mask, wq, bq, wk, bk, wv, bv, wo, bo)


def _bwd(num_heads, res, g):
    x, mask, wq, bq, wk, bk, wv, bv, wo, bo = res
    _, vjp = jax.vjp(
        lambda x, wq, bq, wk, bk, wv, bv, wo, bo: window_mha_xla(
            x, mask, wq, bq, wk, bk, wv, bv, wo, bo, num_heads
        ),
        x, wq, bq, wk, bk, wv, bv, wo, bo,
    )
    dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo = vjp(g)
    return dx, None, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo


fused_window_mha.defvjp(_fwd, _bwd)
