"""Fused VQ nearest-neighbor search (Pallas TPU kernel).

The VectorQuantizer's hot op (vae.py:18-22) is: for N latent vectors
(dim D=8) find the nearest of K=8192 codebook entries. The XLA lowering
materializes the [N, K] score matrix in HBM (e.g. 150MB per VAE train
step at 192px crops) and then reduces it. This kernel tiles N over the
grid, keeps the whole codebook (K x D = 256KB fp32) plus one [TN, K]
score tile resident in VMEM, and writes only the argmin indices — HBM
traffic drops from O(N*K) to O(N*D + K*D + N).

Distances: argmin_k ||x - e_k||^2 == argmin_k (||e_k||^2 - 2 x.e_k);
the ||x||^2 term is row-constant and dropped (same trick as the XLA
path in models/vae.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_N = 512


def nearest_codebook_indices_xla(x: jnp.ndarray, codebook: jnp.ndarray
                                 ) -> jnp.ndarray:
    """Reference XLA implementation. x: [N, D], codebook: [K, D] -> [N]."""
    xf = x.astype(jnp.float32)
    e = codebook.astype(jnp.float32)
    dots = jnp.einsum("nd,kd->nk", xf, e, preferred_element_type=jnp.float32)
    e_sq = jnp.sum(e * e, axis=-1)
    return jnp.argmin(e_sq[None, :] - 2.0 * dots, axis=-1).astype(jnp.int32)


def _vq_kernel(x_ref, e_ref, e_sq_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)              # [TN, D]
    e = e_ref[:].astype(jnp.float32)              # [K, D]
    # scores tile stays in VMEM: [TN, K]
    dots = jax.lax.dot_general(
        x, e, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = e_sq_ref[:] - 2.0 * dots  # e_sq_ref is [1, K]
    # manual argmin (first occurrence): Mosaic can't legalize jnp.argmin's
    # f32->i32 vector materialization, so reduce min then select the
    # smallest column index attaining it
    k = scores.shape[-1]
    minval = jnp.min(scores, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    idx = jnp.min(jnp.where(scores == minval, col, k), axis=-1)
    # output is [1, TN] (indices on the lane axis: 1-D int32 outputs trip
    # an XLA/Mosaic layout mismatch on real hardware)
    out_ref[0, :] = idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codebook_indices_pallas(x: jnp.ndarray, codebook: jnp.ndarray,
                                    interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    k = codebook.shape[0]
    n_pad = (-n) % TILE_N
    xp = jnp.pad(x, ((0, n_pad), (0, 0))) if n_pad else x
    np_total = n + n_pad
    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)

    grid = (np_total // TILE_N,)
    out = pl.pallas_call(
        _vq_kernel,
        out_shape=jax.ShapeDtypeStruct((1, np_total), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, codebook, e_sq.reshape(1, k))
    return out[0, :n]


def nearest_codebook_indices(x: jnp.ndarray, codebook: jnp.ndarray
                             ) -> jnp.ndarray:
    """Dispatcher: Pallas on TPU, XLA elsewhere. x: [..., D] -> [...]."""
    shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        from ldm_image_generator_tpu.kernels.dispatch import pallas_usable

        sig = (flat.shape, jnp.dtype(flat.dtype).name, codebook.shape)
        thunk = lambda: nearest_codebook_indices_pallas.lower(
            jax.ShapeDtypeStruct(flat.shape, flat.dtype),
            jax.ShapeDtypeStruct(codebook.shape, codebook.dtype),
        ).compile()
        if pallas_usable("vq", sig, thunk):
            return nearest_codebook_indices_pallas(flat, codebook).reshape(
                shape
            )
    return nearest_codebook_indices_xla(flat, codebook).reshape(shape)
