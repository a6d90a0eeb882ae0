"""Channel normalization (NHWC).

Semantics of the reference ChannelNorm (modules.py:18-25): per-pixel
normalization over the channel axis with *unbiased* variance (torch
``Tensor.var`` default), eps=1e-4, and **no learnable affine** (the
``channels`` argument is unused in the reference).

In NHWC the channel axis is the last (lane) axis, so the mean/variance are
lane reductions the VPU handles natively and XLA fuses into neighbors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_norm(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Normalize over the trailing (channel) axis.

    Matches ``(x - mean) / sqrt(var_unbiased + eps)`` from modules.py:23-24.
    Statistics are computed in fp32 regardless of input dtype to keep bf16
    activations numerically stable, then cast back.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # unbiased variance: ddof=1 (torch Tensor.var default correction=1)
    var = jnp.var(xf, axis=-1, keepdims=True, ddof=1)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(dtype)
