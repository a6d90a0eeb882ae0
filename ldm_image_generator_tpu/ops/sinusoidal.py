"""Sinusoidal positional / time encodings (NHWC).

Re-derivations of the reference formulas (sinusoidal.py:6-41) in channel-last
layout. Both are pure functions of shape / timestep — no parameters — so they
constant-fold (positions) or fuse (time) under jit.

Channel layouts (C = number of channels):
  positional_encoding_2d -> [sin_v C/4 | cos_v C/4 | sin_h C/4 | cos_h C/4]
    vertical coordinate v = row/H, horizontal h = col/W, octave factors
    f_i = 1 / 2**(i / (C/4)), encoding sin(v*pi*f_i) etc.
    (matches sinusoidal.py:12-19: ev gets [sin|cos], eh gets [sin|cos],
     concatenated [ev | eh].)
  time_encoding_2d -> [sin C/2 | cos C/2]
    f_i = 1 / 10000**(i / (C/2)); note BOTH halves use the full factor list
    and the extra pi multiplier (sinusoidal.py:36-40).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def positional_encoding_2d(h: int, w: int, channels: int,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Return [H, W, C] positional encoding (broadcasts over batch).

    Matches PositionalEncoding2d (sinusoidal.py:6-24) with
    return_encoding_only=True, re-laid-out to NHWC.
    """
    assert channels % 4 == 0, f"channels must be divisible by 4, got {channels}"
    quarter = channels // 4
    # octave factors 1/2**(i/quarter)  (sinusoidal.py:15)
    factors = 1.0 / (2.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    v = (jnp.arange(h, dtype=jnp.float32) / h)[:, None]  # [H,1]
    u = (jnp.arange(w, dtype=jnp.float32) / w)[:, None]  # [W,1]
    pv = v * math.pi * factors[None, :]                   # [H,quarter]
    ph = u * math.pi * factors[None, :]                   # [W,quarter]
    ev = jnp.concatenate([jnp.sin(pv), jnp.cos(pv)], axis=-1)  # [H, C/2]
    eh = jnp.concatenate([jnp.sin(ph), jnp.cos(ph)], axis=-1)  # [W, C/2]
    emb = jnp.concatenate(
        [
            jnp.broadcast_to(ev[:, None, :], (h, w, channels // 2)),
            jnp.broadcast_to(eh[None, :, :], (h, w, channels // 2)),
        ],
        axis=-1,
    )
    return emb.astype(dtype)


def time_encoding_2d(t: jnp.ndarray, channels: int,
                     max_timesteps: int = 10000,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Return [B, 1, 1, C] time encoding for integer/float timesteps t: [B].

    Matches TimeEncoding2d (sinusoidal.py:27-41): channel i < C/2 is
    sin(t*pi*f_i), channel C/2+i is cos(t*pi*f_i), f_i = 1/10000**(i/(C/2)).
    """
    assert channels % 2 == 0
    half = channels // 2
    factors = 1.0 / (
        jnp.float32(max_timesteps) ** (jnp.arange(half, dtype=jnp.float32) / half)
    )
    phase = t.astype(jnp.float32)[:, None] * math.pi * factors[None, :]  # [B, C/2]
    emb = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], axis=-1)     # [B, C]
    return emb[:, None, None, :].astype(dtype)
