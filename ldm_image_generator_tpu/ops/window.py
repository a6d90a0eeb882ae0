"""Swin-style window partitioning for NHWC feature maps.

The reference implements windowing as torch split/cat shuffles into the batch
dimension (attention.py:62-71). Here it's a pure static reshape/transpose —
free under XLA (layout change only), shape-checked, and trivially invertible:
``merge_windows(partition_windows(x)) == x`` exactly.

Also hosts the padding + shift logic. Two reference bugs are fixed, not
ported (SURVEY.md §7 "fix, don't port"):
  * the shifted path rolls the *activations* into the mask variable
    (attention.py:40) — here the boolean pad mask itself is rolled;
  * the pad amounts are computed per the reference (attention.py:19-22)
    but applied with jnp.pad instead of expanded zero-cats.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def pad_to_window_multiple(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, int, int]:
    """Zero-pad H and W (axes 1,2) up to multiples of ws. Returns (x, H, W)."""
    _, h, w, _ = x.shape
    pad_h = (-h) % ws
    pad_w = (-w) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return x, h, w


def pad_mask(h: int, w: int, hp: int, wp: int) -> jnp.ndarray:
    """Boolean [Hp, Wp] mask, True where the position is padding."""
    row_pad = jnp.arange(hp) >= h
    col_pad = jnp.arange(wp) >= w
    return row_pad[:, None] | col_pad[None, :]


def partition_windows(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B * nH * nW, ws*ws, C]; H, W must be multiples of ws."""
    b, h, w, c = x.shape
    assert h % ws == 0 and w % ws == 0, (h, w, ws)
    nh, nw = h // ws, w // ws
    x = x.reshape(b, nh, ws, nw, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nH, nW, ws, ws, C]
    return x.reshape(b * nh * nw, ws * ws, c)


def merge_windows(x: jnp.ndarray, b: int, h: int, w: int, ws: int) -> jnp.ndarray:
    """Inverse of partition_windows: [B*nH*nW, ws*ws, C] -> [B, H, W, C]."""
    nh, nw = h // ws, w // ws
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nH, ws, nW, ws, C]
    return x.reshape(b, h, w, c)


def shift_2d(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Cyclic shift over spatial axes (NHWC axes 1,2), matching the
    reference's torch.roll((shift, shift), (2, 3)) on NCHW (attention.py:38)."""
    if shift == 0:
        return x
    return jnp.roll(x, (shift, shift), axis=(1, 2))
