"""Sample-quality metric: patched Kernel Inception Distance on VAE
encoder features ("patched KID", inception-free).

The reference has no quantitative sample-quality metric at all — its only
signal is periodic JPEG dumps (train_vae.py:138-149, sample_ldm.py:71-78).
Classic FID/KID need an Inception-v3, which this framework deliberately
does not depend on; instead we reuse the framework's own frozen VAE
encoder as the feature extractor (it is trained on the same data the
samples should match) and compute KID (Binkowski et al. 2018,
arXiv:1801.01401) between patch-level feature sets:

    images -> VAE encoder -> latent maps [B, h, w, C]
           -> non-overlapping p x p patches -> features [B*n, p*p*C]
    KID = unbiased MMD^2 with the polynomial kernel k(x, y) = (x.y/d + 1)^3

Patch-level features make the estimator usable at the tiny sample counts
of the overfit demo / eval loops (each image contributes n patches).
KID's unbiased estimator has no bias at small N (unlike FID) — the reason
it is the right choice here.

This is a *relative* metric: compare runs of the same encoder/patch
config. Lower is better; independent draws from the same distribution
give ~0 (the unbiased estimator is slightly *negative*-biased when the
two sets share samples, so don't feed it literally identical arrays).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def patch_features(latents: jnp.ndarray, patch: int = 4) -> jnp.ndarray:
    """Latent maps [B, h, w, C] -> per-patch features [B*n, patch*patch*C].

    Non-overlapping patches; trailing rows/cols that don't fill a patch
    are dropped. Features are standardized per-dimension below (in kid),
    not here, so real/fake use one shared normalization.
    """
    b, h, w, c = latents.shape
    p = min(patch, h, w)
    hh, ww = (h // p) * p, (w // p) * p
    x = latents[:, :hh, :ww, :]
    x = x.reshape(b, hh // p, p, ww // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, nh, nw, p, p, C]
    return x.reshape(b * (hh // p) * (ww // p), p * p * c)


def random_conv_features(images: jnp.ndarray, seed: int = 0xC0FFEE,
                         patch: int = 4) -> jnp.ndarray:
    """VAE-independent feature path for KID (round-5 metric hardening).

    The patched-KID gates judge samples through the same frozen VAE
    encoder that defines the latent space being sampled — self-referential
    (a decoder that games the encoder's blind spots scores well). This
    extractor is a fixed random-init 3-layer stride-2 conv net over
    PIXELS with He-init weights from a hard-coded seed: no external
    weights, deterministic across runs, and statistically independent of
    the VAE. Random convolutional features are a known-adequate basis
    for two-sample tests on natural images (random-weight CNN features
    retain image statistics; cf. FID-infinity / random-feature MMD
    literature).

    images: NHWC float in [-1, 1]. Returns [B*n, patch*patch*C] per-patch
    features like patch_features (shared KID plumbing downstream).
    """
    key = jax.random.PRNGKey(seed)
    x = images.astype(jnp.float32)
    cin = x.shape[-1]
    for i, cout in enumerate((16, 32, 64)):
        kw = jax.random.normal(jax.random.fold_in(key, i),
                               (3, 3, cin, cout), jnp.float32)
        kw = kw * jnp.sqrt(2.0 / (3 * 3 * cin))
        x = jax.lax.conv_general_dilated(
            x, kw, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.nn.leaky_relu(x, 0.2)
        cin = cout
    return patch_features(x, patch)


def _poly_kernel(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.shape[-1]
    return (a @ b.T / d + 1.0) ** 3


def kid(
    feats_real: jnp.ndarray, feats_fake: jnp.ndarray
) -> jnp.ndarray:
    """Unbiased MMD^2 with the degree-3 polynomial kernel (the standard
    KID estimator, arXiv:1801.01401 eq. 3). Inputs [N, D], [M, D] with
    N, M >= 2. Features are jointly standardized (zero mean / unit
    variance over the union) so the polynomial kernel's scale is
    data-independent."""
    x = feats_real.astype(jnp.float32)
    y = feats_fake.astype(jnp.float32)
    both = jnp.concatenate([x, y], axis=0)
    mu = jnp.mean(both, axis=0, keepdims=True)
    sd = jnp.std(both, axis=0, keepdims=True) + 1e-6
    x = (x - mu) / sd
    y = (y - mu) / sd

    n, m = x.shape[0], y.shape[0]
    kxx = _poly_kernel(x, x)
    kyy = _poly_kernel(y, y)
    kxy = _poly_kernel(x, y)
    sum_off = lambda k, l: (jnp.sum(k) - jnp.trace(k)) / (l * (l - 1))
    return sum_off(kxx, n) + sum_off(kyy, m) - 2.0 * jnp.mean(kxy)


def kid_from_images(
    encoder,
    encoder_params,
    real_images: jnp.ndarray,
    fake_images: jnp.ndarray,
    patch: int = 4,
) -> jnp.ndarray:
    """KID between two NHWC image sets in [-1, 1], features from the given
    (frozen) VAE encoder. Returns a scalar; jit-able end to end."""
    feats = lambda imgs: patch_features(
        encoder.apply(encoder_params, imgs).astype(jnp.float32), patch
    )
    return kid(feats(real_images), feats(fake_images))


def kid_mean_std(
    feats_real: jnp.ndarray,
    feats_fake: jnp.ndarray,
    key: jax.Array,
    num_subsets: int = 10,
    subset_size: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard KID reporting protocol: mean +/- std of the estimator over
    random equal-size subsets (arXiv:1801.01401 sec. 5). subset_size=0
    uses min(N, M)//2 (at least 2)."""
    n = min(feats_real.shape[0], feats_fake.shape[0])
    s = subset_size or max(2, n // 2)
    keys = jax.random.split(key, num_subsets)

    def one(k):
        kr, kf = jax.random.split(k)
        ir = jax.random.choice(kr, feats_real.shape[0], (s,), replace=False)
        if_ = jax.random.choice(kf, feats_fake.shape[0], (s,), replace=False)
        return kid(feats_real[ir], feats_fake[if_])

    vals = jax.vmap(one)(keys)
    return jnp.mean(vals), jnp.std(vals)
