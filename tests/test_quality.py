"""Patched-KID sample-quality metric (utils/quality.py).

The reference has no quality metric (its only signal is JPEG dumps,
train_vae.py:138-149); KID is additive. These tests pin the estimator's
defining properties: ~0 on identical distributions, >0 and ordered for
increasingly corrupted samples, symmetry, and patch extraction geometry.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_image_generator_tpu.config import VAEConfig
from ldm_image_generator_tpu.models import Encoder
from ldm_image_generator_tpu.utils.quality import (
    kid,
    kid_from_images,
    kid_mean_std,
    patch_features,
)


def test_patch_features_geometry():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    f = patch_features(x, patch=4)
    assert f.shape == (2 * 4, 4 * 4 * 3)
    # first patch of first image is rows 0:4, cols 0:4 in order
    expect = np.asarray(x[0, :4, :4, :]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(f[0]), expect)


def test_patch_features_small_maps_clamp_patch():
    x = jnp.ones((3, 2, 2, 5))
    f = patch_features(x, patch=4)  # clamps to 2x2 patches
    assert f.shape == (3, 2 * 2 * 5)


def test_kid_same_distribution_near_zero_and_symmetry():
    # independent draws from one distribution -> ~0 (measured 0.0026 at
    # this size); a 0.5-sigma mean shift -> ~0.68
    a = jax.random.normal(jax.random.PRNGKey(0), (256, 24))
    b = jax.random.normal(jax.random.PRNGKey(1), (256, 24))
    assert abs(float(kid(a, b))) < 0.05
    assert float(kid(a, b + 0.5)) > 0.2
    c = jax.random.normal(jax.random.PRNGKey(2), (128, 24)) + 1.0
    assert abs(float(kid(a, c)) - float(kid(c, a))) < 1e-4


def test_kid_orders_corruption_levels():
    key = jax.random.PRNGKey(0)
    real = jax.random.normal(key, (128, 16))
    noise = jax.random.normal(jax.random.PRNGKey(1), (128, 16))
    k_small = float(kid(real, real + 0.1 * noise))
    k_big = float(kid(real, real + 2.0 * noise))
    assert k_small < k_big
    assert k_big > 0.01


def test_kid_from_images_with_encoder():
    vcfg = VAEConfig().tiny()
    enc = Encoder(vcfg)
    imgs = jax.random.uniform(
        jax.random.PRNGKey(0), (4, 16, 16, 3), minval=-1, maxval=1
    )
    params = enc.init(jax.random.PRNGKey(1), imgs)
    imgs2 = jax.random.uniform(
        jax.random.PRNGKey(2), (4, 16, 16, 3), minval=-1, maxval=1
    )
    noise_like = jnp.sign(imgs2)  # a clearly different image distribution
    same_dist = float(kid_from_images(enc, params, imgs, imgs2))
    diff = float(kid_from_images(enc, params, imgs, noise_like))
    assert diff > same_dist


def test_kid_mean_std_protocol():
    real = jax.random.normal(jax.random.PRNGKey(0), (40, 8))
    fake = real + 0.5
    m, s = kid_mean_std(real, fake, jax.random.PRNGKey(2), num_subsets=4)
    assert np.isfinite(float(m)) and np.isfinite(float(s))
    assert float(m) > 0


@pytest.mark.parametrize("n,m", [(2, 2), (3, 5)])
def test_kid_min_set_sizes(n, m):
    a = jax.random.normal(jax.random.PRNGKey(0), (n, 6))
    b = jax.random.normal(jax.random.PRNGKey(1), (m, 6))
    assert np.isfinite(float(kid(a, b)))


def test_random_conv_features_independent_metric():
    """random_conv_features: deterministic (fixed seed baked in),
    VAE-free, and its KID separates distributions the same way the
    patched metric does — near zero for same-distribution draws, large
    for disjoint ones."""
    import jax

    from ldm_image_generator_tpu.utils.quality import (
        kid, random_conv_features,
    )

    key = jax.random.PRNGKey(0)
    a = jax.random.uniform(key, (8, 64, 64, 3), minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3),
                           minval=-1, maxval=1)
    # structured alternative distribution: smooth gradients, not noise
    import jax.numpy as jnp

    ramp = jnp.linspace(-1, 1, 64)
    c = jnp.tile(ramp[None, :, None, None], (8, 1, 64, 3)) \
        + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                   (8, 64, 64, 3))

    fa = random_conv_features(a)
    fa2 = random_conv_features(a)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fa2))
    assert fa.ndim == 2 and fa.shape[0] > 8  # per-patch features

    fb = random_conv_features(b)
    fc = random_conv_features(c)
    same = float(kid(fa, fb))
    diff = float(kid(fa, fc))
    assert diff > same + 0.1, (same, diff)
