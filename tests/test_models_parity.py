"""Full-model forward parity vs the reference (converted weights)."""
import numpy as np
import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import UNetConfig, VAEConfig
from ldm_image_generator_tpu.models import (
    Decoder,
    Discriminator,
    Encoder,
    UNet,
    VectorQuantizer,
)
from ldm_image_generator_tpu.utils import torch_import as ti

from tests.reference_util import import_reference, to_nhwc

TOL = dict(rtol=5e-4, atol=5e-5)

SMALL_VAE = VAEConfig(
    encoder_channels=(8, 16), encoder_stages=(1, 2),
    decoder_channels=(16, 8), decoder_stages=(2, 1),
    num_embeddings=32,
)


def test_encoder_matches_reference():
    vae_ref = import_reference("vae")
    import torch

    torch.manual_seed(0)
    ref = vae_ref.Encoder(channels=[8, 16], stages=[1, 2]).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref_z = ref(x)
    params = ti.convert_encoder(ref.state_dict(), SMALL_VAE)
    ours = Encoder(SMALL_VAE).apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_z), **TOL)


def test_decoder_matches_reference():
    vae_ref = import_reference("vae")
    import torch

    torch.manual_seed(1)
    ref = vae_ref.Decoder(channels=[16, 8], stages=[2, 1]).eval()
    z = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        ref_y = ref(z)
    params = ti.convert_decoder(ref.state_dict(), SMALL_VAE)
    ours = Decoder(SMALL_VAE).apply(params, jnp.asarray(to_nhwc(z)))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_y), **TOL)


def test_quantizer_matches_reference():
    vae_ref = import_reference("vae")
    import torch

    torch.manual_seed(2)
    ref = vae_ref.VectorQuantizer(num_embeddings=32, dim=8).eval()
    x = torch.randn(2, 50, 8)
    with torch.no_grad():
        ref_idx = ref.quantize(x).numpy()
        ref_loss = ref.calculate_loss(x).item()
    params = ti.convert_quantizer(ref.state_dict())
    q = VectorQuantizer(32, 8)
    idx = q.apply(params, jnp.asarray(x.numpy()), method=q.quantize)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    loss = q.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)


def test_discriminator_matches_reference():
    vae_ref = import_reference("vae")
    import torch

    torch.manual_seed(3)
    ref = vae_ref.Discriminator().eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref_logit = ref.calclate_logit(x).item()
    params = ti.convert_discriminator(ref.state_dict())
    logit = Discriminator().apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(float(logit), ref_logit, rtol=1e-4, atol=1e-5)


def test_unet_matches_reference_small(monkeypatch):
    """Full UNet parity on 4x4 latents: all maps are <= window_size so the
    reference's buggy shifted-mask path is bypassed (attention.py:15-16);
    stochastic depth off (eval), MoE routing pinned to experts [0, 1]."""
    unet_ref = import_reference("unet")
    import torch
    import random as pyrandom

    torch.manual_seed(4)
    monkeypatch.setattr(pyrandom, "sample", lambda pop, k: list(pop)[:k])
    ref = unet_ref.UNet(input_channels=4, stages=[1, 2], channels=[32, 64]).eval()
    x = torch.randn(2, 4, 4, 4)
    t = torch.tensor([17, 901])
    with torch.no_grad():
        ref_out = ref(x, t)

    cfg = UNetConfig(
        input_channels=4, stages=(1, 2), channels=(32, 64),
        fixed_expert_indices=(0, 1),
    )
    params = ti.convert_unet(ref.state_dict(), cfg)
    ours = UNet(cfg).apply(
        params, jnp.asarray(to_nhwc(x)), jnp.asarray([17, 901]),
        rngs={"moe": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_out),
                               rtol=2e-3, atol=2e-4)


def test_unet_param_count_matches_reference_default():
    """Default config must carry the reference's 385.7M parameters
    (SURVEY.md §6) — guards against silently diverging architecture."""
    cfg = UNetConfig()
    m = UNet(cfg)
    x = jnp.zeros((1, 32, 32, 8))
    t = jnp.zeros((1,), dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    params = jax.eval_shape(
        lambda: m.init({"params": key, "moe": key}, x, t)
    )
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert abs(n - 385_700_000) / 385_700_000 < 0.01, n


def test_discriminator_feature_matching_matches_reference():
    """calclate_logit_and_feature_matching parity (vae.py:148-161) — the
    reference defines it but never calls it; ours is functional."""
    vae_ref = import_reference("vae")
    import torch

    torch.manual_seed(5)
    ref = vae_ref.Discriminator().eval()
    fake = torch.randn(2, 3, 16, 16)
    real = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        ref_logit, ref_feat = ref.calclate_logit_and_feature_matching(
            fake.clone(), real.clone())

    from ldm_image_generator_tpu.models.vae import feature_matching_loss

    params = ti.convert_discriminator(ref.state_dict())
    d = Discriminator()
    logit_f, feats_f = d.apply(params, jnp.asarray(to_nhwc(fake)),
                               features=True)
    _, feats_r = d.apply(params, jnp.asarray(to_nhwc(real)), features=True)
    fm = feature_matching_loss(feats_f, feats_r)
    np.testing.assert_allclose(float(logit_f), float(ref_logit),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(fm), float(ref_feat),
                               rtol=1e-4, atol=1e-5)
