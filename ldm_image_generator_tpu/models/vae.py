"""VQ-regularized convolutional autoencoder + discriminator (vae.py), NHWC.

Components (reference vae.py):
  * ResBlock/ResStack  — two 3x3 convs + leaky_relu, residual, no norm
    (vae.py:54-73).
  * Encoder            — 1x1 stem -> 4 ResStacks with AvgPool+1x1 downsample
    between stages -> 1x1 head to latent channels; total 8x downsample
    (vae.py:76-96).
  * Decoder            — mirror with ConvTranspose(k=2,s=2) upsamples and a
    progressive-RGB pyramid: each stage emits a 1x1 to_rgb map, accumulated
    across scales with bilinear 2x upsampling; the output is the pyramid
    sum, not the last feature map (vae.py:99-132).
  * VectorQuantizer    — 8192 x 8 learned codebook used only as a training
    regularizer (VAE.encode never quantizes, vae.py:45-48); symmetric L1
    commitment loss (vae.py:12-16).
  * Discriminator      — multi-scale conv net with per-stage 1x1 early-exit
    heads; logit = sum over stages of the head mean (vae.py:134-171).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm_image_generator_tpu.config import DiscriminatorConfig, VAEConfig

Dtype = jnp.dtype


class ResBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="c1")(x)
        x = jax.nn.leaky_relu(x)  # negative_slope 0.01 matches F.leaky_relu default
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="c2")(x)
        x = jax.nn.leaky_relu(x)
        return x + s


class ResStack(nn.Module):
    channels: int
    num_layers: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResBlock(self.channels, dtype=self.dtype, name=f"res_{i}")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chs = list(cfg.encoder_channels)
        x = x.astype(self.dtype)
        x = nn.Dense(chs[0], dtype=self.dtype, name="input_layer")(x)
        for i, (c, l) in enumerate(zip(chs, cfg.encoder_stages)):
            x = ResStack(c, l, dtype=self.dtype, name=f"stage_{i}")(x)
            if i != len(chs) - 1:  # downsample between stages (vae.py:84-89)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                x = nn.Dense(chs[i + 1], dtype=self.dtype, name=f"down_{i}")(x)
        return nn.Dense(cfg.latent_channels, dtype=self.dtype, name="output_layer")(x)


class DecoderStack(nn.Module):
    channels: int
    num_layers: int = 2
    output_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResStack(self.channels, self.num_layers, dtype=self.dtype, name="layers")(x)
        rgb = nn.Dense(self.output_channels, dtype=self.dtype, name="to_rgb")(x)
        return x, rgb


def bilinear_up_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)
    equivalent: jax.image.resize uses half-pixel centers (vae.py:131)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class Decoder(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chs = list(cfg.decoder_channels)
        z = z.astype(self.dtype)
        x = nn.Dense(chs[0], dtype=self.dtype, name="input_layer")(z)
        rgb_out = None
        for i, (c, l) in enumerate(zip(chs, cfg.decoder_stages)):
            if i != 0:  # ConvTranspose2d(k=2, s=2) upsample (vae.py:120)
                x = nn.ConvTranspose(
                    c, (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"up_{i}",
                )(x)
            x, rgb = DecoderStack(
                c, l, cfg.input_channels, dtype=self.dtype, name=f"stage_{i}"
            )(x)
            if rgb_out is None:
                rgb_out = rgb
            else:
                rgb_out = bilinear_up_2x(rgb_out) + rgb
        return rgb_out


class VectorQuantizer(nn.Module):
    """Learned codebook with nearest-neighbor assignment (vae.py:7-26).

    Used purely as a latent regularizer: `loss` computes the symmetric L1
    commitment loss between continuous latents and their (non-differentiable)
    nearest codebook entries.
    """

    num_embeddings: int = 8192
    dim: int = 8

    def setup(self):
        # torch.randn init (vae.py:10)
        self.embeddings = self.param(
            "embeddings",
            nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.dim),
        )

    def quantize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Nearest codebook index per vector. x: [..., D] -> [...] int32.

        argmin of squared Euclidean distance == the reference's
        argmax(-cdist) (vae.py:18-22). On TPU this dispatches to the
        fused Pallas kernel (kernels/vq.py) that keeps the [N, K] score
        tile in VMEM; elsewhere it's one MXU matmul plus norms.
        """
        from ldm_image_generator_tpu.kernels.vq import nearest_codebook_indices

        e = jax.lax.stop_gradient(self.embeddings)
        xf = jax.lax.stop_gradient(x)
        return nearest_codebook_indices(xf, e)

    def embed(self, idx: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embeddings, idx, axis=0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Symmetric L1 commitment loss (vae.py:12-16)."""
        e = self.embed(self.quantize(x))
        reg = jnp.mean(jnp.abs(x - jax.lax.stop_gradient(e)))
        emb = jnp.mean(jnp.abs(e - jax.lax.stop_gradient(x)))
        return reg + emb


class Discriminator(nn.Module):
    cfg: DiscriminatorConfig = DiscriminatorConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, features: bool = False):
        """Returns the scalar logit: sum over stages of mean 1x1-head output
        (vae.py:163-170). With features=True also returns the per-stage
        feature maps (for the feature-matching loss, vae.py:148-161)."""
        cfg = self.cfg
        chs = list(cfg.channels)
        stem = cfg.stem_size
        x = x.astype(self.dtype)
        x = nn.Conv(
            chs[0], (stem, stem), strides=(stem, stem), padding="VALID",
            dtype=self.dtype, name="input_layer",
        )(x)
        logit = 0.0
        feats = []
        for i, (c, l) in enumerate(zip(chs, cfg.stages)):
            x = ResStack(c, l, dtype=self.dtype, name=f"stage_{i}")(x)
            feats.append(x)
            logit = logit + jnp.mean(
                nn.Dense(1, dtype=self.dtype, name=f"early_exit_{i}")(x)
            )
            if i != len(chs) - 1:  # strided 2x2 conv downsample (vae.py:143-145)
                x = nn.Conv(
                    chs[i + 1], (2, 2), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name=f"down_{i}",
                )(x)
        if features:
            return logit, feats
        return logit


def feature_matching_loss(feats_fake: Sequence[jnp.ndarray],
                          feats_real: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """L1 feature matching across discriminator stages (vae.py:148-161;
    present in the reference API though never called by its trainers)."""
    loss = 0.0
    for f, r in zip(feats_fake, feats_real):
        loss = loss + jnp.mean(jnp.abs(f - jax.lax.stop_gradient(r)))
    return loss


def vae_loss(encoder_apply, decoder_apply, quantizer_apply, x,
             noise_key, noise_gain: float = 0.1) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Functional form of VAE.calclate_loss (vae.py:36-43): encode, add
    Gaussian noise * noise_gain, VQ commitment loss on [B, HW, D]-shaped
    latents, decode, L1 reconstruction. Returns (recon, reg, y)."""
    z = encoder_apply(x)
    z = z + jax.random.normal(noise_key, z.shape, dtype=z.dtype) * noise_gain
    b, h, w, d = z.shape
    reg = quantizer_apply(z.reshape(b, h * w, d))
    y = decoder_apply(z)
    recon = jnp.mean(jnp.abs(jax.lax.stop_gradient(x) - y))
    return recon, reg, y


class VAE:
    """Object-style wrapper composing encoder/decoder/quantizer with their
    params (API parity with the reference VAE class, vae.py:29-52; the
    reference's ``calclate_loss`` typo is kept as an alias)."""

    def __init__(self, encoder: Encoder, decoder: Decoder,
                 quantizer: VectorQuantizer,
                 encoder_params=None, decoder_params=None,
                 quantizer_params=None):
        self.encoder = encoder
        self.decoder = decoder
        self.quantizer = quantizer
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        self.quantizer_params = quantizer_params

    def calculate_loss(self, x, noise_key, noise_gain: float = 0.1):
        """(recon, reg, y) exactly as vae.py:36-43."""
        return vae_loss(
            lambda v: self.encoder.apply(self.encoder_params, v),
            lambda v: self.decoder.apply(self.decoder_params, v),
            lambda v: self.quantizer.apply(self.quantizer_params, v),
            x, noise_key, noise_gain,
        )

    calclate_loss = calculate_loss  # reference spelling (vae.py:36)

    def encode(self, x):
        return self.encoder.apply(self.encoder_params, x)

    def decode(self, z):
        return self.decoder.apply(self.decoder_params, z)
