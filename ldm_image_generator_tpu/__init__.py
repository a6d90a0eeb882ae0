"""ldm_image_generator_tpu — TPU-native latent diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
uthree/ldm-image-generator (reference at /root/reference): a VQ-regularized
convolutional autoencoder trained with an adversarial discriminator, a DDPM
epsilon-prediction Swin-UNet trained on frozen VAE latents, and a DDIM
sampler + decoder pipeline.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere, bf16 compute / fp32 params+optimizer.
  * Everything hot lives under ``jax.jit``: the 20-step DDIM chain plus VAE
    decode is a single compiled ``lax.scan`` with zero host round-trips
    (the reference syncs per step for tqdm, ddpm.py:87).
  * Stochasticity (stochastic depth, MoE routing) is traced ``jax.random``
    with static shapes — the reference uses Python ``random`` per forward
    (unet.py:39, modules.py:35) which would force recompiles.
  * Scaling is a ``jax.sharding.Mesh`` with named axes (data / model);
    collectives are emitted by XLA from sharding annotations.
  * Hot ops (window attention, norm+FiLM fusion) have Pallas TPU kernels
    with pure-XLA fallbacks.
"""

__version__ = "0.1.0"

from ldm_image_generator_tpu.config import (  # noqa: F401
    DDPMConfig,
    DiscriminatorConfig,
    UNetConfig,
    VAEConfig,
)
