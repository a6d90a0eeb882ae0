"""Frozen dataclass config tree for every model / engine in the framework.

The reference scatters hyperparameters across Python defaults
(unet.py:75, vae.py:77,110,135, ddpm.py:16) and per-script argparse flags
with divergent sets (train_vae.py:15-32, train_ldm.py:11-26). Here a single
typed config tree is the source of truth; CLI front-ends construct/override
these. ``input_channels`` is configurable so the pixel-space DDPM config
actually runs (the reference's train_ddpm.py crashes with the default
8-channel UNet on 3-channel images).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Denoiser UNet (reference unet.py:75 defaults)."""

    input_channels: int = 8
    stages: Sequence[int] = (3, 3, 9, 3)
    channels: Sequence[int] = (128, 256, 512, 1024)
    stem_size: int = 1
    head_dim: int = 32
    window_size: int = 6
    num_experts: int = 4
    experts_per_call: int = 2
    ffn_mul: int = 1  # MoE expert ReGLU expansion (modules.py:29)
    stochastic_depth: float = 0.25
    # Deterministic MoE routing for parity tests / debugging; None = random
    # 2-of-num_experts per call (the reference behavior, modules.py:35).
    fixed_expert_indices: "tuple | None" = None
    # Debug/profiling: SwinBlock branch names to skip at apply time
    # ('norm','film','moe','conv','attn'); params still created.
    ablate_branches: "tuple | None" = None
    # 'auto': fused Pallas window attention on stages where it measures
    # faster than XLA (<= 4 heads — the C=128 stage; benchmarks/
    # attn_shapes.py); 'pallas'/'xla' force one backend everywhere.
    attention_backend: str = "auto"
    # 'auto'/'pallas': fused channel_norm+FiLM+MoE-FFN Pallas kernel per
    # block on TPU (kernels/ffn_block.py, -18% denoise step); 'xla' off.
    ffn_backend: str = "auto"
    # Rematerialize stages in backward (jax.checkpoint): trades recompute
    # for activation memory — enables large-batch training in 16GB HBM.
    remat: bool = False
    # 'int8': per-output-channel int8 MoE-FFN weights on the fused TPU
    # kernels — halves the FFN weight *bytes* (HBM capacity / multi-model
    # serving), ~1.4% full-model output error. NOT a speed win on this
    # chip (measured b1 denoise 1.9 -> 2.2 ms: the in-kernel VPU dequant
    # outweighs the DMA savings); keep 'none' for latency.
    ffn_quant: str = "none"
    # Class-conditional generation (a working product surface for the
    # conditioning path the reference stubs out — ddpm.py:78 hardcodes
    # condition=None and its CrossAttention returns None). num_classes>0
    # adds a learned class-embedding table of cond_tokens tokens x
    # cond_channels dims (plus one extra "null" row used as the CFG
    # unconditional embedding), consumed by the decoder stages'
    # cross-attention. 0 = unconditional (reference-equivalent params).
    num_classes: int = 0
    cond_channels: int = 256
    cond_tokens: int = 4

    def tiny(self) -> "UNetConfig":
        return dataclasses.replace(
            self, stages=(1, 1), channels=(32, 64), input_channels=self.input_channels
        )

    def tiny_deep(self) -> "UNetConfig":
        """Tiny preset with a deep (pipelinable) first stack — test/debug
        scale for the --pipeline-stages mode (a stack pipelines only
        when its homogeneous prefix divides into the stages)."""
        return dataclasses.replace(
            self, stages=(2, 1), channels=(32, 64),
            input_channels=self.input_channels,
        )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """VQ-regularized autoencoder (reference vae.py:77,110 defaults)."""

    input_channels: int = 3
    latent_channels: int = 8
    encoder_channels: Sequence[int] = (64, 128, 256, 512)
    encoder_stages: Sequence[int] = (2, 2, 2, 2)
    decoder_channels: Sequence[int] = (512, 256, 128, 64)
    decoder_stages: Sequence[int] = (2, 2, 2, 2)
    num_embeddings: int = 8192  # VQ codebook (vae.py:8)
    embedding_dim: int = 8

    @property
    def downscale(self) -> int:
        # one 2x down between consecutive encoder stages (vae.py:84-89)
        return 2 ** (len(self.encoder_channels) - 1)

    def tiny(self) -> "VAEConfig":
        return dataclasses.replace(
            self,
            encoder_channels=(16, 32),
            encoder_stages=(1, 1),
            decoder_channels=(32, 16),
            decoder_stages=(1, 1),
            num_embeddings=64,
        )


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """Multi-scale conv discriminator (reference vae.py:135 defaults)."""

    input_channels: int = 3
    channels: Sequence[int] = (32, 48, 48, 96)
    stages: Sequence[int] = (2, 2, 2, 2)
    stem_size: int = 1


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    """Diffusion schedule + loss (reference ddpm.py:16)."""

    beta_min: float = 1e-4
    beta_max: float = 0.02
    num_timesteps: int = 1000
    loss: str = "l1"  # reference default nn.L1Loss (ddpm.py:16)
    # CFG bounds are stored by the reference but never used (ddpm.py:24-25);
    # kept for config parity.
    lambda_max: float = 20.0
    lambda_min: float = -20.0
    # Model output parameterization: 'eps' (reference behavior) or 'v'
    # (v = sqrt(ab)*eps - sqrt(1-ab)*x0, Salimans & Ho 2022,
    # arXiv:2202.00512) — better-conditioned targets at high noise and
    # required for zero-SNR schedules.
    prediction: str = "eps"
    # Rescale the schedule so alpha_bar[T-1] == 0 (Lin et al. 2023,
    # arXiv:2305.08891): the terminal step carries zero signal, fixing the
    # train/sample mismatch where x_T is pure noise at sampling but not in
    # training. Requires prediction='v' (eps is undefined at SNR 0).
    zero_terminal_snr: bool = False


@dataclasses.dataclass(frozen=True)
class Precision:
    """Mixed-precision policy: bf16 compute on the MXU, fp32 params/opt."""

    compute_dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def full() -> "Precision":
        return Precision(compute_dtype=jnp.float32)


DEFAULT_PRECISION = Precision()
FULL_PRECISION = Precision.full()
