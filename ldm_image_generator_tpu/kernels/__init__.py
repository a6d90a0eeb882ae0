"""Pallas TPU kernels with pure-XLA fallbacks.

Every kernel here has:
  * an XLA reference implementation (`*_xla`) used on CPU and as the
    numerical oracle in tests;
  * a Pallas TPU implementation used automatically on TPU backends;
  * a dispatcher that picks per-backend (`interpret=True` under CPU for
    tests).
"""
from ldm_image_generator_tpu.kernels.vq import (  # noqa: F401
    nearest_codebook_indices,
    nearest_codebook_indices_xla,
)
