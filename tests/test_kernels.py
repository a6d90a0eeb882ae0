"""Pallas kernels vs their XLA reference implementations (SURVEY.md §4
kernel-tier tests; interpret mode on the CPU backend)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldm_image_generator_tpu.kernels.vq import (
    nearest_codebook_indices,
    nearest_codebook_indices_pallas,
    nearest_codebook_indices_xla,
)


def test_vq_kernel_matches_xla():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (777, 8))
    cb = jax.random.normal(jax.random.PRNGKey(1), (1024, 8))
    ref = nearest_codebook_indices_xla(x, cb)
    out = nearest_codebook_indices_pallas(x, cb, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vq_kernel_matches_torch_reference():
    import torch

    from tests.reference_util import import_reference

    vae_ref = import_reference("vae")
    torch.manual_seed(0)
    ref_q = vae_ref.VectorQuantizer(num_embeddings=256, dim=8)
    x = torch.randn(2, 100, 8)
    with torch.no_grad():
        ref_idx = ref_q.quantize(x).numpy()
    cb = jnp.asarray(ref_q.embeddings.detach().numpy())
    out = nearest_codebook_indices_pallas(
        jnp.asarray(x.numpy()).reshape(-1, 8), cb, interpret=True
    ).reshape(2, 100)
    np.testing.assert_array_equal(np.asarray(out), ref_idx)


def test_vq_dispatcher_cpu_path():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, 8))
    cb = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    idx = nearest_codebook_indices(x, cb)
    assert idx.shape == (3, 5)
