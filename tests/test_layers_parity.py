"""Per-layer forward parity vs the reference torch modules via converted
weights (SURVEY.md §4 'fidelity vs reference')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldm_image_generator_tpu.models.layers import (
    CrossAttention,
    Encodings,
    MultiHeadAttention,
    RandomMoE,
    ReGLU,
    WindowAttention,
)
from ldm_image_generator_tpu.utils import torch_import as ti

from tests.reference_util import import_reference, to_nhwc

TOL = dict(rtol=2e-4, atol=2e-5)


def _sd(mod):
    return {k: v for k, v in mod.state_dict().items()}


def test_mha_matches_torch():
    import torch

    torch.manual_seed(0)
    c, heads = 32, 4
    ref = torch.nn.MultiheadAttention(c, heads, batch_first=True).eval()
    x = torch.randn(3, 10, c)
    with torch.no_grad():
        ref_out, _ = ref(x, x, x)

    # _mha expects prefix+".in_proj_weight" — use an empty prefix
    sd = {"." + k: v for k, v in _sd(ref).items()}
    params = {"params": ti._mha(sd, "")}
    ours = MultiHeadAttention(c, heads).apply(params, jnp.asarray(x.numpy()),
                                              jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), **TOL)


def test_mha_key_padding_mask_matches_torch():
    import torch

    torch.manual_seed(1)
    c, heads = 16, 2
    ref = torch.nn.MultiheadAttention(c, heads, batch_first=True).eval()
    x = torch.randn(2, 8, c)
    mask = torch.zeros(2, 8, dtype=torch.bool)
    mask[:, 6:] = True
    with torch.no_grad():
        ref_out, _ = ref(x, x, x, key_padding_mask=mask)
    sd = {"." + k: v for k, v in _sd(ref).items()}
    ours = MultiHeadAttention(c, heads).apply(
        {"params": ti._mha(sd, "")},
        jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
        key_padding_mask=jnp.asarray(mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(), **TOL)


def test_reglu_matches_reference():
    modules = import_reference("modules")
    import torch

    torch.manual_seed(2)
    ref = modules.ReGLU(12, ffn_mul=2).eval()
    x = torch.randn(2, 12, 5, 5)
    with torch.no_grad():
        ref_out = ref(x)
    params = {"params": ti._reglu({"." + k: v for k, v in _sd(ref).items()}, "")}
    ours = ReGLU(12, ffn_mul=2).apply(params, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_out), **TOL)


def test_random_moe_matches_reference_fixed_experts(monkeypatch):
    modules = import_reference("modules")
    import torch
    import random as pyrandom

    torch.manual_seed(3)
    ref = modules.RandomMoE(8, ffn_mul=1, num_experts=4).eval()
    # pin the reference's routing to experts [0, 1]
    monkeypatch.setattr(pyrandom, "sample", lambda pop, k: list(pop)[:k])
    x = torch.randn(2, 8, 4, 4)
    with torch.no_grad():
        ref_out = ref(x)
    sd = {"." + k: v for k, v in _sd(ref).items()}
    params = {"params": ti._random_moe(sd, "", 4)}
    ours = RandomMoE(8, ffn_mul=1, num_experts=4).apply(
        params, jnp.asarray(to_nhwc(x)), expert_indices=jnp.asarray([0, 1])
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_out), **TOL)


def test_encodings_matches_reference():
    unet_ref = import_reference("unet")
    import torch

    torch.manual_seed(4)
    c = 16
    ref = unet_ref.Encodings(c).eval()
    x = torch.randn(2, c, 7, 9)
    t = torch.tensor([3, 500])
    with torch.no_grad():
        ref_out = ref(x, t)
    sd = {"." + k: v for k, v in _sd(ref).items()}
    params = {"params": ti._encodings(sd, "")}
    ours = Encodings(c).apply(params, jnp.asarray(to_nhwc(x)),
                              jnp.asarray([3, 500]))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_out), **TOL)


@pytest.mark.parametrize("hw", [(6, 6), (4, 5), (8, 8), (13, 9)])
def test_window_attention_matches_reference_unshifted(hw):
    """Bypass path (hw <= ws) and padded-window path, shift=0.

    The reference's shifted path is numerically buggy (attention.py:40
    uses rolled activations as the mask) so parity is only asserted for
    shift=0; the fixed shifted path is covered by its own tests.
    """
    attention = import_reference("attention")
    import torch

    torch.manual_seed(5)
    h, w = hw
    c, heads, ws = 16, 2, 6
    ref = attention.WindowAttention(c, n_heads=heads, window_size=ws, shift=0).eval()
    x = torch.randn(2, c, h, w)
    with torch.no_grad():
        ref_out = ref(x)
    sd = _sd(ref)
    params = {"params": {"mha": ti._mha(sd, "attention")}}
    ours = WindowAttention(c, heads, window_size=ws, shift=0).apply(
        params, jnp.asarray(to_nhwc(x))
    )
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref_out), **TOL)


def test_window_attention_shifted_runs_and_crops():
    key = jax.random.PRNGKey(0)
    m = WindowAttention(16, 2, window_size=6, shift=3)
    x = jax.random.normal(key, (2, 8, 8, 16))
    params = m.init(key, x)
    out = m.apply(params, x)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_cross_attention_returns_output():
    """The reference CrossAttention returns None (attention.py:92-99);
    ours must return the attended map."""
    key = jax.random.PRNGKey(0)
    m = CrossAttention(16, 2)
    x = jax.random.normal(key, (2, 4, 4, 16))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    params = m.init(key, x, cond)
    out = m.apply(params, x, cond)
    assert out is not None and out.shape == x.shape
