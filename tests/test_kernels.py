"""Pallas kernels vs their XLA reference implementations (SURVEY.md §4
kernel-tier tests; interpret mode on the CPU backend)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


def test_grouped_conv_packed_matches_naive():
    """Block-diagonal 128-wide repack == plain 32-wide grouped conv."""
    from ldm_image_generator_tpu.models.layers import GroupedConv2d

    key = jax.random.PRNGKey(0)
    c = 256
    x = jax.random.normal(key, (2, 8, 8, c))
    packed = GroupedConv2d(c, group_width=32)
    naive = GroupedConv2d(c, group_width=32, packed_width=32)  # no repack
    params = packed.init(key, x)
    out_p = packed.apply(params, x)
    out_n = naive.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_n),
                               rtol=1e-5, atol=1e-5)


def test_grouped_conv_matches_torch_grouped():
    import torch

    c, gw = 128, 32
    torch.manual_seed(0)
    ref = torch.nn.Conv2d(c, c, 3, 1, 1, groups=c // gw)
    x = torch.randn(2, c, 6, 6)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    from ldm_image_generator_tpu.models.layers import GroupedConv2d
    from ldm_image_generator_tpu.utils.torch_import import conv_kernel

    params = {"params": {
        "kernel": conv_kernel(ref.weight),
        "bias": ref.bias.detach().numpy(),
    }}
    ours = GroupedConv2d(c, group_width=gw).apply(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5)


def test_window_mha_pallas_matches_xla():
    from ldm_image_generator_tpu.kernels.window_attention import (
        window_mha_pallas,
        window_mha_xla,
    )

    key = jax.random.PRNGKey(0)
    n, l, c, h = 13, 36, 128, 4
    x = jax.random.normal(key, (n, l, c))
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    wq, wk, wv, wo = (jax.random.normal(k, (c, c)) * 0.05 for k in ks[:4])
    bq, bk, bv, bo = (jax.random.normal(k, (c,)) * 0.05 for k in ks[4:])
    mask = jnp.zeros((n, l), dtype=bool).at[:, 30:].set(True)

    ref = window_mha_xla(x, mask, wq, bq, wk, bk, wv, bv, wo, bo, h)
    out = window_mha_pallas(x, mask, wq, bq, wk, bk, wv, bv, wo, bo,
                            num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # no-mask path
    ref = window_mha_xla(x, None, wq, bq, wk, bk, wv, bv, wo, bo, h)
    out = window_mha_pallas(x, None, wq, bq, wk, bk, wv, bv, wo, bo,
                            num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,l,c,h,fold", [
    (16, 36, 256, 8, 4),    # dec1 shape, even fold
    (8, 36, 512, 16, 4),    # dec2 shape
    (8, 36, 512, 16, 3),    # ragged fold (16 = 3+3+3+3+3+1)
    (8, 16, 1024, 32, 8),   # dec3 full-map shape
    (6, 36, 256, 8, 5),     # fold > half: groups (5, 3)
])
def test_window_mha_folded_matches_xla(n, l, c, h, fold):
    """Head-folded block-diagonal joint matmul (fold>1) must be exact vs
    the per-head XLA reference for any head partition, masked and not."""
    from ldm_image_generator_tpu.kernels.window_attention import (
        window_mha_pallas,
        window_mha_xla,
    )

    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (n, l, c))
    w = lambda i: jax.random.normal(ks[i], (c, c)) * 0.05
    b = lambda i: jax.random.normal(ks[i + 4], (c,)) * 0.01
    args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))
    mask = jax.random.uniform(ks[9], (n, l)) < 0.25

    for m in (mask, None):
        ref = window_mha_xla(x, m, *args, num_heads=h)
        out = window_mha_pallas(x, m, *args, num_heads=h, interpret=True,
                                fold=fold)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_window_mha_grad_matches_xla():
    from ldm_image_generator_tpu.kernels.window_attention import (
        fused_window_mha,
        window_mha_xla,
    )
    from unittest import mock
    import ldm_image_generator_tpu.kernels.window_attention as wa

    key = jax.random.PRNGKey(0)
    n, l, c, h = 4, 16, 128, 4
    x = jax.random.normal(key, (n, l, c))
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    wq, wk, wv, wo = (jax.random.normal(k, (c, c)) * 0.05 for k in ks[:4])
    bq, bk, bv, bo = (jax.random.normal(k, (c,)) * 0.05 for k in ks[4:])

    # forward via interpret-mode pallas inside the custom_vjp
    orig = wa.window_mha_pallas
    with mock.patch.object(
        wa, "window_mha_pallas",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    ):
        def f_fused(x, wq):
            return jnp.sum(
                fused_window_mha(x, None, wq, bq, wk, bk, wv, bv, wo, bo, h)
                ** 2
            )

        gx, gw = jax.grad(f_fused, argnums=(0, 1))(x, wq)

    def f_ref(x, wq):
        return jnp.sum(
            window_mha_xla(x, None, wq, bq, wk, bk, wv, bv, wo, bo, h) ** 2
        )

    rx, rw = jax.grad(f_ref, argnums=(0, 1))(x, wq)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("n,l,c,h,fold", [
    (13, 36, 128, 4, 1),    # per-head path, ragged tile
    (16, 36, 256, 8, 4),    # folded path
    (8, 16, 256, 8, 8),     # short full-map sequence, full fold
    (6, 36, 256, 8, 5),     # ragged groups (5, 3)
])
def test_window_mha_bwd_pallas_matches_xla_vjp(n, l, c, h, fold):
    """The fused Pallas attention backward must reproduce the XLA VJP:
    dx and every projection weight/bias grad, masked and unmasked, for
    per-head and head-folded group partitions."""
    from ldm_image_generator_tpu.kernels.window_attention import (
        window_mha_bwd_pallas,
        window_mha_xla,
    )

    ks = jax.random.split(jax.random.PRNGKey(2), 11)
    x = jax.random.normal(ks[0], (n, l, c))
    g = jax.random.normal(ks[10], (n, l, c))
    w = lambda i: jax.random.normal(ks[i], (c, c)) * 0.05
    b = lambda i: jax.random.normal(ks[i + 4], (c,)) * 0.01
    wq, wk, wv, wo = w(1), w(2), w(3), w(4)
    bq, bk, bv, bo = b(1), b(2), b(3), b(4)
    mask = jax.random.uniform(ks[9], (n, l)) < 0.25

    for m in (mask, None):
        _, vjp = jax.vjp(
            lambda x_, *ws: window_mha_xla(x_, m, *ws, num_heads=h),
            x, wq, bq, wk, bk, wv, bv, wo, bo,
        )
        rx, rwq, rbq, rwk, rbk, rwv, rbv, rwo, rbo = vjp(g)
        dx, dwqkv, dbqkv, dwo, dbo = window_mha_bwd_pallas(
            x, m, g, wq, bq, wk, bk, wv, bv, wo, bo,
            num_heads=h, interpret=True, fold=fold,
        )
        cmp = lambda a, r: np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4)
        cmp(dx, rx)
        cmp(dwqkv[:, 0 * c:1 * c], rwq)
        cmp(dwqkv[:, 1 * c:2 * c], rwk)
        cmp(dwqkv[:, 2 * c:3 * c], rwv)
        cmp(dbqkv[0 * c:1 * c], rbq)
        cmp(dbqkv[1 * c:2 * c], rbk)
        cmp(dbqkv[2 * c:3 * c], rbv)
        cmp(dwo, rwo)
        cmp(dbo, rbo)


def test_attn_bwd_gate(monkeypatch):
    """Gate envelope after hardware validation (2026-08-19 truth
    check): Pallas backward is default-on for C<=512 on TPU, off for
    the C=1024 fold-8 stage (remote Mosaic crash), off everywhere on
    non-TPU backends, and LDM_ATTN_BWD=xla forces it off."""
    import ldm_image_generator_tpu.kernels.window_attention as wa
    from unittest import mock

    monkeypatch.delenv("LDM_ATTN_BWD", raising=False)
    xb = jnp.zeros((4, 16, 512), jnp.bfloat16)
    with mock.patch.object(jax, "default_backend", lambda: "tpu"):
        assert wa._attn_bwd_usable(xb, 512)
        assert not wa._attn_bwd_usable(
            jnp.zeros((4, 16, 1024), jnp.bfloat16), 1024)
        assert not wa._attn_bwd_usable(xb.astype(jnp.float32), 512)
        monkeypatch.setenv("LDM_ATTN_BWD", "xla")
        assert not wa._attn_bwd_usable(xb, 512)
        monkeypatch.setenv("LDM_ATTN_BWD", "pallas")
        assert wa._attn_bwd_usable(
            jnp.zeros((4, 16, 1024), jnp.bfloat16), 1024)
        monkeypatch.delenv("LDM_ATTN_BWD", raising=False)
    assert not wa._attn_bwd_usable(xb, 512)  # cpu backend: XLA VJP

    def boom(*a, **kw):
        raise AssertionError("Pallas bwd must not be reached on CPU")

    n, l, c, h = 4, 16, 128, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (n, l, c))
    w = lambda i: jax.random.normal(ks[i], (c, c)) * 0.05
    b = lambda i: jax.random.normal(ks[i + 4], (c,)) * 0.01
    args = (w(1), b(1), w(2), b(2), w(3), b(3), w(4), b(4))

    orig = wa.window_mha_pallas
    with mock.patch.object(wa, "window_mha_bwd_pallas", boom), \
         mock.patch.object(
             wa, "window_mha_pallas",
             lambda *a, **kw: orig(*a, **{**kw, "interpret": True})):
        g = jax.grad(lambda x_: jnp.sum(
            wa.fused_window_mha(x_, None, *args, num_heads=h) ** 2))(x)
    assert bool(jnp.isfinite(g).all())
