"""Golden numerics for the stateless ops layer (SURVEY.md §4 unit tests)."""
import numpy as np
import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.ops import (
    channel_norm,
    merge_windows,
    pad_to_window_multiple,
    partition_windows,
    positional_encoding_2d,
    time_encoding_2d,
)
from ldm_image_generator_tpu.ops.window import pad_mask, shift_2d

from tests.reference_util import import_reference


def test_channel_norm_matches_reference():
    modules = import_reference("modules")
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 5, 7).astype(np.float32)  # NCHW for torch
    ref = modules.ChannelNorm(16)(torch.from_numpy(x)).numpy()
    ours = channel_norm(jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


def test_positional_encoding_matches_reference():
    sinus = import_reference("sinusoidal")
    import torch

    c, h, w = 32, 9, 13
    pe_ref = sinus.PositionalEncoding2d(c, return_encoding_only=True)
    x = torch.zeros(2, c, h, w)
    ref = pe_ref(x).numpy()  # [2, C, H, W]
    ours = np.asarray(positional_encoding_2d(h, w, c))  # [H, W, C]
    np.testing.assert_allclose(ours, ref[0].transpose(1, 2, 0), rtol=1e-5, atol=1e-6)


def test_time_encoding_matches_reference():
    sinus = import_reference("sinusoidal")
    import torch

    c = 64
    te_ref = sinus.TimeEncoding2d(c, return_encoding_only=True)
    t = torch.tensor([0, 1, 17, 999])
    x = torch.zeros(4, c, 3, 3)
    ref = te_ref(x, t).numpy()  # [4, C, 3, 3]
    ours = np.asarray(time_encoding_2d(jnp.asarray([0, 1, 17, 999]), c))  # [B,1,1,C]
    np.testing.assert_allclose(
        np.broadcast_to(ours.transpose(0, 3, 1, 2), ref.shape)[:, :, 0, 0],
        ref[:, :, 0, 0],
        rtol=1e-5, atol=1e-6,
    )


def test_window_partition_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 12, 18, 5).astype(np.float32))
    wins = partition_windows(x, 6)
    assert wins.shape == (3 * 2 * 3, 36, 5)
    back = merge_windows(wins, 3, 12, 18, 6)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_is_batch_major():
    # batch index must be the slowest-varying axis of the window dim,
    # matching the mask tiling in WindowAttention.
    b, ws = 2, 2
    x = jnp.arange(b * 4 * 4).reshape(b, 4, 4, 1).astype(jnp.float32)
    wins = partition_windows(x, ws)
    # first b windows should come from batch 0 then batch 1? No:
    # layout is [B, nH, nW, ...] flattened, so windows [0:4] are batch 0.
    assert float(wins[0, 0, 0]) == 0.0
    assert float(wins[4, 0, 0]) == 16.0  # first element of batch 1


def test_pad_and_mask():
    x = jnp.ones((1, 8, 8, 4))
    xp, h, w = pad_to_window_multiple(x, 6)
    assert xp.shape == (1, 12, 12, 4) and (h, w) == (8, 8)
    m = pad_mask(8, 8, 12, 12)
    assert m.shape == (12, 12)
    assert not bool(m[:8, :8].any())
    assert bool(m[8:, :].all()) and bool(m[:, 8:].all())


def test_shift_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 12, 12, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(shift_2d(shift_2d(x, 3), -3)), np.asarray(x)
    )


def test_named_scopes_in_lowered_hlo():
    """Per-stage jax.named_scope annotations must survive into the
    lowered module so profiler traces attribute time (VERDICT item 8)."""
    import jax
    import jax.numpy as jnp
    from ldm_image_generator_tpu.config import UNetConfig
    from ldm_image_generator_tpu.models import UNet

    cfg = UNetConfig(input_channels=4, stages=(1, 1), channels=(32, 64))
    model = UNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": key, "moe": key, "sd": key}, x, t)

    def fwd(p, x, t):
        return model.apply(p, x, t, deterministic=True,
                           rngs={"moe": jax.random.PRNGKey(1)})

    text = jax.jit(fwd).lower(params, x, t).as_text(debug_info=True)
    for scope in ("enc_stage_0", "dec_stage_1", "moe_ffn", "grouped_conv",
                  "window_attention"):
        assert scope in text, f"named scope {scope!r} missing from HLO"

