"""UNetConfig MoE fields (num_experts / experts_per_call / ffn_mul) must
actually reach RandomMoE — no config field is a silent no-op
(VERDICT.md round-1 item 3)."""
import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import UNetConfig
from ldm_image_generator_tpu.models import UNet

BASE = UNetConfig(input_channels=4, stages=(1, 1), channels=(32, 64))


def _init(cfg, seed=0):
    model = UNet(cfg)
    key = jax.random.PRNGKey(seed)
    x = jnp.ones((1, 8, 8, cfg.input_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": key, "moe": key, "sd": key}, x, t)
    return model, params, x, t


def _moe_leaf(params):
    # first SwinBlock's stacked expert tensor
    return params["params"]["enc_stage_0"]["block_0"]["ffn"]


def test_num_experts_changes_param_tree():
    _, p4, _, _ = _init(BASE)
    _, p6, _, _ = _init(UNetConfig(**{**BASE.__dict__, "num_experts": 6}))
    assert _moe_leaf(p4)["wa"].shape[0] == 4
    assert _moe_leaf(p6)["wa"].shape[0] == 6


def test_ffn_mul_changes_param_tree_and_output():
    m1, p1, x, t = _init(BASE)
    cfg2 = UNetConfig(**{**BASE.__dict__, "ffn_mul": 2})
    m2, p2, _, _ = _init(cfg2)
    assert _moe_leaf(p1)["wa"].shape[2] == 32
    assert _moe_leaf(p2)["wa"].shape[2] == 64
    # same seed, different architecture -> different outputs
    rngs = {"moe": jax.random.PRNGKey(1)}
    y1 = m1.apply(p1, x, t, deterministic=True, rngs=rngs)
    y2 = m2.apply(p2, x, t, deterministic=True, rngs=rngs)
    assert y1.shape == y2.shape
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_experts_per_call_changes_output():
    cfg1 = UNetConfig(**{**BASE.__dict__, "experts_per_call": 1})
    cfg3 = UNetConfig(**{**BASE.__dict__, "experts_per_call": 3})
    m1, p, x, t = _init(cfg1)
    m3 = UNet(cfg3)
    rngs = {"moe": jax.random.PRNGKey(2)}
    y1 = m1.apply(p, x, t, deterministic=True, rngs=rngs)
    y3 = m3.apply(p, x, t, deterministic=True, rngs=rngs)
    # identical params (routing count is apply-time only): more active
    # experts must change the result
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    assert np.isfinite(np.asarray(y1)).all() and np.isfinite(np.asarray(y3)).all()
