"""Stratified validation-loss evaluator (additive — the reference has no
eval loop)."""
import numpy as np

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
from ldm_image_generator_tpu.diffusion import make_schedule
from ldm_image_generator_tpu.models import UNet
from ldm_image_generator_tpu.train import (
    LDMTrainState,
    make_eval_step,
    make_ldm_train_step,
    make_optimizer,
)


def _tiny():
    cfg = UNetConfig(input_channels=4, stages=(1, 1), channels=(16, 32))
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    params = unet.init({"params": key, "moe": key, "sd": key},
                       x, jnp.zeros((2,), jnp.int32))
    return unet, schedule, params, x


def test_eval_deterministic_and_param_sensitive():
    unet, schedule, params, x = _tiny()
    ev = jax.jit(make_eval_step(unet, schedule, num_t=4))
    k = jax.random.PRNGKey(5)
    a = float(ev(params, x, k))
    b = float(ev(params, x, k))
    assert a == b  # bit-identical: fixed noise, fixed grid, fixed routing
    assert np.isfinite(a)
    # different key -> different noise draw -> different loss
    c = float(ev(params, x, jax.random.PRNGKey(6)))
    assert a != c
    # perturbed params -> different loss
    p2 = jax.tree.map(lambda v: v + 0.05, params)
    assert a != float(ev(p2, x, k))


def test_eval_tracks_training():
    unet, schedule, params, x = _tiny()
    tx = make_optimizer("adamw", 1e-3)
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_ldm_train_step(unet, schedule, tx))
    ev = jax.jit(make_eval_step(unet, schedule, num_t=4))
    k = jax.random.PRNGKey(5)
    before = float(ev(state.params, x, k))
    for i in range(15):
        state, _ = step(state, x, jax.random.PRNGKey(100 + i))
    after = float(ev(state.params, x, k))
    assert after < before, (before, after)


def test_eval_v_prediction_runs():
    unet, schedule, params, x = _tiny()
    ev = jax.jit(make_eval_step(unet, schedule, prediction="v", num_t=4))
    val = float(ev(params, x, jax.random.PRNGKey(0)))
    assert np.isfinite(val)
