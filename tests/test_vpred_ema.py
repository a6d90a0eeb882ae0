"""v-prediction, zero-terminal-SNR schedule, and EMA tests.

These features are additive to the reference surface (which is eps-only
with no EMA): v-parameterization per Salimans & Ho 2022 (arXiv:2202.00512),
zero-SNR rescale per Lin et al. 2023 (arXiv:2305.08891).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig, UNetConfig
from ldm_image_generator_tpu.diffusion import (
    ddim_sample,
    ddpm_loss,
    make_schedule,
    pred_to_eps_x0,
)
from ldm_image_generator_tpu.diffusion.dpm_solver import dpm_solver_sample
from ldm_image_generator_tpu.models import UNet
from ldm_image_generator_tpu.train import (
    LDMTrainState,
    init_ema,
    make_ldm_train_step,
    make_optimizer,
)

SHAPE = (2, 8, 8, 4)


def _eps_model(x, t_vec, key):
    """Deterministic stand-in denoiser: a fixed nonlinear function of x
    and t, so eps- and v-wrapped variants describe the same model."""
    t = t_vec.astype(jnp.float32)[0]
    return jnp.tanh(x) * (0.5 + 0.001 * t) + 0.1 * jnp.roll(x, 1, axis=-1)


def _as_v_model(schedule):
    """Wrap _eps_model into the exactly equivalent v-parameterized model:
    v = sqrt(ab)*eps - sqrt(1-ab)*x0 with x0 recovered from (x, eps)."""

    def v_model(x, t_vec, key):
        eps = _eps_model(x, t_vec, key)
        ab = schedule.alpha_bar[t_vec[0]]
        sa, sb = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        x0 = (x - sb * eps) / sa
        return sa * eps - sb * x0

    return v_model


def test_pred_to_eps_x0_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, SHAPE)
    eps = jax.random.normal(k2, SHAPE)
    ab = jnp.asarray(0.37)
    sa, sb = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
    x_t = sa * x0 + sb * eps
    v = sa * eps - sb * x0

    e1, x1 = pred_to_eps_x0(eps, x_t, ab, "eps")
    e2, x2 = pred_to_eps_x0(v, x_t, ab, "v")
    np.testing.assert_allclose(np.asarray(e1), np.asarray(eps), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(eps), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x0), atol=1e-5)


def test_ddim_v_matches_eps_for_equivalent_models():
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(7)
    out_eps = ddim_sample(_eps_model, schedule, key, SHAPE, num_steps=8)
    out_v = ddim_sample(_as_v_model(schedule), schedule, key, SHAPE,
                        num_steps=8, prediction="v")
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_eps),
                               atol=1e-4)


def test_dpm_solver_v_matches_eps_for_equivalent_models():
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(7)
    out_eps = dpm_solver_sample(_eps_model, schedule, key, SHAPE, num_steps=6)
    out_v = dpm_solver_sample(_as_v_model(schedule), schedule, key, SHAPE,
                              num_steps=6, prediction="v")
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_eps),
                               atol=1e-4)


def test_v_loss_zero_for_oracle_model():
    """A model that outputs the exact v target (computable from x_t given
    the known clean batch) must get ~0 loss."""
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, SHAPE)

    def oracle(x_t, t, k):
        ab = schedule.alpha_bar[t].reshape((-1,) + (1,) * (x_t.ndim - 1))
        sa, sb = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
        eps = (x_t - sa * x0) / sb
        return sa * eps - sb * x0

    loss = ddpm_loss(oracle, schedule, x0, jax.random.PRNGKey(11),
                     prediction="v")
    assert float(loss) < 1e-5


def test_zero_snr_schedule():
    base = make_schedule(DDPMConfig())
    cfg = DDPMConfig(prediction="v", zero_terminal_snr=True)
    s = make_schedule(cfg)
    ab = np.asarray(s.alpha_bar)
    assert ab[-1] == 0.0  # terminal step carries zero signal
    # first step unchanged (Alg. 1 keeps sqrt(ab)[0] fixed)
    np.testing.assert_allclose(ab[0], float(base.alpha_bar[0]), rtol=1e-5)
    assert np.all(np.diff(ab) < 0)  # still strictly decreasing
    # cumprod consistency: alpha_bar == cumprod(alpha)
    np.testing.assert_allclose(np.cumprod(np.asarray(s.alpha)), ab,
                               rtol=1e-4, atol=1e-9)
    # eps parameterization is undefined at SNR 0 — must be rejected
    with pytest.raises(ValueError):
        make_schedule(DDPMConfig(zero_terminal_snr=True))


def test_ddim_finite_on_zero_snr_schedule():
    cfg = DDPMConfig(num_timesteps=100, prediction="v",
                     zero_terminal_snr=True)
    schedule = make_schedule(cfg)

    def v_model(x, t_vec, key):
        return 0.3 * jnp.tanh(x)

    out = ddim_sample(v_model, schedule, jax.random.PRNGKey(0), SHAPE,
                      num_steps=8, prediction="v")
    assert np.isfinite(np.asarray(out)).all()


def test_ema_update_and_checkpoint_roundtrip(tmp_path):
    cfg = UNetConfig(input_channels=4, stages=(1, 1), channels=(16, 32))
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    params = unet.init({"params": key, "moe": key, "sd": key},
                       x, jnp.zeros((2,), jnp.int32))
    tx = make_optimizer("adamw", 1e-3)
    # init_ema (a copy, not an alias) + donation: aliased params/ema
    # buffers would be donated twice and rejected by the runtime
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32),
                          ema_params=init_ema(params))
    decay = 0.5  # large (1-d) so drift is visible in a few steps
    step = jax.jit(make_ldm_train_step(unet, schedule, tx, ema_decay=decay),
                   donate_argnums=(0,))

    # snapshot to host each iteration: donation invalidates old buffers
    ema0 = jax.tree.map(np.asarray, state.ema_params)
    param_snaps = []
    for i in range(3):
        state, _ = step(state, x, jax.random.PRNGKey(i))
        param_snaps.append(jax.tree.map(np.asarray, state.params))

    # replay the EMA recurrence on host: warmup d = min(decay, (1+s)/(10+s))
    ema = ema0
    for s in range(3):
        d = min(decay, (1.0 + s) / (10.0 + s))
        ema = jax.tree.map(
            lambda e, p: e * d + p * (1.0 - d), ema, param_snaps[s],
        )
    got = jax.tree.map(np.asarray, state.ema_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        got, ema,
    )
    # EMA must lag the raw params (it averages in the init)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(np.max(np.abs(e - np.asarray(p)))),
        got, state.params,
    ))
    assert max(diffs) > 1e-6

    # orbax checkpoint roundtrip preserves the ema_params field
    from ldm_image_generator_tpu.utils.checkpoint import TrainCheckpointer

    ckpt = TrainCheckpointer(str(tmp_path / "ckpt"))
    ckpt.save(int(state.step), state, wait=True)
    ckpt.close()
    ckpt2 = TrainCheckpointer(str(tmp_path / "ckpt"))
    restored = ckpt2.restore(state)
    ckpt2.close()
    assert restored is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        restored.ema_params, state.ema_params,
    )


def test_ema_disabled_keeps_none():
    cfg = UNetConfig(input_channels=4, stages=(1, 1), channels=(16, 32))
    unet = UNet(cfg)
    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    params = unet.init({"params": key, "moe": key, "sd": key},
                       x, jnp.zeros((2,), jnp.int32))
    tx = make_optimizer("adamw", 1e-3)
    state = LDMTrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_ldm_train_step(unet, schedule, tx))
    state, _ = step(state, x, jax.random.PRNGKey(0))
    assert state.ema_params is None
