"""Diffusion engine numerics: schedule golden values, q_sample, and the
DDIM scan vs a straight numpy transcription of the reference equations
(ddpm.py:19-37, 64-91)."""
import numpy as np
import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig
from ldm_image_generator_tpu.diffusion import (
    ddim_sample,
    ddim_step_pairs,
    ddpm_loss,
    make_schedule,
    q_sample,
)


def _golden_schedule(cfg: DDPMConfig):
    beta = np.linspace(cfg.beta_min, cfg.beta_max, cfg.num_timesteps)
    alpha = 1 - beta
    alpha_bar = np.array([np.prod(alpha[: t + 1]) for t in range(len(alpha))])
    return beta, alpha, alpha_bar


def test_schedule_golden():
    cfg = DDPMConfig()
    s = make_schedule(cfg)
    beta, alpha, alpha_bar = _golden_schedule(cfg)
    np.testing.assert_allclose(np.asarray(s.beta), beta, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha), alpha, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alpha_bar), alpha_bar, rtol=1e-5)
    # beta_tilde recurrence (ddpm.py:34-37)
    assert float(s.beta_tilde[0]) == 1.0
    t = 500
    expect = (1 - alpha_bar[t - 1]) / (1 - alpha_bar[t]) * beta[t]
    np.testing.assert_allclose(float(s.beta_tilde[t]), expect, rtol=1e-5)


def test_ddim_step_pairs_matches_reference_linspace():
    # torch.linspace(0, 999, 20).int() truncates toward zero
    ts, ts_next = ddim_step_pairs(1000, 20)
    ref_steps = np.linspace(0, 999, 20).astype(int)
    ref_next = np.concatenate([[0], ref_steps[:-1]])
    np.testing.assert_array_equal(ts, ref_steps[::-1])
    np.testing.assert_array_equal(ts_next, ref_next[::-1])


def test_q_sample():
    s = make_schedule()
    x0 = jnp.ones((2, 4, 4, 1))
    eps = jnp.full((2, 4, 4, 1), 0.5)
    t = jnp.array([10, 500])
    out = np.asarray(q_sample(s, x0, t, eps))
    ab = np.asarray(s.alpha_bar)
    for i, tt in enumerate([10, 500]):
        expect = np.sqrt(ab[tt]) * 1.0 + np.sqrt(1 - ab[tt]) * 0.5
        np.testing.assert_allclose(out[i], expect, rtol=1e-5)


def test_ddim_sampler_matches_numpy_reference_loop():
    """eta=0 so the per-step noise term vanishes; denoiser is a fixed
    linear map, so our lax.scan must reproduce a literal numpy loop of the
    reference update (ddpm.py:76-91) from the same initial noise."""
    s = make_schedule()
    shape = (2, 4, 4, 3)
    scale = 0.9

    def denoise(x, t_vec, key):
        return x * scale  # deterministic pseudo-model

    key = jax.random.PRNGKey(42)
    out = np.asarray(
        ddim_sample(denoise, s, key, shape, num_steps=10, eta=0.0)
    )

    # replicate: ddim_sample draws init noise from split(key)[1]... emulate
    _, init_key = jax.random.split(key)
    x = np.asarray(jax.random.normal(init_key, shape, dtype=jnp.float32))
    alpha = np.cumprod(1 - np.asarray(s.beta, dtype=np.float64))
    steps = list(np.linspace(0, 999, 10).astype(int))
    steps_next = [0] + steps[:-1]
    for t, t_next in zip(reversed(steps), reversed(steps_next)):
        e_theta = x * scale
        x0 = (x - np.sqrt(1 - alpha[t]) * e_theta) / np.sqrt(alpha[t])
        term1 = np.sqrt(alpha[t_next]) * x0
        term2 = np.sqrt(1 - alpha[t_next]) * e_theta
        x = x0 if t == 0 else term1 + term2
    np.testing.assert_allclose(out, x, rtol=2e-4, atol=2e-5)


def test_ddim_sampler_deterministic():
    s = make_schedule()
    shape = (1, 4, 4, 2)

    def denoise(x, t_vec, key):
        return x * 0.5

    a = ddim_sample(denoise, s, jax.random.PRNGKey(7), shape, num_steps=5)
    b = ddim_sample(denoise, s, jax.random.PRNGKey(7), shape, num_steps=5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = ddim_sample(denoise, s, jax.random.PRNGKey(8), shape, num_steps=5)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_ddim_sampler_eta_nonzero_finite():
    s = make_schedule()

    def denoise(x, t_vec, key):
        return x * 0.1

    out = ddim_sample(denoise, s, jax.random.PRNGKey(0), (1, 4, 4, 2),
                      num_steps=8, eta=1.0)
    assert bool(jnp.isfinite(out).all())


def test_ddpm_loss_decreases_toward_true_eps():
    """Loss is lower for a denoiser closer to returning the true noise —
    sanity of the q-sample/loss wiring."""
    s = make_schedule()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 2))

    loss_zero = float(ddpm_loss(lambda xt, t, k: jnp.zeros_like(xt), s, x,
                                jax.random.PRNGKey(2)))
    # an oracle denoiser that returns the actual eps is impossible from
    # the outside; instead check the zero-predictor loss is ~E|eps| = 0.798
    assert 0.6 < loss_zero < 1.0

    custom = float(
        ddpm_loss(lambda xt, t, k: jnp.zeros_like(xt), s, x,
                  jax.random.PRNGKey(2), loss="l2")
    )
    assert 0.7 < custom < 1.4  # E[eps^2] = 1


def test_min_snr_loss_weighting():
    """Min-SNR (arXiv:2303.09556): gamma=inf reproduces the unweighted
    loss for eps-prediction only in expectation — so check the exact
    contract instead: the weighted loss equals manually applying
    min(SNR,gamma)/SNR to the per-element error of the SAME draw."""
    import jax

    from ldm_image_generator_tpu.config import DDPMConfig
    from ldm_image_generator_tpu.diffusion import ddpm_loss, make_schedule
    from ldm_image_generator_tpu.diffusion.ddpm import q_sample

    schedule = make_schedule(DDPMConfig(num_timesteps=100))
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 2))
    key = jax.random.PRNGKey(1)
    gamma = 5.0

    def denoise(x_t, t, k):  # deterministic fake model
        return 0.1 * x_t

    lw = ddpm_loss(denoise, schedule, x, key, loss="l2",
                   min_snr_gamma=gamma)

    # reproduce the internal draw (same key-split structure)
    key_t, key_eps, key_model = jax.random.split(key, 3)
    t = jax.random.randint(key_t, (4,), 1, schedule.num_timesteps)
    eps = jax.random.normal(key_eps, x.shape, dtype=x.dtype)
    x_t = q_sample(schedule, x, t, eps)
    err = (0.1 * x_t - eps).astype(jnp.float32)
    ab = schedule.alpha_bar[t]
    snr = ab / (1 - ab)
    w = (jnp.minimum(snr, gamma) / snr)[:, None, None, None]
    expect = jnp.mean(w * err * err)
    np.testing.assert_allclose(float(lw), float(expect), rtol=1e-5)

    # gamma large enough -> weight 1 everywhere -> unweighted loss
    l_inf = ddpm_loss(denoise, schedule, x, key, loss="l2",
                      min_snr_gamma=1e9)
    l_plain = ddpm_loss(denoise, schedule, x, key, loss="l2")
    np.testing.assert_allclose(float(l_inf), float(l_plain), rtol=1e-5)
