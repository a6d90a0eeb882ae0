"""DPM-Solver++(2M): convergence order and determinism."""
import numpy as np
import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig
from ldm_image_generator_tpu.diffusion import ddim_sample, make_schedule
from ldm_image_generator_tpu.diffusion.dpm_solver import dpm_solver_sample


def _linear_denoiser(c=0.7):
    def denoise(x, t_vec, key):
        return x * c

    return denoise


def test_dpm_solver_converges_faster_than_ddim():
    """Against a near-exact (200-step DDIM) solution of the same probability
    -flow ODE, 8-step DPM++(2M) must beat 8-step DDIM."""
    s = make_schedule(DDPMConfig())
    shape = (2, 8, 8, 3)
    key = jax.random.PRNGKey(0)
    den = _linear_denoiser()

    truth = np.asarray(ddim_sample(den, s, key, shape, num_steps=200))
    ddim8 = np.asarray(ddim_sample(den, s, key, shape, num_steps=8))
    dpm8 = np.asarray(dpm_solver_sample(den, s, key, shape, num_steps=8))

    err_ddim = np.linalg.norm(ddim8 - truth)
    err_dpm = np.linalg.norm(dpm8 - truth)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    # second order: materially better, not epsilon-better
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)


def test_dpm_solver_deterministic_and_shapes():
    s = make_schedule(DDPMConfig(num_timesteps=100))
    den = _linear_denoiser(0.3)
    a = dpm_solver_sample(den, s, jax.random.PRNGKey(3), (1, 4, 4, 2),
                          num_steps=6)
    b = dpm_solver_sample(den, s, jax.random.PRNGKey(3), (1, 4, 4, 2),
                          num_steps=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (1, 4, 4, 2)
    assert bool(jnp.isfinite(a).all())


def test_dpm_solver_tiny_step_counts():
    s = make_schedule(DDPMConfig(num_timesteps=100))
    den = _linear_denoiser(0.2)
    for n in (1, 2, 3):
        out = dpm_solver_sample(den, s, jax.random.PRNGKey(0), (1, 4, 4, 1),
                                num_steps=n)
        assert bool(jnp.isfinite(out).all()), n
