"""DPM-Solver++(2M) sampler (Lu et al. 2022, arXiv:2211.01095).

A second-order multistep ODE solver for diffusion sampling: reaches
DDIM-at-20-steps quality in ~10 model evaluations, halving sampling
cost. Additive to the reference's surface (which only has DDIM,
ddpm.py:52-93); shares the schedule and the denoise_fn contract, and is
one jitted lax.scan like the DDIM path.

Formulation (x0-parameterization):
    alpha_t = sqrt(alpha_bar_t), sigma_t = sqrt(1 - alpha_bar_t),
    lambda_t = log(alpha_t / sigma_t)
    x0_t = (x - sigma_t * eps_theta(x, t)) / alpha_t
    h_i = lambda_{t_i} - lambda_{t_{i-1}}
    first step (1st order):   D = x0
    later steps (2M):         r = h_{i-1} / h_i
                              D = (1 + 1/(2r)) x0_i - 1/(2r) x0_{i-1}
    x_{t_i} = (sigma_{t_i}/sigma_{t_{i-1}}) x - alpha_{t_i} (e^{-h_i}-1) D
The final step returns the x0 prediction (like DDIM's t==0 shortcut).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.diffusion.ddpm import (
    DiffusionSchedule,
    pred_to_eps_x0,
)


def dpm_solver_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray],
    schedule: DiffusionSchedule,
    key: jax.Array,
    x_shape: Tuple[int, ...],
    num_steps: int = 10,
    steps: Optional[Sequence[int]] = None,
    dtype=jnp.float32,
    prediction: str = "eps",
    init_noise: Optional[jnp.ndarray] = None,
    deep_cache=None,
) -> jnp.ndarray:
    """DPM-Solver++(2M). denoise_fn(x, t_vec [1], key) -> model output in
    the `prediction` parameterization ('eps' or 'v'); the solver itself is
    x0-parameterized, so both convert through pred_to_eps_x0.
    init_noise overrides the internally drawn x_T (like ddim_sample).
    deep_cache: (fresh_fn, cached_fn, deep0, interval) — DeepCache-style
    deep-feature reuse, same contract as ddim_sample's."""
    if steps is None:
        ts = np.linspace(0, schedule.num_timesteps - 1, num_steps).astype(
            np.int32
        )
    else:
        ts = np.asarray(sorted(set(int(s) for s in steps)), dtype=np.int32)
    ts = ts[::-1].copy()  # high noise -> low noise

    ab = schedule.alpha_bar.astype(jnp.float32)
    alpha = jnp.sqrt(ab)
    sigma = jnp.sqrt(1.0 - ab)
    lam = jnp.log(alpha) - jnp.log(sigma)

    key, init_key = jax.random.split(key)
    if init_noise is None:
        x = jax.random.normal(init_key, x_shape, dtype=jnp.float32)
    else:
        x = init_noise.astype(jnp.float32)

    def x0_of(x, t, k, deep, i):
        t_vec = jnp.full((1,), t, dtype=jnp.int32)
        if deep_cache is None:
            pred = denoise_fn(x.astype(dtype), t_vec, k)
        else:
            fresh_fn, cached_fn, _, interval = deep_cache
            pred, deep = jax.lax.cond(
                i % interval == 0,
                lambda x_, k_, d_: fresh_fn(x_, t_vec, k_),
                lambda x_, k_, d_: (cached_fn(x_, t_vec, k_, d_), d_),
                x.astype(dtype), k, deep,
            )
        _, x0 = pred_to_eps_x0(pred, x, ab[t], prediction)
        return x0, deep

    deep = (deep_cache[2] if deep_cache is not None
            else jnp.zeros((), dtype))
    t0 = jnp.asarray(ts[0])
    key, k0 = jax.random.split(key)
    x0_prev, deep = x0_of(x, t0, k0, deep, jnp.zeros((), jnp.int32))

    # first transition (1st order) to ts[1]
    def first_step(x, t_prev, t_cur, x0):
        h = lam[t_cur] - lam[t_prev]
        return (sigma[t_cur] / sigma[t_prev]) * x - alpha[t_cur] * (
            jnp.exp(-h) - 1.0
        ) * x0

    if len(ts) == 1:
        return x0_prev.astype(dtype)

    x = first_step(x, ts[0], ts[1], x0_prev)
    h_prev = lam[jnp.asarray(ts[1])] - lam[jnp.asarray(ts[0])]

    if len(ts) == 2:
        key, k1 = jax.random.split(key)
        x0, _ = x0_of(x, jnp.asarray(ts[1]), k1, deep,
                      jnp.ones((), jnp.int32))
        return x0.astype(dtype)

    triples = jnp.stack(
        [ts[1:-1], ts[2:], np.arange(len(ts) - 2)], axis=-1
    )  # (t_cur, t_next, i)

    def body(carry, trip):
        x, x0_prev, h_prev, k, deep = carry
        t_cur, t_next, i = trip
        k, k_model = jax.random.split(k)
        x0_cur, deep = x0_of(x, t_cur, k_model, deep, i + 1)
        h = lam[t_next] - lam[t_cur]
        r = h_prev / h
        d = (1.0 + 1.0 / (2.0 * r)) * x0_cur - (1.0 / (2.0 * r)) * x0_prev
        x_new = (sigma[t_next] / sigma[t_cur]) * x - alpha[t_next] * (
            jnp.exp(-h) - 1.0
        ) * d
        return (x_new, x0_cur, h, k, deep), None

    (x, x0_prev, _, key, deep), _ = jax.lax.scan(
        body, (x, x0_prev, h_prev, key, deep), triples
    )
    # final: return the x0 prediction at the lowest-noise state
    key, k_last = jax.random.split(key)
    x0, _ = x0_of(x, jnp.asarray(ts[-1]), k_last, deep,
                  jnp.asarray(len(ts) - 1, jnp.int32))
    return x0.astype(dtype)
