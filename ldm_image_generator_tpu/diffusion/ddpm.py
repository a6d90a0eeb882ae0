"""DDPM training loss + DDIM sampler (reference ddpm.py:11-93), TPU-native.

Differences from the reference that are *design*, not behavior:
  * All schedule tensors are device-resident fp32 arrays captured by the
    jitted step — the reference keeps them on CPU as plain attributes and
    pays two H2D copies per training step (ddpm.py:40-45) plus a recompute
    at sample time (ddpm.py:73).
  * The DDIM reverse process is a single ``lax.scan`` over the step
    schedule: the whole 20-step chain (and the VAE decode appended by the
    pipeline) stays in HBM with zero host round-trips. The reference syncs
    every step to format a tqdm description (ddpm.py:87).
  * Randomness is an explicit ``jax.random`` key threaded through the scan
    (the reference mixes Python random / torch global state, ddpm.py:56-61).

Behavioral parity:
  * Linear beta schedule beta_min..beta_max over T (ddpm.py:19).
  * alpha_bar[t] = prod_{i<=t} (1 - beta_i) (ddpm.py:28-31); the sampler's
    ``cumprod(1-beta)`` (ddpm.py:73) is the same array.
  * Training: t ~ Uniform{1..T-1}, x_t = sqrt(ab)x + sqrt(1-ab)e, default
    L1 loss on predicted epsilon (ddpm.py:39-48).
  * DDIM update with eta-parameterized sigma, linspace (or explicit list)
    step schedule, x0 shortcut at t == 0 (ddpm.py:64-91).
  * beta_tilde is computed for parity (ddpm.py:34-37) though, like the
    reference, nothing consumes it.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldm_image_generator_tpu.config import DDPMConfig


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    beta: jnp.ndarray        # [T]
    alpha: jnp.ndarray       # [T] = 1 - beta
    alpha_bar: jnp.ndarray   # [T] cumulative product of alpha
    beta_tilde: jnp.ndarray  # [T] posterior variance (unused, parity)
    num_timesteps: int


def make_schedule(cfg: DDPMConfig = DDPMConfig()) -> DiffusionSchedule:
    t = cfg.num_timesteps
    beta = np.linspace(cfg.beta_min, cfg.beta_max, t, dtype=np.float64)
    alpha = 1.0 - beta
    alpha_bar = np.cumprod(alpha)
    if cfg.zero_terminal_snr:
        # Rescale sqrt(alpha_bar) linearly so the terminal step has
        # exactly zero signal while the first step is unchanged
        # (Lin et al. 2023, arXiv:2305.08891, Alg. 1). Additive to the
        # reference, whose schedule leaves SNR[T-1] > 0 (ddpm.py:28-31).
        sab = np.sqrt(alpha_bar)
        s0, sT = sab[0], sab[-1]
        sab = (sab - sT) * (s0 / (s0 - sT))
        alpha_bar = sab**2
        if cfg.prediction != "v":
            raise ValueError(
                "zero_terminal_snr needs prediction='v': at alpha_bar==0 "
                "the eps parameterization cannot recover x0"
            )
        # back out per-step alpha/beta from the rescaled cumulative product
        alpha = np.empty_like(alpha_bar)
        alpha[0] = alpha_bar[0]
        alpha[1:] = alpha_bar[1:] / alpha_bar[:-1]
        beta = 1.0 - alpha
    beta_tilde = np.ones(t, dtype=np.float64)
    beta_tilde[1:] = (1.0 - alpha_bar[:-1]) / (1.0 - alpha_bar[1:]) * beta[1:]
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        beta=f32(beta), alpha=f32(alpha), alpha_bar=f32(alpha_bar),
        beta_tilde=f32(beta_tilde), num_timesteps=t,
    )


def _bcast(a: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Append singleton dims so a [B] vector broadcasts over [B, ...]."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def q_sample(schedule: DiffusionSchedule, x0: jnp.ndarray, t: jnp.ndarray,
             eps: jnp.ndarray) -> jnp.ndarray:
    """Forward process: sqrt(ab_t) x0 + sqrt(1-ab_t) eps (ddpm.py:46)."""
    ab = _bcast(schedule.alpha_bar[t], x0.ndim).astype(x0.dtype)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps


def pred_to_eps_x0(
    pred: jnp.ndarray, x_t: jnp.ndarray, alpha_bar_t: jnp.ndarray,
    prediction: str = "eps",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert a model output to (eps, x0) given the noisy input.

    'eps': reference parameterization (ddpm.py:46); x0 via inversion of
    q_sample (undefined at alpha_bar == 0).
    'v':   v = sqrt(ab)*eps - sqrt(1-ab)*x0 (arXiv:2202.00512 eq. 12);
    both conversions are well-defined over the whole schedule, including
    the zero-SNR terminal step.
    """
    ab = _bcast(jnp.asarray(alpha_bar_t), x_t.ndim).astype(jnp.float32)
    sa, sb = jnp.sqrt(ab), jnp.sqrt(1.0 - ab)
    xf = x_t.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if prediction == "eps":
        return pred, (xf - sb * pred) / sa
    if prediction == "v":
        return sb * xf + sa * pred, sa * xf - sb * pred
    raise ValueError(f"unknown prediction {prediction!r}")


def ddpm_loss(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray],
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    key: jax.Array,
    loss: str = "l1",
    prediction: str = "eps",
    min_snr_gamma: Optional[float] = None,
) -> jnp.ndarray:
    """Noise-prediction loss (ddpm.py:39-48).

    denoise_fn(x_t, t, key) -> model output in the given parameterization
    ('eps' target = the drawn noise, reference behavior; 'v' target =
    sqrt(ab)*eps - sqrt(1-ab)*x0). The key covers the model's own
    stochasticity (MoE routing, stochastic depth).

    min_snr_gamma: Min-SNR loss weighting (arXiv:2303.09556, additive
    to the reference): per-sample weight min(SNR_t, gamma)/SNR_t for
    eps-prediction (min(SNR_t, gamma)/(SNR_t + 1) for v-prediction) —
    down-weights the low-noise timesteps whose gradients otherwise
    dominate and conflict, measurably faster convergence at gamma ~= 5.
    None = the reference's uniform weighting.
    """
    key_t, key_eps, key_model = jax.random.split(key, 3)
    b = x.shape[0]
    t = jax.random.randint(key_t, (b,), 1, schedule.num_timesteps)
    eps = jax.random.normal(key_eps, x.shape, dtype=x.dtype)
    x_t = q_sample(schedule, x, t, eps)
    out = denoise_fn(x_t, t, key_model).astype(jnp.float32)
    if prediction == "eps":
        target = eps.astype(jnp.float32)
    elif prediction == "v":
        ab = _bcast(schedule.alpha_bar[t], x.ndim)
        target = (
            jnp.sqrt(ab) * eps.astype(jnp.float32)
            - jnp.sqrt(1.0 - ab) * x.astype(jnp.float32)
        )
    else:
        raise ValueError(f"unknown prediction {prediction!r}")
    err = out - target
    if min_snr_gamma is not None:
        ab_t = schedule.alpha_bar[t].astype(jnp.float32)
        snr = ab_t / jnp.maximum(1.0 - ab_t, 1e-12)
        denom = snr + 1.0 if prediction == "v" else jnp.maximum(snr, 1e-12)
        w = _bcast(jnp.minimum(snr, float(min_snr_gamma)) / denom, x.ndim)
    else:
        w = None
    if loss == "l1":
        e = jnp.abs(err)
    elif loss == "l2":
        e = err * err
    else:
        raise ValueError(f"unknown loss {loss!r}")
    return jnp.mean(e if w is None else w * e)


def ddim_step_pairs(
    num_timesteps: int,
    num_steps: int = 20,
    steps: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(t, t_next) pairs in reverse order, ready for lax.scan.

    Matches ddpm.py:64-72: linspace(0, T-1, num_steps) truncated to int
    (or a user-provided list), steps_next = [0] + steps[:-1], iterated in
    reverse. Computed on host — step schedules are static.
    """
    if steps is None:
        steps = np.linspace(0, num_timesteps - 1, num_steps).astype(np.int32)
    else:
        steps = np.asarray(list(steps), dtype=np.int32)
    steps_next = np.concatenate([[0], steps[:-1]]).astype(np.int32)
    return steps[::-1].copy(), steps_next[::-1].copy()


def ddim_sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray],
    schedule: DiffusionSchedule,
    key: jax.Array,
    x_shape: Tuple[int, ...],
    num_steps: int = 20,
    eta: float = 0.0,
    steps: Optional[Sequence[int]] = None,
    dtype=jnp.float32,
    init_noise: Optional[jnp.ndarray] = None,
    prediction: str = "eps",
    project_fn=None,
    deep_cache=None,
) -> jnp.ndarray:
    """DDIM reverse sampler as one lax.scan (ddpm.py:52-93, jitted whole).

    denoise_fn(x, t_vec, key) -> model output in the `prediction`
    parameterization ('eps' or 'v'), with t_vec: [B] int32 (raw timestep
    indices, as the reference feeds TimeEncoding2d).
    init_noise overrides the internally drawn x_T (fidelity tests /
    reproducing a specific trajectory). Returns x0-space samples.
    project_fn(x, t_next [] int32, final bool[], key) -> x, applied after
    every update inside the scan: a constraint projection at the new
    noise level t_next (`final` is True on the terminal t == 0 step,
    where x is already in x0 space). Used for latent inpainting — the
    known region is re-noised to t_next and blended in each step
    (RePaint-style single-pass projection).
    deep_cache: (fresh_fn, cached_fn, deep0, interval) — DeepCache-style
    deep-feature reuse (models/unet.py deep/with_deep): fresh_fn(x, t,
    k) -> (pred, deep) recomputes the UNet's deep core and returns its
    output; cached_fn(x, t, k, deep) -> pred reuses it. The scan
    refreshes the cache every `interval` steps (step 0 is always
    fresh) and reuses it otherwise — the denoise_fn argument is ignored
    when set.
    """
    ts, ts_next = ddim_step_pairs(schedule.num_timesteps, num_steps, steps)
    ts = jnp.asarray(ts)
    ts_next = jnp.asarray(ts_next)
    alpha_bar = schedule.alpha_bar

    key, init_key = jax.random.split(key)
    if init_noise is None:
        x = jax.random.normal(init_key, x_shape, dtype=dtype)
    else:
        x = init_noise.astype(dtype)
    b = x_shape[0]

    def model(x, t_vec, k_model, deep, i):
        if deep_cache is None:
            return denoise_fn(x, t_vec, k_model), deep
        fresh_fn, cached_fn, _, interval = deep_cache
        return jax.lax.cond(
            i % interval == 0,
            lambda x_, k_, d_: fresh_fn(x_, t_vec, k_),
            lambda x_, k_, d_: (cached_fn(x_, t_vec, k_, d_), d_),
            x, k_model, deep,
        )

    def body(carry, step):
        x, k, deep, i = carry
        t, t_next = step
        k, k_noise, k_model = jax.random.split(k, 3)
        # one shared timestep per DDIM step: pass t with batch dim 1 and
        # let the model's time conditioning broadcast over the image batch
        t_vec = jnp.full((1,), t, dtype=jnp.int32)
        pred, deep = model(x, t_vec, k_model, deep, i)
        eps_hat, x0 = pred_to_eps_x0(pred, x, alpha_bar[t], prediction)

        a_t = alpha_bar[t]
        a_n = alpha_bar[t_next]
        sigma = (
            eta
            * jnp.sqrt((1.0 - a_n) / (1.0 - a_t))
            * jnp.sqrt(jnp.maximum(1.0 - a_t / a_n, 0.0))
        )
        noise = jax.random.normal(k_noise, x_shape, dtype=jnp.float32)
        x_new = (
            jnp.sqrt(a_n) * x0
            + jnp.sqrt(jnp.maximum(1.0 - a_n - sigma**2, 0.0)) * eps_hat
            + sigma * noise
        )
        x = jnp.where(t == 0, x0, x_new).astype(dtype)  # ddpm.py:88-91
        if project_fn is not None:
            k, k_proj = jax.random.split(k)
            x = project_fn(x, t_next, t == 0, k_proj).astype(dtype)
        return (x, k, deep, i + 1), None

    deep0 = deep_cache[2] if deep_cache is not None else jnp.zeros((), dtype)
    (x, _, _, _), _ = jax.lax.scan(
        body, (x, key, deep0, jnp.zeros((), jnp.int32)), (ts, ts_next))
    return x
