"""Deterministic validation loss for diffusion training.

The reference has no evaluation loop at all (train_ldm.py only logs the
running train loss); this is additive. The usual single-random-t val
loss is too noisy to compare checkpoints, so the evaluator sweeps a
stratified timestep grid with one fixed noise draw per batch:

    L_val = mean_{t in linspace(1, T-1, num_t)} loss(model(x_t, t), target)

Same loss/parameterization semantics as ddpm_loss (eps or v target).
One jitted lax.scan over the grid — num_t model evaluations per batch,
all on-device. Deterministic given (params, batch, key): suitable for
checkpoint selection and EMA-vs-raw comparisons.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.diffusion import DiffusionSchedule, q_sample


def make_eval_step(
    unet,
    schedule: DiffusionSchedule,
    loss: str = "l1",
    prediction: str = "eps",
    num_t: int = 8,
) -> Callable:
    """Returns eval_step(params, x, key) -> scalar stratified val loss.

    Works for raw or EMA params (any tree with the UNet's structure).
    Wrap in jax.jit at the call site; pass params as an argument (never
    close over the full tree — see CLAUDE.md on remote-compile limits).
    """
    ts = jnp.linspace(1, schedule.num_timesteps - 1, num_t).astype(jnp.int32)

    def eval_step(params, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        b = x.shape[0]
        eps = jax.random.normal(key, x.shape, dtype=x.dtype)
        xf = x.astype(jnp.float32)
        epsf = eps.astype(jnp.float32)

        def body(carry, t):
            t_vec = jnp.full((b,), t, dtype=jnp.int32)
            x_t = q_sample(schedule, x, t_vec, eps)
            # deterministic=True still needs a routing key for the MoE;
            # fold in t so every grid point routes identically across
            # evaluations of the same (key, t)
            out = unet.apply(
                params, x_t, t_vec, deterministic=True,
                rngs={"moe": jax.random.fold_in(key, t)},
            ).astype(jnp.float32)
            if prediction == "eps":
                target = epsf
            elif prediction == "v":
                ab = schedule.alpha_bar[t]
                target = jnp.sqrt(ab) * epsf - jnp.sqrt(1.0 - ab) * xf
            else:
                raise ValueError(f"unknown prediction {prediction!r}")
            err = out - target
            if loss == "l1":
                val = jnp.mean(jnp.abs(err))
            elif loss == "l2":
                val = jnp.mean(err * err)
            else:
                raise ValueError(f"unknown loss {loss!r}")
            return carry + val, None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), ts)
        return total / num_t

    return eval_step


class Validator:
    """Periodic held-out validation for the train CLIs (--val-dir /
    --val-every). The reference logs only running train loss
    (train_ldm.py:88); this evaluates the stratified val loss above on
    fixed batches from a held-out dataset, for raw and (when present)
    EMA params, and returns a metrics dict for the JSONL log.

    Batches are materialized once, in dataset order (no shuffle), so the
    metric is deterministic across runs and resumes.
    """

    def __init__(self, dataset, unet, schedule: DiffusionSchedule, *,
                 prediction: str = "eps", loss: str = "l1",
                 batch: int = 1, max_batches: int = 4, num_t: int = 8):
        import numpy as np

        n = len(dataset)
        if n == 0:
            raise ValueError("validation dataset is empty")
        bs = min(batch, n)
        nb = max(1, min(max_batches, n // bs))
        self.batches = [
            jnp.asarray(
                np.stack([dataset[i * bs + j] for j in range(bs)])
            )
            for i in range(nb)
        ]
        self._eval = jax.jit(
            make_eval_step(unet, schedule, loss=loss,
                           prediction=prediction, num_t=num_t)
        )

    def _avg(self, params) -> float:
        key = jax.random.PRNGKey(1234)
        total = 0.0
        for i, b in enumerate(self.batches):
            total += float(self._eval(params, b, jax.random.fold_in(key, i)))
        return total / len(self.batches)

    def run(self, state) -> dict:
        out = {"val_loss": self._avg(state.params)}
        if getattr(state, "ema_params", None) is not None:
            out["val_loss_ema"] = self._avg(state.ema_params)
        return out
