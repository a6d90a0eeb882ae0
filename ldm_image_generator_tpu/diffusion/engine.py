"""Object-style DDPM engine wrapper (API parity with the reference DDPM
class, ddpm.py:11-93).

The functional core lives in diffusion/ddpm.py (schedule arrays, loss,
lax.scan DDIM); this wrapper packages it with a model + params the way
the reference's ``DDPM(model).calculate_loss(x)`` / ``.sample(shape)``
surface does, for users migrating call sites directly. The CFG bounds
``lambda_max/lambda_min`` are stored for parity (the reference never uses
them, ddpm.py:24-25).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ldm_image_generator_tpu.config import DDPMConfig
from ldm_image_generator_tpu.diffusion.ddpm import (
    ddim_sample,
    ddpm_loss,
    make_schedule,
)


class DDPM:
    """model: a flax module with __call__(x, time, condition, deterministic)
    (our UNet); params: its variables."""

    def __init__(
        self,
        model,
        params: Any = None,
        beta_min: float = 1e-4,
        beta_max: float = 0.02,
        num_timesteps: int = 1000,
        loss_function: str = "l1",
        lambda_max: float = 20.0,
        lambda_min: float = -20.0,
        prediction: str = "eps",
        zero_terminal_snr: bool = False,
    ):
        self.model = model
        self.params = params
        cfg = DDPMConfig(beta_min=beta_min, beta_max=beta_max,
                         num_timesteps=num_timesteps, loss=loss_function,
                         lambda_max=lambda_max, lambda_min=lambda_min,
                         prediction=prediction,
                         zero_terminal_snr=zero_terminal_snr)
        self.cfg = cfg
        self.schedule = make_schedule(cfg)
        self.num_timesteps = num_timesteps
        # sample() compiles one program per static signature (shape,
        # schedule, eta, guidance) and reuses it across calls
        self._sample_cache = {}

    def _denoise_fn(self, params, condition, deterministic: bool):
        def fn(x, t, key):
            k_moe, k_sd = jax.random.split(key)
            return self.model.apply(
                params, x, t, condition, deterministic=deterministic,
                rngs={"moe": k_moe, "sd": k_sd},
            ).astype(jnp.float32)

        return fn

    def calculate_loss(self, x, key, condition=None, params=None,
                       train: bool = True):
        """Reference DDPM.calculate_loss (ddpm.py:39-48), explicit PRNG."""
        params = params if params is not None else self.params
        return ddpm_loss(
            self._denoise_fn(params, condition, deterministic=not train),
            self.schedule, x, key, loss=self.cfg.loss,
            prediction=self.cfg.prediction,
        )

    def sample(
        self,
        x_shape: Tuple[int, ...] = (1, 64, 64, 3),
        condition=None,
        seed: Optional[int] = None,
        num_steps: int = 20,
        schedule: "str | Sequence[int]" = "linear",
        eta: float = 0.0,
        guidance_scale: float = 1.0,
        params=None,
        key: Optional[jax.Array] = None,
        use_autocast: Optional[bool] = None,
    ):
        """Reference DDPM.sample (ddpm.py:52-93): NHWC x_shape, linear or
        explicit step schedule, eta-DDIM; seed maps to a PRNG key.

        use_autocast is accepted for drop-in call-site compatibility
        (ddpm.py:52) and ignored: compute precision here is a property
        of the model (its `dtype` attribute), not of the sampling call.

        guidance_scale enables classifier-free guidance when a condition
        is given: eps = eps_uncond + s * (eps_cond - eps_uncond). The
        reference stores CFG bounds but never implements guidance
        (ddpm.py:24-25, sample hardcodes condition=None at ddpm.py:78);
        here it works.

        The whole reverse chain runs as ONE jitted program (compiled once
        per static signature and cached on the instance) — reference call
        sites migrated directly get the fast scan path, not an eager
        op-by-op dispatch.
        """
        params = params if params is not None else self.params
        if key is None:
            key = jax.random.PRNGKey(0 if seed is None else seed)
        steps = None
        if isinstance(schedule, str):
            if schedule != "linear":
                raise NotImplementedError(f"schedule {schedule!r}")
        else:
            steps = tuple(int(s) for s in schedule)

        use_cfg = condition is not None and guidance_scale != 1.0
        sig = (tuple(x_shape), num_steps, steps, float(eta),
               float(guidance_scale) if use_cfg else None,
               condition is not None)
        run = self._sample_cache.get(sig)
        if run is None:
            def run(params, key, condition):
                if use_cfg:
                    cond_fn = self._denoise_fn(params, condition,
                                               deterministic=True)
                    uncond_fn = self._denoise_fn(params, None,
                                                 deterministic=True)

                    def denoise(x, t, k):
                        # same key for both branches: identical MoE
                        # routing, so the guidance delta isolates the
                        # conditioning signal
                        eps_c = cond_fn(x, t, k)
                        eps_u = uncond_fn(x, t, k)
                        return eps_u + guidance_scale * (eps_c - eps_u)

                else:
                    denoise = self._denoise_fn(params, condition,
                                               deterministic=True)
                return ddim_sample(
                    denoise, self.schedule, key, tuple(x_shape),
                    num_steps=num_steps, eta=eta, steps=steps,
                    prediction=self.cfg.prediction,
                )

            run = jax.jit(run)
            self._sample_cache[sig] = run
        return run(params, key, condition)
