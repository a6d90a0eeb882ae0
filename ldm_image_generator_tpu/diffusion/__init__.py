from ldm_image_generator_tpu.diffusion.ddpm import (  # noqa: F401
    DiffusionSchedule,
    ddim_sample,
    ddim_step_pairs,
    ddpm_loss,
    make_schedule,
    pred_to_eps_x0,
    q_sample,
)
from ldm_image_generator_tpu.diffusion.engine import DDPM  # noqa: F401
from ldm_image_generator_tpu.diffusion.dpm_solver import dpm_solver_sample  # noqa: F401
