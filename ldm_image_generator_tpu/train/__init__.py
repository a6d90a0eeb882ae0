from ldm_image_generator_tpu.train.steps import (  # noqa: F401
    LDMTrainState,
    VAETrainState,
    init_ema,
    make_ldm_train_step,
    make_lr_schedule,
    make_optimizer,
    make_vae_train_step,
)
from ldm_image_generator_tpu.train.eval import (  # noqa: F401
    Validator,
    make_eval_step,
)
