from ldm_image_generator_tpu.train.steps import (  # noqa: F401
    LDMTrainState,
    VAETrainState,
    make_ldm_train_step,
    make_optimizer,
    make_vae_train_step,
)
