from ldm_image_generator_tpu.models.layers import (  # noqa: F401
    CrossAttention,
    Encodings,
    MultiHeadAttention,
    RandomMoE,
    ReGLU,
    SwinBlock,
    SwinStack,
    WindowAttention,
)
from ldm_image_generator_tpu.models.unet import UNet  # noqa: F401
from ldm_image_generator_tpu.models.vae import (  # noqa: F401
    VAE,
    Decoder,
    Discriminator,
    Encoder,
    VectorQuantizer,
)
