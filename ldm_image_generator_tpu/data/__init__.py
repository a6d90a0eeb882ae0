from ldm_image_generator_tpu.data.dataset import (  # noqa: F401
    ImageDataset,
    LatentImageDataset,
)
from ldm_image_generator_tpu.data.loader import BatchLoader  # noqa: F401
