from ldm_image_generator_tpu.ops.norm import channel_norm  # noqa: F401
from ldm_image_generator_tpu.ops.sinusoidal import (  # noqa: F401
    positional_encoding_2d,
    time_encoding_2d,
)
from ldm_image_generator_tpu.ops.window import (  # noqa: F401
    merge_windows,
    pad_to_window_multiple,
    partition_windows,
)
