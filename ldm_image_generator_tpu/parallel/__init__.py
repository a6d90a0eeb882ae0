from ldm_image_generator_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    param_shardings,
    replicated,
    shard_opt_state,
    shard_params,
    spatial_sharding,
    zero1_shardings,
)
