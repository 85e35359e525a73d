from faldoi_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    dp_global_refine,
    spatial_tvl2_global,
    pipeline_train_step,
)
