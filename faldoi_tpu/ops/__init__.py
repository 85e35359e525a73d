from faldoi_tpu.ops.stencils import (  # noqa: F401
    divergence,
    forward_gradient,
    backward_gradient,
    centered_gradient,
    divergence_patch,
    forward_gradient_patch,
)
from faldoi_tpu.ops.gaussian import gaussian_smooth, gaussian1d_weight  # noqa: F401
from faldoi_tpu.ops.normalize import (  # noqa: F401
    image_normalization,
    image_normalization_3,
    image_normalization_4,
)
from faldoi_tpu.ops.bicubic import bicubic_interp_at, bicubic_warp  # noqa: F401
