from sculptmate_tpu.ops.activations import get_activation, trunc_exp  # noqa: F401
from sculptmate_tpu.ops.resize import resize_bilinear_antialias, resize_lanczos  # noqa: F401
from sculptmate_tpu.ops.grid_sample import (  # noqa: F401
    grid_sample_2d,
    sample_triplane,
    sample_triplane_regular_grid,
)
