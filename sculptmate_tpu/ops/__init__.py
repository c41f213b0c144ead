from sculptmate_tpu.ops.activations import get_activation, trunc_exp  # noqa: F401
from sculptmate_tpu.ops.resize import resize_bilinear_antialias, resize_lanczos  # noqa: F401
from sculptmate_tpu.ops.grid_sample import (  # noqa: F401
    grid_sample_2d,
    sample_triplane,
    sample_triplane_regular_grid,
)


def size_bucket(n: int, lo: int = 4096) -> int:
    """Static-shape bucket for jit reuse: the next power of two OR 1.5x a
    power of two >= n (max ~33% slack vs pow2's ~100%, ~2 compile variants
    per octave). Used to size padded device buffers (bake attrs, unwrap UV
    downloads) whose transfer bytes scale with the bucket."""
    n = max(int(n), 1)
    b = 1 << max((lo - 1).bit_length(), (n - 1).bit_length())
    three_q = (b // 4) * 3
    if three_q >= n and three_q >= lo:
        return three_q
    return b
