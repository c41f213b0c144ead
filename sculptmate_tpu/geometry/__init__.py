from sculptmate_tpu.geometry.marching_cubes import (  # noqa: F401
    marching_cubes,
    marching_cubes_host,
    MCResult,
)
