"""SculptMate-TPU: a TPU-native (JAX/XLA/Pallas) image -> 3D mesh framework.

A from-scratch rebuild of the capabilities of the SculptMate Blender add-on
(reference: shravan-d/SculptMate) designed TPU-first:

- the image frontend (background matting + crop/pad/resize) is a fused jit'd
  JAX program (``sculptmate_tpu.frontend``);
- the TripoSR ("Lean") and Stable Fast 3D ("Pro") model stacks are flax
  modules compiled to single XLA programs (``sculptmate_tpu.models`` /
  ``sculptmate_tpu.systems``);
- density-grid queries, marching cubes, texture-bake rasterization run as
  Pallas/XLA device kernels (``sculptmate_tpu.ops``, ``sculptmate_tpu.geometry``);
- multi-chip scale-out goes through ``jax.sharding.Mesh`` + collectives
  (``sculptmate_tpu.parallel``), not host threading.

Public entry points mirror the reference facades
(``TripoSR/generate.py`` / ``StableFast/generate.py``):

    from sculptmate_tpu.pipelines import TripoGenerator, Fast3DGenerator
"""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: first compiles of the full-size programs take
# minutes (especially through remote-compile TPU setups); cache them on disk.
try:  # pragma: no cover - environment dependent
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("SCULPTMATE_JAX_CACHE", "/tmp/sculptmate_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from sculptmate_tpu.config import ConfigDict, load_yaml_config  # noqa: F401
