"""Generator facades, API-compatible with the reference.

``TripoGenerator`` mirrors ``TripoSR/generate.py:8-43`` and
``Fast3DGenerator`` mirrors ``StableFast/generate.py:8-59``: lazy
``initiate_model`` + ``generate_mesh`` with the same return-code convention
(0 ok / 1 not-initialized / 2 error). ``device`` arguments are accepted for
signature parity but device placement is JAX's job; ``mc_resolution`` and
``chunk_size`` knobs map onto the fused grid query (chunking is internal).

When running inside Blender, ``generate_mesh`` imports the result into the
scene via ``sculptmate_tpu.addon.blender_io``; otherwise it writes
OBJ/GLB next to the input (or to ``output_path``).
"""

from __future__ import annotations

import os
import time
import traceback
from typing import Optional


def _in_blender() -> bool:
    try:
        import bpy  # noqa: F401

        return True
    except ImportError:
        return False


class TripoGenerator:
    def __init__(self):
        self.model = None
        self.chunk_size = 8192  # accepted for parity; fused query ignores it
        self.mc_resolution = 256

    def initiate_model(self, checkpoint_dir: Optional[str] = None, device: str = "tpu"):
        try:
            from sculptmate_tpu.systems.tsr import TSR, TSRConfig

            config = None
            params = None
            if checkpoint_dir and os.path.isdir(checkpoint_dir):
                cfg_path = os.path.join(checkpoint_dir, "config.yaml")
                if os.path.isfile(cfg_path):
                    config = TSRConfig.from_yaml(cfg_path)
                ckpt_path = os.path.join(checkpoint_dir, "model.ckpt")
                if os.path.isfile(ckpt_path):
                    from sculptmate_tpu.runtime.checkpoint import load_tsr_checkpoint

                    params = load_tsr_checkpoint(ckpt_path)
            self.model = TSR(config=config, params=params)
            return 0
        except Exception:
            print("[Model Initialization Error]", traceback.format_exc())
            return 1

    def generate_mesh(
        self,
        image,
        device: str = "tpu",
        enable_texture: bool = True,
        mesh_name: str = "NewMesh",
        output_path: Optional[str] = None,
        threshold: float = 25.0,
    ):
        if self.model is None:
            return 1
        try:
            import numpy as np
            import jax.numpy as jnp

            t0 = time.time()
            arr = np.asarray(image, dtype=np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            if arr.ndim == 3:
                arr = arr[None]
            arr = arr[..., :3]
            codes = self.model.scene_codes(jnp.asarray(arr))
            meshes = self.model.extract_mesh(
                codes,
                has_vertex_color=enable_texture,
                resolution=self.mc_resolution,
                threshold=threshold,
            )
            verts, faces, colors = meshes[0]
            print(f"[SculptMate Logging] Generation took {time.time() - t0:.2f}s")
            if len(verts) == 0:
                return 2
            if _in_blender():
                from sculptmate_tpu.addon.blender_io import import_mesh

                import_mesh(verts, faces, vertex_colors=colors, name=mesh_name)
            else:
                from sculptmate_tpu.io import write_glb

                out = output_path or f"{mesh_name}.glb"
                write_glb(out, verts, faces, vertex_colors=colors)
            return 0
        except Exception:
            print("[Generation Error]", traceback.format_exc())
            return 2


class Fast3DGenerator:
    def __init__(self):
        self.model = None
        self.texture_resolution = 512

    def initiate_model(self, checkpoint_dir: Optional[str] = None, device: str = "tpu"):
        try:
            from sculptmate_tpu.systems.sf3d import SF3D, SF3DConfig

            config = None
            params = None
            if checkpoint_dir and os.path.isdir(checkpoint_dir):
                cfg_path = os.path.join(checkpoint_dir, "config.yaml")
                if os.path.isfile(cfg_path):
                    config = SF3DConfig.from_yaml(cfg_path)
                st_path = os.path.join(checkpoint_dir, "model.safetensors")
                if os.path.isfile(st_path):
                    from sculptmate_tpu.runtime.checkpoint import load_sf3d_checkpoint

                    params = load_sf3d_checkpoint(st_path)
            self.model = SF3D(config=config, params=params)
            return 0
        except Exception:
            print("[Model Initialization Error]", traceback.format_exc())
            return 1

    def generate_mesh(
        self,
        image,
        device: str = "tpu",
        vertex_simplification_factor: str = "high",
        enable_texture: bool = True,
        mesh_name: str = "NewMesh",
        output_path: Optional[str] = None,
    ):
        if self.model is None:
            return 1
        try:
            import numpy as np
            import jax.numpy as jnp

            t0 = time.time()
            arr = np.asarray(image, dtype=np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            if arr.ndim == 3:
                arr = arr[None]
            mesh = self.model.run_image(
                jnp.asarray(arr),
                bake_resolution=self.texture_resolution,
                vertex_simplification_factor=vertex_simplification_factor,
                enable_texture=enable_texture,
            )
            print(f"[SculptMate Logging] Generation took {time.time() - t0:.2f}s")
            if mesh is None or len(mesh["verts"]) == 0:
                return 2
            if _in_blender():
                from sculptmate_tpu.addon.blender_io import import_mesh

                import_mesh(
                    mesh["verts"],
                    mesh["faces"],
                    uvs=mesh.get("uvs"),
                    textures=mesh.get("textures"),
                    name=mesh_name,
                )
            else:
                from sculptmate_tpu.io import write_glb

                out = output_path or f"{mesh_name}.glb"
                write_glb(
                    out,
                    mesh["verts"],
                    mesh["faces"],
                    normals=mesh.get("normals"),
                    uvs=mesh.get("uvs"),
                    textures=mesh.get("texture_pngs"),
                )
            return 0
        except Exception:
            print("[Generation Error]", traceback.format_exc())
            return 2
