"""Blender add-on shell.

Mirrors the reference's UX surface (``__init__.py``/``GUIPanel.py``) with the
torch/pip machinery replaced by JAX device checks. Import of this package is
safe outside Blender (everything bpy-dependent is guarded)."""

bl_info = {
    "name": "SculptMate-TPU",
    "author": "sculptmate_tpu",
    "version": (0, 1, 0),
    "blender": (3, 2, 0),
    "location": "View3D > Sidebar > SculptMate",
    "description": "Generate a 3D model from an image (TPU-native JAX engine)",
    "category": "3D View",
}


def register():  # pragma: no cover - requires Blender
    from sculptmate_tpu.addon import panel, preferences

    preferences.register()
    panel.register()


def unregister():  # pragma: no cover - requires Blender
    from sculptmate_tpu.addon import panel, preferences

    panel.unregister()
    preferences.unregister()
