"""Import helpers for the reference torch modules under /root/reference.

The reference's ``tsr`` and ``sf3d`` trees have no ``__init__.py`` — Python 3
treats them as namespace packages once their parent dirs are on ``sys.path``,
and the reference's relative imports (``from ...utils import BaseModule``)
resolve normally.

``omegaconf`` is not installed in this environment; the reference only uses
``OmegaConf.structured(dataclass) + merge(cfg)`` inside ``parse_structured``
(``tsr/utils.py:14-16``, ``sf3d/models/utils.py:42-54``), so a minimal
structural stub is installed into ``sys.modules`` before import. The stub
returns a plain attribute object — enough for every ``self.cfg.<field>``
access the reference modules perform.
"""

from __future__ import annotations

import dataclasses
import sys
import types

TRIPO_ROOT = "/root/reference/TripoSR"
SF3D_ROOT = "/root/reference/StableFast"


def _install_omegaconf_stub() -> None:
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")

    class DictConfig(dict):
        pass

    class OmegaConf:
        @staticmethod
        def structured(fields):
            obj = fields.__new__(fields)
            for f in dataclasses.fields(fields):
                if f.default is not dataclasses.MISSING:
                    setattr(obj, f.name, f.default)
                elif f.default_factory is not dataclasses.MISSING:
                    setattr(obj, f.name, f.default_factory())
            return obj

        @staticmethod
        def merge(base, cfg=None):
            # real OmegaConf structures nested dataclass fields: a YAML list
            # under a List[HeadSpec] field becomes HeadSpec instances with
            # dataclass DEFAULTS applied (e.g. out_bias=0.0 —
            # sf3d/models/network.py:140-145). Mirror that for dataclass,
            # Optional[dataclass], and List[dataclass] targets.
            import typing

            try:
                hints = typing.get_type_hints(type(base))
            except Exception:
                hints = {}

            def build(dc, d):
                names = {f.name for f in dataclasses.fields(dc)}
                return dc(**{k: v for k, v in dict(d).items() if k in names})

            for k, v in dict(cfg or {}).items():
                t = hints.get(k)
                if t is not None:
                    origin = typing.get_origin(t)
                    args = typing.get_args(t)
                    if (
                        origin is list
                        and args
                        and dataclasses.is_dataclass(args[0])
                        and isinstance(v, list)
                    ):
                        v = [
                            build(args[0], e) if isinstance(e, dict) else e
                            for e in v
                        ]
                    elif dataclasses.is_dataclass(t) and isinstance(v, dict):
                        v = build(t, v)
                    elif origin is typing.Union and isinstance(v, dict):
                        dcs = [a for a in args if dataclasses.is_dataclass(a)]
                        if dcs:
                            v = build(dcs[0], v)
                setattr(base, k, v)
            return base

    mod.DictConfig = DictConfig
    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


def _install_skimage_stub() -> None:
    """The reference's ``tsr/models/isosurface.py`` imports skimage at module
    level; this environment has no skimage. The stub keeps the import working
    and raises ModuleNotFoundError only if actually CALLED — callers fall back
    to an independent oracle (e.g. this repo's marching tets)."""
    if "skimage" in sys.modules:
        return
    mod = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")

    def marching_cubes(*a, **k):
        raise ModuleNotFoundError("skimage not installed (import-time stub)")

    measure.marching_cubes = marching_cubes
    mod.measure = measure
    sys.modules["skimage"] = mod
    sys.modules["skimage.measure"] = measure


def add_reference_paths() -> None:
    """Make ``import tsr.*`` / ``import sf3d.*`` resolve to /root/reference."""
    _install_omegaconf_stub()
    _install_skimage_stub()
    # the reference's tsr/system.py imports bpy at module level (it exports
    # straight into Blender); outside Blender install the fake-bpy stub the
    # addon tests already use
    if "bpy" not in sys.modules:
        import fake_bpy

        fake_bpy.install()
    # sf3d/models/utils.py does ``import PIL`` then references ``PIL.Image``,
    # which only resolves if PIL.Image was imported somewhere first
    import PIL.Image  # noqa: F401
    for p in (TRIPO_ROOT, SF3D_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
