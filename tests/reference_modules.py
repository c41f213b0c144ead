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
            for k, v in dict(cfg or {}).items():
                setattr(base, k, v)
            return base

    mod.DictConfig = DictConfig
    mod.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = mod


def add_reference_paths() -> None:
    """Make ``import tsr.*`` / ``import sf3d.*`` resolve to /root/reference."""
    _install_omegaconf_stub()
    # sf3d/models/utils.py does ``import PIL`` then references ``PIL.Image``,
    # which only resolves if PIL.Image was imported somewhere first
    import PIL.Image  # noqa: F401
    for p in (TRIPO_ROOT, SF3D_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
