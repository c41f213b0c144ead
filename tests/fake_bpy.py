"""Minimal in-process bpy stand-in so the add-on layer (panel, preferences,
blender_io) can register and execute in CI without Blender.

Only the surface the add-on actually touches is implemented; everything node-
graph-shaped is a permissive recording mock. Install with
``fake_bpy.install()`` BEFORE importing ``sculptmate_tpu.addon.*``.
"""

from __future__ import annotations

import sys
import types


class _Prop:
    """Property factory result; acts as a descriptor with a default."""

    def __init__(self, **kw):
        self.default = kw.get("default")
        self.kw = kw
        self._key = f"_prop_{id(self)}"

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        return obj.__dict__.get(self._key, self.default)

    def __set__(self, obj, value):
        obj.__dict__[self._key] = value


def _prop_factory(**kw):
    return _Prop(**kw)


class _Layout:
    """Recording UI layout: every draw call appends to .calls."""

    def __init__(self, calls=None):
        self.calls = calls if calls is not None else []
        self.enabled = True

    def _rec(self, kind, *a, **kw):
        self.calls.append((kind, a, kw))
        return _Layout(self.calls)

    def column(self, **kw):
        return self._rec("column", **kw)

    def row(self, **kw):
        return self._rec("row", **kw)

    def prop(self, obj, name, **kw):
        return self._rec("prop", name, **kw)

    def operator(self, idname, **kw):
        return self._rec("operator", idname, **kw)

    def label(self, **kw):
        return self._rec("label", **kw)


class _Permissive:
    """Auto-vivifying attribute/key/call mock for node trees, images, ..."""

    def __init__(self, name="root"):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_children", {})

    def __getattr__(self, key):
        ch = object.__getattribute__(self, "_children")
        if key not in ch:
            ch[key] = _Permissive(f"{self._name}.{key}")
        return ch[key]

    def __setattr__(self, key, value):
        object.__getattribute__(self, "_children")[key] = value

    def __getitem__(self, key):
        return self.__getattr__(f"[{key}]")

    def __setitem__(self, key, value):
        object.__getattribute__(self, "_children")[f"[{key}]"] = value

    def __call__(self, *a, **kw):
        return _Permissive(f"{self._name}()")

    def __iter__(self):
        return iter(())


class _Loop:
    def __init__(self, vertex_index):
        self.vertex_index = vertex_index


class _Polygon:
    def __init__(self, loop_indices):
        self.loop_indices = loop_indices


class _FakeMesh(_Permissive):
    """Mesh datablock with a real from_pydata -> polygons/loops."""

    def __init__(self, name):
        super().__init__(name)
        self.verts = []
        self.faces = []
        self.polygons = []
        self.loops = []
        self.materials = []
        object.__getattribute__(self, "_children")["materials"] = self.materials

    def from_pydata(self, verts, edges, faces):
        self.verts = list(verts)
        self.faces = list(faces)
        self.loops = []
        self.polygons = []
        for f in faces:
            idxs = []
            for v in f:
                idxs.append(len(self.loops))
                self.loops.append(_Loop(v))
            self.polygons.append(_Polygon(idxs))


class _Collection:
    def __init__(self, factory):
        self._factory = factory
        self.items = []

    def new(self, name=None, **kw):
        obj = self._factory(name or kw.get("name", "unnamed"), **kw)
        self.items.append(obj)
        return obj


class _Object(_Permissive):
    def __init__(self, name, object_data=None, **kw):
        super().__init__(name)
        self.name = name
        self.data = object_data


def install() -> types.ModuleType:
    """Create a fresh fake bpy module and register it in sys.modules."""
    bpy = types.ModuleType("bpy")

    # -- types ----------------------------------------------------------
    class Operator:
        pass

    class Panel:
        pass

    class AddonPreferences:
        def __init__(self):
            self.layout = _Layout()

    class WindowManager:
        def fileselect_add(self, op):
            self.fileselect_ops = getattr(self, "fileselect_ops", []) + [op]

    bpy.types = types.SimpleNamespace(
        Operator=Operator,
        Panel=Panel,
        AddonPreferences=AddonPreferences,
        WindowManager=WindowManager,
    )

    # -- props ----------------------------------------------------------
    bpy.props = types.SimpleNamespace(
        StringProperty=_prop_factory,
        BoolProperty=_prop_factory,
        IntProperty=_prop_factory,
        EnumProperty=_prop_factory,
        FloatProperty=_prop_factory,
    )

    # -- utils registry --------------------------------------------------
    registered = []

    def register_class(cls):
        registered.append(cls)

    def unregister_class(cls):
        registered.remove(cls)

    bpy.utils = types.SimpleNamespace(
        register_class=register_class,
        unregister_class=unregister_class,
        registered=registered,
    )

    # -- context / data ---------------------------------------------------
    wm = WindowManager()
    linked = []
    bpy.context = types.SimpleNamespace(
        window_manager=wm,
        collection=types.SimpleNamespace(
            objects=types.SimpleNamespace(link=linked.append)
        ),
        linked_objects=linked,
    )
    bpy.data = types.SimpleNamespace(
        meshes=_Collection(lambda name, **kw: _FakeMesh(name)),
        objects=_Collection(_Object),
        materials=_Collection(lambda name, **kw: _Permissive(name)),
        images=_Collection(lambda name, **kw: _Permissive(name)),
    )

    sys.modules["bpy"] = bpy
    return bpy
