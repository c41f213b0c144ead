"""Add-on smoke tests under a fake bpy: register classes, drive the Generate
operator end-to-end (stubbed generator), draw the panel/preferences, import a
mesh into the fake scene (vs reference ``GUIPanel.py:69-228``)."""

import importlib
import sys
import time

import numpy as np
import pytest

import fake_bpy


@pytest.fixture()
def bpy_env(monkeypatch):
    # restore (not pop) any pre-existing fake bpy on teardown: the
    # reference-module tests install one at collection time and the
    # reference's tsr/system.py needs it at import (`import bpy`)
    prev = sys.modules.get("bpy")
    bpy = fake_bpy.install()
    # (re)import the addon modules against the fresh fake bpy
    for mod in ("panel", "preferences", "blender_io"):
        name = f"sculptmate_tpu.addon.{mod}"
        if name in sys.modules:
            importlib.reload(sys.modules[name])
        else:
            importlib.import_module(name)
    yield bpy
    if prev is not None:
        sys.modules["bpy"] = prev
    else:
        sys.modules.pop("bpy", None)


def test_panel_register_and_draw(bpy_env):
    from sculptmate_tpu.addon import panel

    panel.register()
    assert len(bpy_env.utils.registered) == 3

    wm = bpy_env.context.window_manager
    assert wm.sm_model_type == "lean"
    assert wm.sm_buttons_enabled is True

    p = panel.SM_PT_Main()
    p.layout = fake_bpy._Layout()
    p.draw(bpy_env.context)
    kinds = [c[0] for c in p.layout.calls]
    assert "operator" in kinds and "prop" in kinds

    # fast mode exposes the simplification dropdown
    wm.sm_model_type = "fast"
    p2 = panel.SM_PT_Main()
    p2.layout = fake_bpy._Layout()
    p2.draw(bpy_env.context)
    assert len(p2.layout.calls) > len(p.layout.calls) - 2

    panel.unregister()
    assert not bpy_env.utils.registered


def test_generate_operator_end_to_end(bpy_env, monkeypatch, tmp_path):
    from PIL import Image

    from sculptmate_tpu.addon import panel
    import sculptmate_tpu.frontend as frontend

    panel.register()
    wm = bpy_env.context.window_manager

    # no image selected -> CANCELLED with a message
    op = panel.SM_OT_Generate()
    assert op.execute(bpy_env.context) == {"CANCELLED"}
    assert "image" in wm.sm_message.lower()

    img_path = tmp_path / "input.png"
    Image.new("RGBA", (300, 300), (200, 40, 40, 255)).save(img_path)
    wm.sm_image_path = str(img_path)

    # stub the heavy pieces: preprocessing passthrough + instant generator
    monkeypatch.setattr(
        frontend, "preprocess_image", lambda img, **kw: img
    )

    calls = {}

    class FakeGen:
        def initiate_model(self):
            calls["init"] = True

        def generate_mesh(self, image, **kw):
            calls["image_shape"] = np.asarray(image).shape
            calls["kw"] = kw
            return 0

    monkeypatch.setattr(panel, "TripoGenerator", FakeGen)
    monkeypatch.setitem(panel._generators, "lean", None)

    assert op.execute(bpy_env.context) == {"FINISHED"}
    deadline = time.time() + 30
    while not wm.sm_buttons_enabled and time.time() < deadline:
        time.sleep(0.05)
    assert wm.sm_buttons_enabled, "worker thread never finished"
    assert wm.sm_message.startswith("Done"), wm.sm_message
    assert calls["init"] and calls["image_shape"] == (300, 300, 4)
    assert calls["kw"]["mesh_name"] == "input"

    # failure code surfaces to the UI
    class FailGen(FakeGen):
        def generate_mesh(self, image, **kw):
            return 2

    monkeypatch.setitem(panel._generators, "lean", FailGen())
    assert op.execute(bpy_env.context) == {"FINISHED"}
    deadline = time.time() + 30
    while not wm.sm_buttons_enabled and time.time() < deadline:
        time.sleep(0.05)
    assert "failed" in wm.sm_message.lower()
    panel.unregister()


def test_file_browser_operator(bpy_env):
    from sculptmate_tpu.addon import panel

    op = panel.SM_OT_FileBrowser()
    op.filepath = "/tmp/pic.png"
    assert op.execute(bpy_env.context) == {"FINISHED"}
    assert bpy_env.context.window_manager.sm_image_path == "/tmp/pic.png"
    assert op.invoke(bpy_env.context, None) == {"RUNNING_MODAL"}
    assert bpy_env.context.window_manager.fileselect_ops == [op]


def test_preferences_register_draw_download(bpy_env, monkeypatch):
    from sculptmate_tpu.addon import preferences

    preferences.register()
    wm = bpy_env.context.window_manager
    assert wm.sm_download_progress == -1

    prefs = preferences.SMPreferences()
    prefs.draw(bpy_env.context)
    labels = [c for c in prefs.layout.calls if c[0] == "label"]
    assert any("Compute" in c[2].get("text", "") for c in labels)

    # stubbed download: worker thread drives the progress property to 100
    class Res:
        ok = True
        error = None

    monkeypatch.setattr(preferences, "ensure_checkpoint", lambda name: Res())
    op = preferences.SM_OT_DownloadCheckpoints()
    assert op.execute(bpy_env.context) == {"FINISHED"}
    deadline = time.time() + 30
    while wm.sm_download_progress != 100 and time.time() < deadline:
        time.sleep(0.05)
    assert wm.sm_download_progress == 100
    preferences.unregister()


def test_blender_io_import_mesh(bpy_env):
    from sculptmate_tpu.addon import blender_io

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    colors = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], np.float32
    )
    obj = blender_io.import_mesh(verts, faces, vertex_colors=colors, name="m")
    assert bpy_env.context.linked_objects == [obj]
    mesh = obj.data
    assert len(mesh.verts) == 4 and len(mesh.faces) == 2
    assert len(mesh.loops) == 6 and len(mesh.materials) == 1

    # textured path (SF3D-style): uv layer + baked images
    uvs = np.random.default_rng(0).random((4, 2)).astype(np.float32)
    tex = {
        "albedo": np.zeros((8, 8, 3), np.float32),
        "bump": np.zeros((8, 8, 3), np.float32),
    }
    obj2 = blender_io.import_mesh(
        verts, faces, uvs=uvs, textures=tex, roughness=0.4, metallic=0.1,
        name="m2",
    )
    assert len(bpy_env.data.images.items) == 2
    assert obj2.data is not mesh
