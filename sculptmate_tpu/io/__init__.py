from sculptmate_tpu.io.export import write_obj, write_glb  # noqa: F401
