from sculptmate_tpu.io.export import write_obj, write_glb, read_obj  # noqa: F401
