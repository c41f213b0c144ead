from sculptmate_tpu.parallel.mesh import make_mesh, replicate, shard_batch  # noqa: F401
