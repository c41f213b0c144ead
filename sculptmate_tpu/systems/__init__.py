from sculptmate_tpu.systems.tsr import TSR, TSRConfig  # noqa: F401
