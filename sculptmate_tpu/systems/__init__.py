from sculptmate_tpu.systems.tsr import TSR, TSRConfig  # noqa: F401
from sculptmate_tpu.systems.sf3d import SF3D, SF3DConfig  # noqa: F401
