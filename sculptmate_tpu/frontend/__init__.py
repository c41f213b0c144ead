from sculptmate_tpu.frontend.matting import remove, U2NetMatting  # noqa: F401
from sculptmate_tpu.frontend.sessions import new_session  # noqa: F401
from sculptmate_tpu.frontend.preprocess import (  # noqa: F401
    preprocess_image,
    preprocess_batch_device,
    preprocess_device_one,
)
