from sculptmate_tpu.models.transformer import (  # noqa: F401
    Attention,
    BasicTransformerBlock,
    Transformer1D,
)
from sculptmate_tpu.models.tokenizers import (  # noqa: F401
    Triplane1DTokenizer,
    TriplaneLearnablePositionalEmbedding,
)
from sculptmate_tpu.models.vit import ViTEncoder, DINOSingleImageTokenizer  # noqa: F401
from sculptmate_tpu.models.heads import NeRFMLP, MaterialMLP  # noqa: F401
from sculptmate_tpu.models.upsamplers import (  # noqa: F401
    TriplaneUpsampleNetwork,
    PixelShuffleUpsampleNetwork,
)
