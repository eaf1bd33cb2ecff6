from .segment import segment_max, segment_mean, segment_softmax, segment_sum  # noqa: F401
from .graph_attention import TransformerConvParams, transformer_conv, init_transformer_conv  # noqa: F401
