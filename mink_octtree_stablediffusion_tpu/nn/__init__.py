"""NN layer family over sparse tensors (flax.linen modules).

The TPU-native equivalent of the reference's L4/L5 layers
(`MinkowskiEngine/Minkowski*.py`, `MinkowskiEngine/modules/`).
"""

from .act import (
    Dropout,
    Sinusoidal,
    apply_fn,
    elu,
    gelu,
    get_act,
    relu,
    sigmoid,
    silu,
    softmax,
    tanh,
)
from .attention import MortonWindowTransformer, SparseAttention, SparseTransformer
from .blocks import (
    BasicBlock,
    ResBasicBlock,
    ResBottleneck,
    ResNetStack,
    SEBasicBlock,
    SELayer,
    _HeadConvNormAct,
    remat_stack,
)
from .conv import (
    ChannelwiseConv,
    GenerativeConvTranspose,
    Linear,
    SparseConv,
    SparseConvTranspose,
    UpsampleInterpolate,
)
from .embed import LinearPositionalEncoding, TimestepEmbedding, timesteps_embedding
from .norm import (
    AdaStableInstanceNorm,
    BatchNorm,
    GroupNormDense,
    InstanceNorm,
    StableGroupNorm,
    StableInstanceNorm,
)
from .pool import (
    GlobalMaxAvgPool,
    GlobalPool,
    LocalPool,
    PoolTranspose,
    broadcast_concat,
    broadcast_op,
    global_pool_features,
)

__all__ = [
    "Dropout", "Sinusoidal", "apply_fn", "elu", "gelu", "get_act", "relu",
    "sigmoid", "silu", "softmax", "tanh", "MortonWindowTransformer",
    "SparseAttention", "SparseTransformer", "BasicBlock", "ResBasicBlock",
    "ResBottleneck", "ResNetStack", "SEBasicBlock", "SELayer", "remat_stack",
    "ChannelwiseConv", "GenerativeConvTranspose", "Linear", "SparseConv",
    "SparseConvTranspose", "UpsampleInterpolate", "LinearPositionalEncoding",
    "TimestepEmbedding", "timesteps_embedding", "AdaStableInstanceNorm",
    "BatchNorm", "GroupNormDense", "InstanceNorm", "StableGroupNorm",
    "StableInstanceNorm", "GlobalMaxAvgPool", "GlobalPool", "LocalPool",
    "PoolTranspose", "broadcast_concat", "broadcast_op",
    "global_pool_features",
]
