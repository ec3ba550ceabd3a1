"""NN layer family over sparse tensors (flax.linen modules).

The TPU-native equivalent of the reference's L4/L5 layers
(`MinkowskiEngine/Minkowski*.py`, `MinkowskiEngine/modules/`).
"""

from .act import (
    AdaptiveLogSoftmaxWithLoss,
    AlphaDropout,
    Dropout,
    PReLU,
    RReLU,
    Sinusoidal,
    apply_fn,
    elu,
    gelu,
    get_act,
    hardshrink,
    relu,
    sigmoid,
    silu,
    softmax,
    softshrink,
    tanh,
    threshold,
)
from .attention import MortonWindowTransformer, SparseAttention, SparseTransformer
from .blocks import (
    BasicBlock,
    ResBasicBlock,
    ResBottleneck,
    ResNetStack,
    SEBasicBlock,
    SEBottleneck,
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
    HjmInstanceNorm,
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
    "AdaptiveLogSoftmaxWithLoss", "AlphaDropout", "Dropout", "PReLU",
    "RReLU", "Sinusoidal", "apply_fn", "elu", "gelu", "get_act",
    "hardshrink", "relu", "sigmoid", "silu", "softmax", "softshrink",
    "tanh", "threshold", "MortonWindowTransformer",
    "SparseAttention", "SparseTransformer", "BasicBlock", "ResBasicBlock",
    "ResBottleneck", "ResNetStack", "SEBasicBlock", "SEBottleneck",
    "SELayer", "remat_stack",
    "ChannelwiseConv", "GenerativeConvTranspose", "Linear", "SparseConv",
    "SparseConvTranspose", "UpsampleInterpolate", "LinearPositionalEncoding",
    "TimestepEmbedding", "timesteps_embedding", "AdaStableInstanceNorm",
    "BatchNorm", "GroupNormDense", "HjmInstanceNorm", "InstanceNorm",
    "StableGroupNorm",
    "StableInstanceNorm", "GlobalMaxAvgPool", "GlobalPool", "LocalPool",
    "PoolTranspose", "broadcast_concat", "broadcast_op",
    "global_pool_features",
]
