"""Model zoo: the TPU-native equivalents of the reference's `examples/`
model families (SURVEY.md §2.4)."""

from .classification import MinkowskiFCNN, MinkowskiSplatFCNN, field_slice
from .completion import CompletionNet, GenerativeNet
from .dense_unet import (
    Attention3D,
    DenseAttention,
    DenseTransformer3D,
    Downsample3D,
    ResnetBlock3D,
    UNet3DConditionModel,
    UNet3DModel,
    Upsample3D,
)
from .minkunet import (
    MinkUNet14,
    MinkUNet18,
    MinkUNet34,
    MinkUNet34A,
    MinkUNet34B,
    MinkUNet34C,
    MinkUNet50,
    MinkUNet101,
    MinkUNetBase,
)
from .pointnet import MinkowskiPointNet, PointNet
from .resnet import ResNet14, ResNet18, ResNet34, ResNet50, ResNet101, ResNetBase
from .unet import UNet
from .vae import VAE, Decoder, Encoder, vae_loss
from .vqvae import VQVAE, VectorQuantizer

__all__ = [
    "MinkowskiFCNN", "MinkowskiSplatFCNN", "field_slice", "CompletionNet",
    "Attention3D", "DenseAttention", "DenseTransformer3D", "Downsample3D",
    "ResnetBlock3D", "UNet3DConditionModel", "UNet3DModel", "Upsample3D",
    "GenerativeNet", "MinkUNet14", "MinkUNet18", "MinkUNet34", "MinkUNet34A",
    "MinkUNet34B", "MinkUNet34C", "MinkUNet50", "MinkUNet101", "MinkUNetBase",
    "MinkowskiPointNet", "PointNet", "ResNet14", "ResNet18", "ResNet34",
    "ResNet50", "ResNet101", "ResNetBase", "UNet", "VAE", "Decoder",
    "Encoder", "vae_loss", "VQVAE", "VectorQuantizer",
]
