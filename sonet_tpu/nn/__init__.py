"""Network modules (L3 of SURVEY.md §1) — flax.linen, channel-last."""

from .layers import (
    BatchNorm,
    KNNModule,
    PointLayer,
    PointNetMLP,
    PointResNet,
    UpConv,
    activation_fn,
)
from .encoder import Encoder, EncoderOutput, Transformer, rotation_matrix_y
from .heads import ClassifierHead, SegmenterHead, NUM_SHAPE_CATEGORIES
from .decoder import (
    Decoder,
    DecoderConv,
    DecoderLinear,
    DecoderOutput,
    ConvToPC,
)

__all__ = [
    "BatchNorm", "KNNModule", "PointLayer", "PointNetMLP", "PointResNet",
    "UpConv", "activation_fn",
    "Encoder", "EncoderOutput", "Transformer", "rotation_matrix_y",
    "ClassifierHead", "SegmenterHead", "NUM_SHAPE_CATEGORIES",
    "Decoder", "DecoderConv", "DecoderLinear", "DecoderOutput", "ConvToPC",
]
