from .unet import STREAMS, SwinFusionUNet
from .layers import (
    BasicBlock,
    DualMLP,
    DualWindowAttention,
    FinalHead,
    PatchMergeLayer,
    PatchUnmergeLayer,
    SelfAndCrossBlockPair,
    StackedDense,
    StackedLayerNorm,
)

__all__ = [
    "STREAMS",
    "SwinFusionUNet",
    "BasicBlock",
    "DualMLP",
    "DualWindowAttention",
    "FinalHead",
    "PatchMergeLayer",
    "PatchUnmergeLayer",
    "SelfAndCrossBlockPair",
    "StackedDense",
    "StackedLayerNorm",
]
