"""swin_unet_image_fusion_tpu — TPU-native dual-stream Swin-UNet IR/visible image fusion.

Brand-new JAX/XLA/Pallas/pjit framework with the full capabilities of the PyTorch
reference ``RainbowZL0/swin-unet-image-fusion`` (see SURVEY.md for the blueprint).
"""

from .config import Config, ModelConfig, LossConfig, OptimConfig, DataConfig, LogConfig
from .models.unet import SwinFusionUNet

__version__ = "0.1.0"

__all__ = [
    "Config",
    "ModelConfig",
    "LossConfig",
    "OptimConfig",
    "DataConfig",
    "LogConfig",
    "SwinFusionUNet",
]
