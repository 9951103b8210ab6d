"""swin_unet_image_fusion_tpu — TPU-native dual-stream Swin-UNet IR/visible image fusion.

Brand-new JAX/XLA/Pallas/pjit framework with the full capabilities of the PyTorch
reference ``RainbowZL0/swin-unet-image-fusion`` (see SURVEY.md for the blueprint).
"""

from .config import Config, ModelConfig, LossConfig, OptimConfig, DataConfig, LogConfig
from .models.unet import SwinFusionUNet

__version__ = "0.1.0"


def fuse(ir, vis_y, checkpoint: str, cfg: Config | None = None):
    """One-call fusion: ``fuse(ir, vis_y, checkpoint) -> fused`` (NHWC float [0,1]).

    ``checkpoint`` may be an Orbax directory or a reference ``.pth`` file.
    For the full colour path / batch APIs use :class:`infer.Fuser`.
    """
    from .infer import Fuser

    fuser = Fuser.from_checkpoint(cfg or Config(), checkpoint)
    return fuser.fuse_y(ir, vis_y)


__all__ = [
    "Config",
    "ModelConfig",
    "LossConfig",
    "OptimConfig",
    "DataConfig",
    "LogConfig",
    "SwinFusionUNet",
    "fuse",
]
