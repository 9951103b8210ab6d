"""Minimal end-to-end example: fuse one IR/visible pair.

Runs with random weights if no checkpoint is given (output is untrained but exercises
the full pipeline: YCrCb split, arbitrary-size forward, colour reconstruction).

Usage:
    python examples/fuse_pair.py IR_IMAGE VIS_IMAGE OUT_IMAGE [checkpoint]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if a != "--cpu"]
    ir_path, vis_path, out_path = args[:3]
    ckpt = args[3] if len(args) > 3 else None

    import cv2
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from swin_unet_image_fusion_tpu.config import Config
    from swin_unet_image_fusion_tpu.infer import Fuser, save_image
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = Config()
    if ckpt:
        fuser = Fuser.from_checkpoint(cfg, ckpt)
    else:
        print("no checkpoint given - using random weights (pipeline demo only)")
        model = SwinFusionUNet(cfg.model)
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 64, 64, 1))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
        fuser = Fuser(cfg, variables["params"], variables.get("batch_stats", {}))

    ir = cv2.imread(ir_path, cv2.IMREAD_GRAYSCALE)
    vis = cv2.imread(vis_path, cv2.IMREAD_COLOR)
    if ir is None or vis is None:
        raise SystemExit("failed to read input images")
    if vis.shape[:2] != ir.shape[:2]:
        vis = cv2.resize(vis, (ir.shape[1], ir.shape[0]))

    ir_in = ir[None, :, :, None].astype(np.float32) / 255.0
    vis_ycrcb = cv2.cvtColor(vis, cv2.COLOR_BGR2YCrCb)[None].astype(np.float32) / 255.0

    rgb = fuser.fuse_pair_ycrcb(ir_in, vis_ycrcb)[0]
    save_image(rgb, out_path)
    print(f"fused {ir.shape[1]}x{ir.shape[0]} pair -> {out_path}")


if __name__ == "__main__":
    main()
