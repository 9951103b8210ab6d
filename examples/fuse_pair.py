"""Minimal end-to-end example: fuse one IR/visible pair.

Runs with random weights if no checkpoint is given (output is untrained but exercises
the full pipeline: YCrCb split, arbitrary-size forward, colour reconstruction).

Usage:
    python examples/fuse_pair.py IR_IMAGE VIS_IMAGE OUT_IMAGE [--ckpt DIR] [--cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ir", help="infrared image (read as grayscale)")
    ap.add_argument("vis", help="visible image (read as BGR colour)")
    ap.add_argument("out", help="output path for the fused image")
    ap.add_argument("--ckpt", default=None, help="Orbax checkpoint dir (or .pth file)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import cv2
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from swin_unet_image_fusion_tpu.config import Config
    from swin_unet_image_fusion_tpu.infer import Fuser, save_image
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = Config()
    if args.ckpt:
        fuser = Fuser.from_checkpoint(cfg, args.ckpt)
    else:
        print("no checkpoint given - using random weights (pipeline demo only)")
        model = SwinFusionUNet(cfg.model)
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 64, 64, 1))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy)
        fuser = Fuser(cfg, variables["params"], variables.get("batch_stats", {}))

    ir = cv2.imread(args.ir, cv2.IMREAD_GRAYSCALE)
    vis = cv2.imread(args.vis, cv2.IMREAD_COLOR)
    if ir is None or vis is None:
        raise SystemExit("failed to read input images")
    if vis.shape[:2] != ir.shape[:2]:
        vis = cv2.resize(vis, (ir.shape[1], ir.shape[0]))

    ir_in = ir[None, :, :, None].astype(np.float32) / 255.0
    vis_ycrcb = cv2.cvtColor(vis, cv2.COLOR_BGR2YCrCb)[None].astype(np.float32) / 255.0

    rgb = fuser.fuse_pair_ycrcb(ir_in, vis_ycrcb)[0]
    save_image(rgb, args.out)
    print(f"fused {ir.shape[1]}x{ir.shape[0]} pair -> {args.out}")


if __name__ == "__main__":
    main()
