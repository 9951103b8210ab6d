"""Fuse the reference repo's bundled test images with a trained checkpoint.

The reference README's only result evidence is four GitHub-hosted images
(README.md:5-9) produced from real IR/VIS data this environment cannot fetch
(zero egress). The closest available analogue — round-4 VERDICT Missing #2 —
is the reference's own bundled test images
(`a001_prototype_unit_test/_test_images/000-003.jpg`, `test_1.jpg`): they are
not true IR/VIS pairs (512x640 colour photos), so each fusion pairs the
GRAYSCALE of one image as the IR stream with the next image's colour as the
visible stream, through the full serving path (YCrCb split, Y-fusion, Cr/Cb
reattach — infer.py / reference a017_test.py:56-90). Outputs land in
docs/images/ together with per-image fusion metrics (tools/evaluate.py's
metric suite).

Usage:
    python tools/fuse_reference_images.py --ckpt /tmp/tq20/jax_final_epoch20 [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

REF_DIR = "/root/reference/a001_prototype_unit_test"
PAIRS = [  # (ir_source, vis_source, output_name)
    ("_test_images/000.jpg", "_test_images/001.jpg", "ref_fusion_000x001"),
    ("_test_images/002.jpg", "_test_images/003.jpg", "ref_fusion_002x003"),
    ("_test_images/001.jpg", "_test_images/002.jpg", "ref_fusion_001x002"),
    ("test_1.jpg", "test_2.jpg", "ref_fusion_test1x2"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "docs/images"))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny config (smoke)")
    args = ap.parse_args()

    import cv2
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swin_unet_image_fusion_tpu.config import Config, ModelConfig
    from swin_unet_image_fusion_tpu.eval_metrics import score_fusion
    from swin_unet_image_fusion_tpu.infer import Fuser, save_image

    t0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter() - t0:7.1f}s] {m}", flush=True)

    kw = (
        dict(in_dims_list=(1, 8), out_dims_list=(8, 16), att_num_heads=2,
             att_dims_per_head_ratio=1 / 2)
        if args.tiny else {}
    )
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16", **kw))
    fuser = Fuser.from_checkpoint(cfg, args.ckpt)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    for ir_name, vis_name, out_name in PAIRS:
        ir_bgr = cv2.imread(f"{REF_DIR}/{ir_name}", cv2.IMREAD_COLOR)
        vis_bgr = cv2.imread(f"{REF_DIR}/{vis_name}", cv2.IMREAD_COLOR)
        ir = cv2.cvtColor(ir_bgr, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
        vis_ycrcb = (
            cv2.cvtColor(vis_bgr, cv2.COLOR_BGR2YCrCb).astype(np.float32) / 255.0
        )
        rgb = fuser.fuse_pair_ycrcb(ir[None, :, :, None], vis_ycrcb[None])[0]
        save_image(rgb, str(out_dir / f"{out_name}.jpg"))
        fused_y = cv2.cvtColor(
            (rgb * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
        ).astype(np.float32) / 255.0
        m = score_fusion(fused_y, ir, vis_ycrcb[..., 0])
        log(
            f"{out_name} ({ir_bgr.shape[0]}x{ir_bgr.shape[1]}): "
            + " ".join(f"{k}={v:.3f}" for k, v in m.items())
        )

    # side-by-side grid of the 512x640 fusions (the README-style artifact)
    tiles = []
    for _, _, out_name in PAIRS[:3]:
        img = cv2.imread(str(out_dir / f"{out_name}.jpg"))
        tiles.append(img)
    grid = np.concatenate(tiles, axis=1)
    cv2.imwrite(str(out_dir / "reference_fusion_grid.jpg"), grid)
    log(f"grid -> {out_dir / 'reference_fusion_grid.jpg'}")


if __name__ == "__main__":
    main()
