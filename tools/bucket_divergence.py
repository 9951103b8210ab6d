"""Bucket-vs-exact serving divergence at realistic sizes.

``Fuser(bucket=64)`` reflect-pads inputs to the next 64-multiple and crops the
output, bounding compilations for heterogeneous datasets — but reflect padding
changes the pad context at the crop border, so bucketed outputs are not
bit-identical to exact-shape mode near the bottom/right edges
(infer.py:31-37). This measures how large that divergence actually is at
realistic serving sizes (round-4 VERDICT Weak #6): SSIM / PSNR / max-abs
between the bucketed and the exact output on synthetic content, plus the
width of the affected border.

Usage (TPU; compiles 2 bucket + 3 exact programs on first run):
    python tools/bucket_divergence.py [--sizes 480x640,450x620,768x1024] [--cpu --tiny]
Reference serving surface: a017_test.py:56-90; reflect-pad parity context:
a006_PaddingOperation.py:111-146.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="480x640,450x620,768x1024")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import Config, ModelConfig
    from swin_unet_image_fusion_tpu.infer import Fuser
    from swin_unet_image_fusion_tpu.metrics import psnr, ssim
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    t0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter() - t0:7.1f}s] {m}", flush=True)

    kw = (
        dict(in_dims_list=(1, 8), out_dims_list=(8, 16), att_num_heads=2,
             att_dims_per_head_ratio=1 / 2)
        if args.tiny else {}
    )
    cfg = Config(model=ModelConfig(compute_dtype="bfloat16", **kw))
    init_model = SwinFusionUNet(ModelConfig(**kw))
    rng = np.random.default_rng(0)
    probe = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), probe, probe)
    params, bstats = variables["params"], variables.get("batch_stats", {})

    exact = Fuser(cfg, params, bstats, bucket=0)
    bucketed = Fuser(cfg, params, bstats, bucket=64)

    # smooth-ish synthetic content (pure noise understates edge divergence less
    # than real images would, smooth gradients overstate it; use a mix)
    for size in args.sizes.split(","):
        h, w = (int(x) for x in size.split("x"))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = 0.5 + 0.3 * np.sin(yy / 37.0) * np.cos(xx / 53.0)
        ir = np.clip(base + 0.2 * rng.random((h, w)), 0, 1).astype(np.float32)[None, :, :, None]
        vis = np.clip(1 - base + 0.2 * rng.random((h, w)), 0, 1).astype(np.float32)[None, :, :, None]
        oe = exact.fuse_y(ir, vis)
        ob = bucketed.fuse_y(ir, vis)
        d = np.abs(oe - ob)[0, :, :, 0]
        s = float(ssim(ob, oe))
        p = float(psnr(ob, oe))
        # affected border: rows/cols from the bottom/right where any |diff|>1e-4
        rows = np.where(d.max(axis=1) > 1e-4)[0]
        cols = np.where(d.max(axis=0) > 1e-4)[0]
        b_rows = h - rows.min() if rows.size else 0
        b_cols = w - cols.min() if cols.size else 0
        log(
            f"{h}x{w} (bucket {(-(-h // 64)) * 64}x{(-(-w // 64)) * 64}): "
            f"SSIM={s:.6f} PSNR={p:.1f}dB max|d|={d.max():.2e} "
            f"border<=({b_rows} rows, {b_cols} cols)"
        )


if __name__ == "__main__":
    main()
