"""Evaluate fused outputs against their IR/VIS sources with the standard metrics.

Usage:
    # score an output folder produced by infer.run_test against the input folder
    python tools/evaluate.py <input_folder> <output_folder>

    # or fuse + score in one go with a checkpoint
    python tools/evaluate.py <input_folder> --checkpoint <ckpt>

<input_folder> must contain ir/ and vis/ subfolders (reference layout,
a015_dataset.py:38-50). Prints a per-image metric table and the means.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import cv2

    if "--checkpoint" not in sys.argv or "--cpu" in sys.argv:
        # pure scoring needs no accelerator (and --cpu fuses on host too, which
        # keeps scoring off the TPU tunnel while a training run owns it)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from swin_unet_image_fusion_tpu.config import Config
    from swin_unet_image_fusion_tpu.data.dataset import collect_pair_paths
    from swin_unet_image_fusion_tpu.eval_metrics import score_fusion

    args = sys.argv[1:]
    input_folder = args[0]
    checkpoint = None
    output_folder = None
    if "--cpu" in args:
        args.remove("--cpu")
    if "--checkpoint" in args:
        checkpoint = args[args.index("--checkpoint") + 1]
    elif len(args) > 1:
        output_folder = args[1]

    ir_paths, vis_paths = collect_pair_paths(input_folder)
    if not ir_paths:
        raise SystemExit(f"no ir/vis pairs under {input_folder}")

    fuser = None
    if checkpoint:
        from swin_unet_image_fusion_tpu.infer import Fuser

        fuser = Fuser.from_checkpoint(Config(), checkpoint)

    rows = []
    for ir_path, vis_path in zip(ir_paths, vis_paths):
        name = os.path.splitext(os.path.basename(ir_path))[0]
        ir = cv2.imread(ir_path, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        vis_bgr = cv2.imread(vis_path, cv2.IMREAD_COLOR)
        vis_y = (
            cv2.cvtColor(vis_bgr, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float32) / 255.0
        )

        if fuser is not None:
            fused = fuser.fuse_y(ir[None, :, :, None], vis_y[None, :, :, None])[0, :, :, 0]
        else:
            candidates = [
                p for p in os.listdir(output_folder) if p.startswith(name)
            ]
            if not candidates:
                print(f"skip {name}: no output found")
                continue
            out_img = cv2.imread(os.path.join(output_folder, candidates[0]))
            fused = (
                cv2.cvtColor(out_img, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float32) / 255.0
            )

        scores = score_fusion(fused, ir, vis_y)
        rows.append((name, scores))

    keys = list(rows[0][1].keys())
    header = "image".ljust(16) + "".join(k.rjust(10) for k in keys)
    print(header)
    print("-" * len(header))
    for name, scores in rows:
        print(name[:15].ljust(16) + "".join(f"{scores[k]:10.4f}" for k in keys))
    print("-" * len(header))
    means = {k: float(np.mean([s[k] for _, s in rows])) for k in keys}
    print("mean".ljust(16) + "".join(f"{means[k]:10.4f}" for k in keys))


if __name__ == "__main__":
    main()
