"""Inference driver: arbitrary-resolution fusion with YCrCb colour reconstruction.

Feature-parity re-design of the reference test driver (``/root/reference/a017_test.py``):
batch-1 fusion of arbitrary-size pairs, the visible image's Y channel goes through the
model with the IR image, the output Y is clamped to [0,1], re-attached to the original
Cr/Cb and converted YCrCb->RGB on the host (a017:56-90). Output files keep the
reference's ``{orig}_MKX_SELF.jpg`` naming by default (a017:112).

TPU specifics: the forward is jitted per input resolution (XLA caches one executable
per (H, W) — the analogue of the reference's eval-mode per-call shape recompute), with
an optional resolution bucketing mode that pads inputs up to coarser buckets to bound
the number of compilations for heterogeneous datasets. NOTE: bucketing changes reflect-
pad context at the crop boundary, so parity mode (default) keeps exact shapes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.dataset import FusionPairDataset
from .models.unet import SwinFusionUNet
from .utils.term import green


class Fuser:
    """Jitted fusion engine; one compiled executable per input resolution.

    ``bucket=N`` pads inputs (reflect, bottom/right) up to multiples of N and crops the
    output, bounding the number of distinct compilations for heterogeneous datasets.
    NOTE: bucketing changes the reflect-pad context at the crop border, so outputs are
    not bit-identical to exact-shape mode there; bucket=0 (default) is parity mode.
    """

    def __init__(
        self,
        cfg: Config,
        params,
        batch_stats,
        bucket: int = 0,
        deep_jnp_max_tokens: Optional[int] = None,
    ):
        """``deep_jnp_max_tokens`` overrides ``cfg.model.attention_jnp_max_tokens``
        for this serving engine: at bs=1 latency is op-count-bound (half the wall
        is inter-op overhead, docs/BENCHMARKS.md round-5 serving anatomy), and
        routing tiny deep maps to the jnp composition cuts ops — 256 measured
        best on one v5e chip (256²: 5.98 → 5.75 ms/pair; 480×640: 15.41 → 15.13;
        1024 regresses). Opt-in (None = config parity) so precompiled caches and
        batch-throughput parity stay untouched."""
        self.cfg = cfg
        self.bucket = bucket
        model_cfg = cfg.model
        if deep_jnp_max_tokens is not None:
            from dataclasses import replace

            model_cfg = replace(
                model_cfg, attention_jnp_max_tokens=deep_jnp_max_tokens
            )
        self.model = SwinFusionUNet(model_cfg)
        self.variables = {"params": params, "batch_stats": batch_stats}
        self._forward = jax.jit(
            lambda variables, ir, vis: jnp.clip(
                self.model.apply(variables, ir, vis, train=False), 0.0, 1.0
            )
        )

    @classmethod
    def from_checkpoint(cls, cfg: Config, path: str) -> "Fuser":
        if path.endswith(".pth"):
            from .models.torch_import import load_torch_checkpoint

            params, batch_stats, _ = load_torch_checkpoint(path, cfg.model)
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(os.path.abspath(path))
            params = restored["params"]
            batch_stats = restored["batch_stats"]
        return cls(cfg, params, batch_stats)

    def fuse_y(self, ir: np.ndarray, vis_y: np.ndarray) -> np.ndarray:
        """Fuse NHWC float [0,1] arrays; returns clamped fused Y (B, H, W, 1)."""
        h, w = ir.shape[1], ir.shape[2]
        if self.bucket:
            from .ops.shape_plan import pad_amount

            ph, pw = pad_amount(h, self.bucket), pad_amount(w, self.bucket)
            if ph or pw:
                widths = [(0, 0), (0, ph), (0, pw), (0, 0)]
                ir = np.pad(ir, widths, mode="reflect")
                vis_y = np.pad(vis_y, widths, mode="reflect")
        out = self._forward(self.variables, jnp.asarray(ir), jnp.asarray(vis_y))
        return np.asarray(out)[:, :h, :w, :]

    def fuse_pair_ycrcb(self, ir: np.ndarray, vis_ycrcb: np.ndarray) -> np.ndarray:
        """Full colour path: fuse Y, reattach Cr/Cb, convert to RGB (a017:65-88)."""
        import cv2

        vis_y = vis_ycrcb[..., 0:1]
        cr_cb = vis_ycrcb[..., 1:3]
        fus_y = self.fuse_y(ir, vis_y)
        fused = np.concatenate([fus_y, cr_cb], axis=-1)  # (B, H, W, 3) YCrCb
        rgb = np.stack(
            [cv2.cvtColor(img, cv2.COLOR_YCrCb2RGB) for img in fused], axis=0
        )
        return np.clip(rgb, 0.0, 1.0)


def save_image(rgb: np.ndarray, path: str) -> None:
    """Save an HWC float [0,1] RGB image (torchvision save_image equivalent)."""
    import cv2

    arr = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
    cv2.imwrite(path, cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))


def run_test(cfg: Optional[Config] = None, name_suffix: str = "MKX_SELF"):
    """Batch-1 fusion over the test folder (reference ``start_test``, a017:118-121)."""
    from .config import config_from_cli

    cfg = cfg or config_from_cli()
    fuser = Fuser.from_checkpoint(cfg, cfg.log.using_state_path)
    dataset = FusionPairDataset(
        is_test=True, dataset_folder=cfg.data.test_dataset_folder, cfg=cfg.data
    )
    os.makedirs(cfg.data.test_result_folder, exist_ok=True)
    for i in range(len(dataset)):
        item = dataset[i]
        ir = item["ir"][None]  # (1, H, W, 1)
        vis = item["vis"][None]  # (1, H, W, 3) YCrCb
        rgb = fuser.fuse_pair_ycrcb(ir, vis)[0]
        orig = os.path.splitext(os.path.basename(item["ir_path"]))[0]
        out_path = os.path.join(
            cfg.data.test_result_folder, f"{orig}_{name_suffix}.jpg"
        )
        save_image(rgb, out_path)
        print(green(f"Result of {orig} saved to {out_path}"))


if __name__ == "__main__":
    run_test()
