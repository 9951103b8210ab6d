"""End-to-end output-parity report: JAX framework vs the PyTorch reference.

Instantiates the reference model (imported read-only from /root/reference, never
copied) with random golden weights, imports those weights into the JAX model, fuses the
same inputs through both, and reports max|diff|, SSIM and PSNR between the two outputs
— the BASELINE.md acceptance metric ("SSIM/PSNR within 0.1%").

Usage:
    python tools/parity_check.py [H W] [--image ir.png vis.png]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main():
    # golden parity runs against CPU torch; keep JAX on CPU too (exact + no TPU dep)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    hw = (256, 256)
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) >= 2:
        hw = (int(args[0]), int(args[1]))

    import jax.numpy as jnp
    import torch

    from reference_loader import reference_model, torch_state_numpy
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.metrics import psnr, ssim
    from swin_unet_image_fusion_tpu.models.torch_import import convert_torch_state_dict
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = ModelConfig()
    ref = reference_model(cfg, seed=0)
    ref.eval()

    rng = np.random.default_rng(0)
    ir = rng.random((1, 1, *hw), dtype=np.float32)
    vis = rng.random((1, 1, *hw), dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    params, batch_stats = convert_torch_state_dict(torch_state_numpy(ref), cfg)
    model = SwinFusionUNet(cfg)
    out = np.asarray(
        model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(ir.transpose(0, 2, 3, 1)),
            jnp.asarray(vis.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)

    diff = np.abs(out - ref_out)
    a = jnp.asarray(np.clip(out.transpose(0, 2, 3, 1), 0, 1))
    b = jnp.asarray(np.clip(ref_out.transpose(0, 2, 3, 1), 0, 1))
    print(f"resolution           : {hw[0]}x{hw[1]}")
    print(f"max abs diff         : {diff.max():.3e}")
    print(f"mean abs diff        : {diff.mean():.3e}")
    print(f"SSIM(jax, torch)     : {float(ssim(a, b)):.6f}  (1.0 = identical)")
    print(f"PSNR(jax, torch)     : {float(psnr(a, b)):.2f} dB")


if __name__ == "__main__":
    main()
