"""bfloat16 production path fidelity vs the fp32 parity path.

The headline bench runs compute_dtype=bfloat16; this guards that the fast path stays
visually identical (SSIM/PSNR) to fp32 on the same weights, so the BASELINE "SSIM/PSNR
within 0.1%" criterion is meaningful for the bf16 numbers too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.metrics import psnr, ssim
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

TINY = ModelConfig(
    in_dims_list=(1, 8, 16),
    out_dims_list=(8, 16, 32),
    att_num_heads=4,
    att_dims_per_head_ratio=1 / 4,
)


@pytest.mark.slow
def test_bf16_output_close_to_fp32(rng):
    ir = jnp.asarray(rng.random((1, 96, 96, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((1, 96, 96, 1), dtype=np.float32))

    f32_model = SwinFusionUNet(TINY)
    variables = f32_model.init(jax.random.PRNGKey(0), ir, vis)
    out32 = jnp.clip(f32_model.apply(variables, ir, vis), 0, 1)

    bf16_model = SwinFusionUNet(
        ModelConfig(**{**TINY.__dict__, "compute_dtype": "bfloat16"})
    )
    out16 = jnp.clip(bf16_model.apply(variables, ir, vis), 0, 1)

    s = float(ssim(out32, out16))
    p = float(psnr(out32, out16))
    assert s > 0.98, f"bf16 SSIM vs fp32 too low: {s}"
    assert p > 30, f"bf16 PSNR vs fp32 too low: {p}"
