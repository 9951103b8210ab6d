"""Image-quality metrics for evaluation (SSIM / MS-SSIM index / PSNR).

These are the *evaluation* metrics used to verify output parity with the PyTorch
reference (BASELINE.md: "SSIM/PSNR within 0.1%") and to score fusion quality; the
training losses live in ``losses.py`` / ``ops/ssim.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .ops.ssim import gaussian_kernel_2d, psnr, ssim_index  # re-exported

DEFAULT_MSSSIM_WEIGHTS: Tuple[float, ...] = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM index over the batch (Wang et al. 2004, Gaussian 11x11 sigma 1.5)."""
    return ssim_index(img1, img2, max_val=max_val).mean()


def ms_ssim_index(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    max_val: float = 1.0,
    weights: Tuple[float, ...] = DEFAULT_MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Classic Wang et al. multi-scale SSIM *index* (power-weighted product over
    5 dyadic scales with 2x avg-pool between scales). This is the standard evaluation
    MS-SSIM — distinct from the Zhao-style MS-SSIM+L1 *training* loss in ops/ssim.py.
    """
    import jax

    from .ops.ssim import _depthwise_conv_nhwc, _ssim_kernel

    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    k = (0.01, 0.03)
    c1 = (k[0] * max_val) ** 2
    c2 = (k[1] * max_val) ** 2
    mcs = []
    levels = len(weights)
    for level in range(levels):
        kernel = jnp.asarray(_ssim_kernel(x.shape[-1], 11, 1.5))
        mux = _depthwise_conv_nhwc(x, kernel, "VALID")
        muy = _depthwise_conv_nhwc(y, kernel, "VALID")
        sigmax2 = _depthwise_conv_nhwc(x * x, kernel, "VALID") - mux * mux
        sigmay2 = _depthwise_conv_nhwc(y * y, kernel, "VALID") - muy * muy
        sigmaxy = _depthwise_conv_nhwc(x * y, kernel, "VALID") - mux * muy
        cs_map = (2 * sigmaxy + c2) / (sigmax2 + sigmay2 + c2)
        if level < levels - 1:
            mcs.append(jnp.maximum(cs_map.mean(), 0.0))
            pool = lambda a: jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            x, y = pool(x), pool(y)
        else:
            l_map = (2 * mux * muy + c1) / (mux * mux + muy * muy + c1)
            mcs.append(jnp.maximum((l_map * cs_map).mean(), 0.0))
    out = jnp.asarray(1.0, jnp.float32)
    for w, v in zip(weights, mcs):
        out = out * v**w
    return out


__all__ = ["ssim", "ssim_index", "ms_ssim_index", "psnr", "gaussian_kernel_2d"]
