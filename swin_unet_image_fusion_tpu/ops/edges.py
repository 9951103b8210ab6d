"""Sobel edge magnitude (kornia.filters.Sobel parity) in pure jnp.

The reference's texture loss (``/root/reference/a008_loss.py:161-199``) runs
``kornia.filters.Sobel()`` over fusion/ir/vis and penalises
``mean | edge(fus) - max(edge(ir), edge(vis)) |``.

kornia's Sobel: replicate-pad by 1, depthwise conv with the *normalised* Sobel pair
(each kernel divided by its abs-sum, i.e. /8), magnitude ``sqrt(gx^2 + gy^2 + eps)``
with eps=1e-6. The kernel flip that kornia applies (true convolution vs
cross-correlation) only changes the sign of gx/gy and is irrelevant under the magnitude.

A Canny edge map is deliberately NOT implemented as a differentiable loss term: the
reference exposes ``CHOOSE_CANNY_ELSE_SOBEL`` but ships (and trains) with Sobel
(``A000_CONFIG.py:37``); kornia's Canny involves non-differentiable hysteresis. We raise
a clear error if it is requested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
SOBEL_Y = SOBEL_X.T


@functools.lru_cache(maxsize=8)
def _sobel_kernels(num_channels: int, normalized: bool) -> np.ndarray:
    """(3, 3, C, 2) depthwise HWIO kernel stack: per channel, [gx, gy]."""
    kx, ky = SOBEL_X, SOBEL_Y
    if normalized:
        kx = kx / np.abs(kx).sum()
        ky = ky / np.abs(ky).sum()
    k = np.stack([kx, ky], axis=-1)  # (3, 3, 2)
    return np.repeat(k[:, :, None, :], num_channels, axis=2).astype(np.float32)


def sobel_magnitude(
    x: jnp.ndarray, *, normalized: bool = True, eps: float = 1e-6
) -> jnp.ndarray:
    """Sobel edge magnitude of an NHWC image: sqrt(gx^2 + gy^2 + eps).

    Matches kornia.filters.Sobel(normalized=True, eps=1e-6) applied channelwise.
    """
    c = x.shape[-1]
    kernels = jnp.asarray(_sobel_kernels(c, normalized))
    xp = jnp.pad(x.astype(jnp.float32), [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    g = jax.lax.conv_general_dilated(
        xp,
        kernels,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )  # (B, H, W, C*2), grouped (c0gx, c0gy, c1gx, ...)
    b, h, w, _ = g.shape
    g = g.reshape(b, h, w, c, 2)
    return jnp.sqrt(jnp.sum(g * g, axis=-1) + eps)
