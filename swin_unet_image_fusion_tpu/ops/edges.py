"""Sobel edge magnitude (kornia.filters.Sobel parity) in pure jnp.

The reference's texture loss (``/root/reference/a008_loss.py:161-199``) runs
``kornia.filters.Sobel()`` over fusion/ir/vis and penalises
``mean | edge(fus) - max(edge(ir), edge(vis)) |``.

kornia's Sobel: replicate-pad by 1, depthwise conv with the *normalised* Sobel pair
(each kernel divided by its abs-sum, i.e. /8), magnitude ``sqrt(gx^2 + gy^2 + eps)``
with eps=1e-6. The kernel flip that kornia applies (true convolution vs
cross-correlation) only changes the sign of gx/gy and is irrelevant under the magnitude.

The Canny option (``CHOOSE_CANNY_ELSE_SOBEL``, ``A000_CONFIG.py:37``) is implemented
with kornia.filters.Canny semantics (gaussian blur -> sobel gradients -> 45-degree
non-maximum suppression -> double threshold -> one-step hysteresis). Note the edge map
is produced through comparisons, so it carries no useful gradient — which is equally
true of the reference's kornia path; the reference ships and trains with Sobel.
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


def _gaussian_blur(x: jnp.ndarray, kernel_size: int = 5, sigma: float = 1.0) -> jnp.ndarray:
    """Depthwise gaussian blur, reflect padding (kornia gaussian_blur2d semantics)."""
    from .ssim import gaussian_kernel_2d

    c = x.shape[-1]
    k = gaussian_kernel_2d(kernel_size, sigma)
    kernels = np.repeat(k[:, :, None, None], c, axis=2).astype(np.float32)
    pad = kernel_size // 2
    xp = jnp.pad(
        x.astype(jnp.float32), [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect"
    )
    return jax.lax.conv_general_dilated(
        xp,
        jnp.asarray(kernels),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def canny(
    x: jnp.ndarray,
    *,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    kernel_size: int = 5,
    sigma: float = 1.0,
    hysteresis: bool = True,
    eps: float = 1e-6,
) -> tuple:
    """Canny edges (kornia.filters.Canny parity): returns (magnitude, edges).

    x: (B, H, W, C) float [0, 1]. The edge map is binary {0, 1} — like kornia's, it is
    produced through comparisons and carries no gradient.
    """
    blurred = _gaussian_blur(x, kernel_size, sigma)

    c = blurred.shape[-1]
    kernels = jnp.asarray(_sobel_kernels(c, True))
    xp = jnp.pad(blurred, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    g = jax.lax.conv_general_dilated(
        xp, kernels, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    b, h, w, _ = g.shape
    g = g.reshape(b, h, w, c, 2)
    gx, gy = g[..., 0], g[..., 1]
    magnitude = jnp.sqrt(gx * gx + gy * gy + eps)  # (B, H, W, C)

    # quantise the gradient direction to 45-degree bins
    angle = jnp.arctan2(gy, gx)
    angle_deg = jnp.rad2deg(angle)
    bins = jnp.round(angle_deg / 45.0) * 45.0  # in {-180..180}

    # non-maximum suppression: compare against the two neighbours along the direction
    mp = jnp.pad(magnitude, [(0, 0), (1, 1), (1, 1), (0, 0)])

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(
            mp, (0, 1 + dy, 1 + dx, 0), magnitude.shape
        )

    # direction -> neighbour offsets (dy, dx)
    neighbours = {
        0.0: ((0, 1), (0, -1)),
        45.0: ((-1, 1), (1, -1)),
        90.0: ((-1, 0), (1, 0)),
        135.0: ((-1, -1), (1, 1)),
    }
    is_max = jnp.zeros_like(magnitude, dtype=bool)
    for base, ((dy1, dx1), (dy2, dx2)) in neighbours.items():
        sel = (
            (jnp.abs(bins) == base)
            | (jnp.abs(bins) == base + 180.0)
            | (bins == base - 180.0)
        )
        ge = (magnitude >= shifted(dy1, dx1)) & (magnitude >= shifted(dy2, dx2))
        is_max = jnp.where(sel, ge, is_max)
    nms = jnp.where(is_max, magnitude, 0.0)

    # double threshold
    strong = nms > high_threshold
    weak = (nms > low_threshold) & ~strong
    if hysteresis:
        # one dilation pass: weak pixels touching a strong pixel survive
        sp = jnp.pad(strong, [(0, 0), (1, 1), (1, 1), (0, 0)])
        any_strong = jnp.zeros_like(strong)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                any_strong = any_strong | jax.lax.dynamic_slice(
                    sp, (0, 1 + dy, 1 + dx, 0), strong.shape
                )
        edges = strong | (weak & any_strong)
    else:
        edges = strong
    return magnitude, edges.astype(x.dtype)
