"""Sobel edge magnitude (kornia.filters.Sobel parity) in pure jnp.

The reference's texture loss (``/root/reference/a008_loss.py:161-199``) runs
``kornia.filters.Sobel()`` over fusion/ir/vis and penalises
``mean | edge(fus) - max(edge(ir), edge(vis)) |``.

kornia's Sobel: replicate-pad by 1, depthwise conv with the *normalised* Sobel pair
(each kernel divided by its abs-sum, i.e. /8), magnitude ``sqrt(gx^2 + gy^2 + eps)``
with eps=1e-6. The kernel flip that kornia applies (true convolution vs
cross-correlation) only changes the sign of gx/gy and is irrelevant under the magnitude.

The Canny option (``CHOOSE_CANNY_ELSE_SOBEL``, ``A000_CONFIG.py:37``) matches
kornia.filters.Canny exactly: gaussian blur -> unnormalised sobel gradients ->
45-degree non-maximum suppression (strict >) -> double threshold -> iterative
hysteresis to fixpoint. Note the edge map is produced through comparisons, so it
carries no useful gradient — which is equally true of the reference's kornia path;
the reference ships and trains with Sobel.
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


# kornia get_canny_nms_kernel direction order: E, SE, S, SW, W, NW, N, NE (y-down)
_NMS_OFFSETS = ((0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1))


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
    """Canny edges, kornia.filters.Canny parity: returns (nms magnitude, edges).

    x: (B, H, W, C) float [0, 1]; C=3 is converted to grayscale first (like kornia).
    Matches kornia exactly: gaussian blur -> **unnormalised** sobel gradients ->
    45-degree angle quantisation -> NMS with a strict > test against both
    along-direction neighbours (zero-padded difference convs) -> double threshold ->
    iterative hysteresis to fixpoint (weak pixels 8-adjacent to strong promote); the
    final edge map keeps only the strong set, binary. Like kornia's, the edge map is
    produced through comparisons and carries no gradient.
    """
    if x.shape[-1] == 3:  # kornia rgb_to_grayscale
        x = 0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
    if x.shape[-1] != 1:
        raise ValueError(f"canny expects 1 or 3 channels, got {x.shape[-1]}")

    blurred = _gaussian_blur(x, kernel_size, sigma)

    # kornia's canny uses UNNORMALISED gradients (spatial_gradient(normalized=False)):
    # the 0.1/0.2 thresholds are calibrated against raw sobel magnitudes
    kernels = jnp.asarray(_sobel_kernels(1, False))
    xp = jnp.pad(blurred, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    g = jax.lax.conv_general_dilated(
        xp, kernels, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=1,
    )  # (B, H, W, 2)
    gx, gy = g[..., 0:1], g[..., 1:2]
    magnitude = jnp.sqrt(gx * gx + gy * gy + eps)  # (B, H, W, 1)

    # quantise the gradient direction to 45-degree bins -> direction index 0..7
    angle = jnp.round(jnp.rad2deg(jnp.arctan2(gy, gx)) / 45.0)
    idx_pos = jnp.mod(angle, 8.0).astype(jnp.int32)
    idx_neg = jnp.mod(angle + 4.0, 8.0).astype(jnp.int32)

    # center-minus-neighbour differences for the 8 directions (zero padding, like
    # kornia's padded difference convs)
    mp = jnp.pad(magnitude, [(0, 0), (1, 1), (1, 1), (0, 0)])

    def shifted(dy, dx):
        return jax.lax.dynamic_slice(mp, (0, 1 + dy, 1 + dx, 0), magnitude.shape)

    diffs = jnp.concatenate(
        [magnitude - shifted(dy, dx) for dy, dx in _NMS_OFFSETS], axis=-1
    )  # (B, H, W, 8)
    sel_pos = jnp.take_along_axis(diffs, idx_pos, axis=-1)
    sel_neg = jnp.take_along_axis(diffs, idx_neg, axis=-1)
    is_max = jnp.minimum(sel_pos, sel_neg) > 0.0  # strictly greater than BOTH
    magnitude = magnitude * is_max

    # double threshold (strict >, on the NMS'd magnitude)
    low = magnitude > low_threshold
    high = magnitude > high_threshold
    if not hysteresis:
        # kornia returns the {0, 0.5, 1} map when hysteresis is off
        return magnitude, (low.astype(x.dtype) * 0.5 + high.astype(x.dtype) * 0.5)

    weak = low & ~high

    def dilate8(s):
        sp = jnp.pad(s, [(0, 0), (1, 1), (1, 1), (0, 0)])
        out = jnp.zeros_like(s)
        for dy, dx in _NMS_OFFSETS:
            out = out | jax.lax.dynamic_slice(sp, (0, 1 + dy, 1 + dx, 0), s.shape)
        return out

    # flood-fill to fixpoint: weak pixels 8-adjacent to strong become strong
    def body(carry):
        strong, _ = carry
        new = strong | (weak & dilate8(strong))
        return new, jnp.any(new != strong)

    strong, _ = jax.lax.while_loop(
        lambda c: c[1], body, (high, jnp.asarray(True))
    )
    return magnitude, strong.astype(x.dtype)
