"""Space-to-depth patch merging and depth-to-space "anti patch merging" (NHWC).

TPU-native equivalent of the reference's einops merge/unmerge
(``/root/reference/a011_PatchOperation.py:72-145``). Both directions are pure
reshape/transpose, which XLA lowers to layout changes fused into the adjacent 1x1
matmul — the depth-to-space decoder path is the reference README's checkerboard-free
upsampler ("anti patch merging"), never a transposed convolution.

Channel ordering parity: the reference flattens merged pixels as ``(ph pw c)`` — patch
offsets outermost, channels innermost (a011_PatchOperation.py:87-94,110-117). We keep the
identical ordering so torch 1x1-conv weights import as a plain transpose.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, merging_size: Tuple[int, int]) -> jnp.ndarray:
    """(..., B, H, W, C) -> (..., B, H/ph, W/pw, ph*pw*C), channel order (ph pw c)."""
    ph, pw = merging_size
    if (ph, pw) == (1, 1):
        return x
    *lead, b, h, w, c = x.shape
    nh, nw = h // ph, w // pw
    x = x.reshape(*lead, b, nh, ph, nw, pw, c)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 1, 3, 2, 4, 5))
    x = x.transpose(perm)  # (..., b, nh, nw, ph, pw, c)
    return x.reshape(*lead, b, nh, nw, ph * pw * c)


def depth_to_space(x: jnp.ndarray, merging_size: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` — the "anti patch merging" upsample.

    (..., B, nh, nw, ph*pw*C) -> (..., B, nh*ph, nw*pw, C), reading channels as (ph pw c)
    (reference a011_PatchOperation.py:96-117).
    """
    ph, pw = merging_size
    if (ph, pw) == (1, 1):
        return x
    *lead, b, nh, nw, cc = x.shape
    c = cc // (ph * pw)
    x = x.reshape(*lead, b, nh, nw, ph, pw, c)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 1, 3, 2, 4, 5))
    x = x.transpose(perm)  # (..., b, nh, ph, nw, pw, c)
    return x.reshape(*lead, b, nh * ph, nw * pw, c)


def space_to_depth_cmajor(x: jnp.ndarray, merging_size: Tuple[int, int]) -> jnp.ndarray:
    """C-major merge: (..., B, C, H, W) -> (..., B, ph*pw*C, H/ph, W/pw).

    Channel order is (ph pw c) — identical to :func:`space_to_depth`, so the same
    stacked 1x1 weights apply in either layout. C-major keeps the big spatial dims on
    the (8, 128) HBM tile (zero lane padding at the small-C early stages).
    """
    ph, pw = merging_size
    if (ph, pw) == (1, 1):
        return x
    *lead, b, c, h, w = x.shape
    nh, nw = h // ph, w // pw
    x = x.reshape(*lead, b, c, nh, ph, nw, pw)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 3, 5, 1, 2, 4))
    x = x.transpose(perm)  # (..., b, ph, pw, c, nh, nw)
    return x.reshape(*lead, b, ph * pw * c, nh, nw)


def depth_to_space_cmajor(x: jnp.ndarray, merging_size: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_cmajor`: (..., B, ph*pw*C, nh, nw) ->
    (..., B, C, nh*ph, nw*pw), reading channels as (ph pw c)."""
    ph, pw = merging_size
    if (ph, pw) == (1, 1):
        return x
    *lead, b, cc, nh, nw = x.shape
    c = cc // (ph * pw)
    x = x.reshape(*lead, b, ph, pw, c, nh, nw)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 3, 4, 1, 5, 2))
    x = x.transpose(perm)  # (..., b, c, nh, ph, nw, pw)
    return x.reshape(*lead, b, c, nh * ph, nw * pw)


def pad_reflect_bottom_right(x: jnp.ndarray, pad_hw: Tuple[int, int]) -> jnp.ndarray:
    """Reflect-pad bottom/right of the spatial axes (reference a006:111-131).

    x layout (..., H, W, C): spatial axes are -3 / -2. No-op when pad is (0, 0).
    """
    ph, pw = pad_hw
    if ph == 0 and pw == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, widths, mode="reflect")


def crop_bottom_right(x: jnp.ndarray, pad_hw: Tuple[int, int]) -> jnp.ndarray:
    """Undo :func:`pad_reflect_bottom_right` (reference a006:133-146)."""
    ph, pw = pad_hw
    if ph == 0 and pw == 0:
        return x
    h, w = x.shape[-3], x.shape[-2]
    return x[..., : h - ph, : w - pw, :]


def pad_reflect_bottom_right_cmajor(x: jnp.ndarray, pad_hw: Tuple[int, int]) -> jnp.ndarray:
    """Reflect-pad bottom/right for C-major (..., C, H, W) layouts (spatial axes -2/-1).

    Padding acts on H/W only, so the result is layout-independent (matches the NHWC
    :func:`pad_reflect_bottom_right` exactly)."""
    ph, pw = pad_hw
    if ph == 0 and pw == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, widths, mode="reflect")


def crop_bottom_right_cmajor(x: jnp.ndarray, pad_hw: Tuple[int, int]) -> jnp.ndarray:
    """Undo :func:`pad_reflect_bottom_right_cmajor`."""
    ph, pw = pad_hw
    if ph == 0 and pw == 0:
        return x
    h, w = x.shape[-2], x.shape[-1]
    return x[..., : h - ph, : w - pw]
