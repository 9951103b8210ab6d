"""Window partition / cyclic shift / relative-position bias / shift mask.

TPU-native (NHWC, pure-jnp) equivalents of the reference's einops-on-NCHW window
machinery (``/root/reference/a001_WindowAttention.py``):

- window partition/unpartition: ``rearrange_1``/``rearrange_1_reverse``
  (a001_WindowAttention.py:154-172, 373-398) — here plain reshape/transpose in NHWC,
  which XLA lowers to free layout ops.
- cyclic shift: ``torch.roll`` by ``-window//2`` before partition, ``+window//2`` after
  (a001_WindowAttention.py:419-446) — here ``jnp.roll`` on the H/W axes.
- relative-position bias: a **2-D (2Wh-1, 2Ww-1) table shared across all heads** — a
  deliberate behavioural difference from canonical Swin (per-head flattened table) that we
  preserve for parity (a001_WindowAttention.py:72-82, 100-144). The gather indices depend
  only on the window size and are precomputed with numpy at trace time.
- shift mask: region-id grid partitioned into windows; score positions whose two points
  carry different region ids are **set** to -1e10 (not added — a001:310). The mask depends
  only on the padded (H, W) of the stage, which is a Python int under jit, so it is a
  trace-time numpy constant that XLA folds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

MASK_FILL_VALUE = -1e10  # reference a001_WindowAttention.py:310


def window_partition(x: jnp.ndarray, window_size: Tuple[int, int]) -> jnp.ndarray:
    """(..., B, H, W, C) -> (..., B * nH * nW, Wh * Ww, C).

    Equivalent to the reference's
    ``b c (nh wh) (nw ww) -> (b nh nw) (wh ww) c`` (a001_WindowAttention.py:154-172)
    but in NHWC. Leading batch-like axes beyond the canonical 4 are preserved.
    """
    *lead, b, h, w, c = x.shape
    wh, ww = window_size
    nh, nw = h // wh, w // ww
    x = x.reshape(*lead, b, nh, wh, nw, ww, c)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 1, 3, 2, 4, 5))
    x = x.transpose(perm)
    return x.reshape(*lead, b * nh * nw, wh * ww, c)


def window_unpartition(
    x: jnp.ndarray, window_size: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of :func:`window_partition` (reference a001_WindowAttention.py:373-398)."""
    *lead, bw, t, c = x.shape
    wh, ww = window_size
    h, w = hw
    nh, nw = h // wh, w // ww
    b = bw // (nh * nw)
    x = x.reshape(*lead, b, nh, nw, wh, ww, c)
    n = len(lead)
    perm = tuple(range(n)) + tuple(i + n for i in (0, 1, 3, 2, 4, 5))
    x = x.transpose(perm)
    return x.reshape(*lead, b, h, w, c)


def cyclic_shift(x: jnp.ndarray, window_size: Tuple[int, int], reverse: bool) -> jnp.ndarray:
    """Roll the spatial (H, W) axes by ±window//2 (reference a001:419-446).

    ``reverse=False`` is the "do" direction (shift by -win//2), ``reverse=True`` undoes it.
    x has layout (..., H, W, C): the spatial axes are -3 and -2.
    """
    sh, sw = window_size[0] // 2, window_size[1] // 2
    if not reverse:
        sh, sw = -sh, -sw
    return jnp.roll(x, shift=(sh, sw), axis=(-3, -2))


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """(2, T, T) int32 gather indices into the 2-D bias table.

    Reproduces a001_WindowAttention.py:100-125: for every pair of points in a window,
    the relative offset (dy, dx) shifted to be non-negative. T = Wh * Ww.
    """
    wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"), axis=0)
    coords = coords.reshape(2, -1)  # (2, T)
    rel = coords[:, None, :] - coords[:, :, None]  # (2, T, T)
    rel[0] += wh - 1
    rel[1] += ww - 1
    return rel.astype(np.int32)


def gather_relative_position_bias(
    table: jnp.ndarray, window_size: Tuple[int, int]
) -> jnp.ndarray:
    """Gather the (T, T) bias from the (2Wh-1, 2Ww-1) shared table (a001:127-144).

    ``table`` may carry leading stacked axes (e.g. the dual-stream axis); the gather is
    applied to the trailing two dims.
    """
    idx = relative_position_index(window_size)
    return table[..., idx[0], idx[1]]


@functools.lru_cache(maxsize=None)
def shift_attention_mask(
    hw: Tuple[int, int], window_size: Tuple[int, int]
) -> np.ndarray:
    """(nWindows, T, T) boolean mask for shifted-window attention.

    True where the two points of a score entry belong to different pre-shift regions and
    the score must be set to -1e10. Reproduces the 9-region slice construction of
    a001_WindowAttention.py:217-272 exactly. ``hw`` is the *padded* per-stage resolution
    (always divisible by the window size), a Python int at trace time.
    """
    h, w = hw
    wh, ww = window_size
    sh, sw = wh // 2, ww // 2

    region = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for slice_h in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for slice_w in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            region[slice_h, slice_w] = cnt
            cnt += 1

    nh, nw = h // wh, w // ww
    windows = (
        region.reshape(nh, wh, nw, ww).transpose(0, 2, 1, 3).reshape(nh * nw, wh * ww)
    )
    return windows[:, :, None] != windows[:, None, :]  # (nWin, T, T)


def apply_shift_mask(scores: jnp.ndarray, mask: np.ndarray) -> jnp.ndarray:
    """Set masked score entries to -1e10 (a001_WindowAttention.py:274-315).

    scores: (..., B * nWin, heads, T, T); mask: (nWin, T, T) bool.
    NOTE: the reference *sets* the value rather than adding the mask — preserved.
    """
    *lead, bw, heads, t, _ = scores.shape
    n_win = mask.shape[0]
    b = bw // n_win
    scores = scores.reshape(*lead, b, n_win, heads, t, t)
    m = jnp.asarray(mask)[:, None, :, :]  # (nWin, 1, T, T) broadcasts over b / heads
    scores = jnp.where(m, jnp.asarray(MASK_FILL_VALUE, scores.dtype), scores)
    return scores.reshape(*lead, bw, heads, t, t)
