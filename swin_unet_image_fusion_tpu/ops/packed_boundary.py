"""Patch merge / anti-merge directly on packed window strips.

The C-major trunk's stage boundaries (reference ``a011_PatchOperation.py`` merge /
anti-merge wrapped in ``a006_PaddingOperation.py`` reflect pads) classically run as
``unpack -> pad -> space-to-depth -> [dense] -> pad -> pack`` chains between the
packed quartets — genuine (H, W) <-> token-lane transposes that XLA moves at copy
speed (~17% of the 512^2 inference profile, docs/BENCHMARKS.md session 7).

This module re-expresses both directions as fixed linear maps from source strips to
target strips, in the style of :func:`pallas_pack.repartition_packed`:

- **merge** (encoder, map (H, W) -> (H/2, W/2), channels C -> 4C): each target
  strip (r, p) reads the 2x2 source-strip neighbourhood (2r+a, 2p+b) through
  per-(q, a, b) one-hot lane selectors, where q = (di, dj) is the space-to-depth
  quadrant. Runs as ONE strided ``lax.conv_general_dilated`` over 3 spatial dims
  (row, pair, channel) with the four quadrants as q-major output LANE blocks
  (128 -> 512 channels) — only the four useful (a, b) taps are computed, and the
  consumer dense contracts the q blocks via free 128-aligned lane slices with
  unpermuted reference-order weight rows. The one-hot-per-column selectors keep
  the composition bit-exact on real pixels, like the repartition conv.
- **unmerge** (decoder, map (H, W) -> (2H, 2W), channels 4C -> C): each target
  strip (r, p) reads exactly ONE source strip (r//2, p//2); the (r%2, p%2) parity
  selects the lane matrix. Runs as one conv with ``lhs_dilation=(2, 2)`` on
  (row, pair) — transposed-conv style — and ``rhs_dilation=C`` on the channel
  axis contracting the four q blocks of the (q-major) 4C channels.

Geometry notes (see the call sites in models/unet.py):

- Boundaries always operate on NORMAL-geometry strips (quartets are entered and
  left in normal packing), where wrap/pad shifted-window modes coincide.
- Decoder boundaries are exact with no edge handling: the undo-crops only ever
  *drop* data (dropped tokens simply become masked pad lanes of the target
  geometry), and every real target token reads a real source token.
- Encoder boundaries are exact in the interior; target tokens whose classic
  computation involves reflect-padding (the bottom/right pad-to-merge-multiple
  rows read back into the image, and the pad-to-window-multiple rows are
  reflected *merged* rows) or even-rounding dummy source strips are recomputed
  by the classic chain on small bottom/right slabs and patched in
  (:func:`merge_packed`'s ``fix_rows``/``fix_cols``).

Reference behaviour covered: a011_PatchOperation.py:72-145 ((ph pw c) channel
order), a006_PaddingOperation.py:54-56,111-131 (bottom/right reflect pads).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_pack import (
    LANES,
    TOK,
    pack_windows_cmajor,
    shift_pad_geometry,
    unpack_windows_cmajor,
)
from .patch import (
    pad_reflect_bottom_right_cmajor,
    space_to_depth_cmajor,
)


def _lane(slot: int, i: int, j: int, ww: int) -> int:
    return slot * TOK + i * ww + j


@functools.lru_cache(maxsize=None)
def _merge_selectors(window: Tuple[int, int]) -> np.ndarray:
    """(2, 2, 4, LANES, LANES) one-hot selectors K[a, b, q][l_src, l_dst]:

    target window token (slot_t, i_t, j_t) of strip (r, p), space-to-depth quadrant
    q = 2*di + dj, reads source pixel (2*h_t + di, 2*w_t + dj) which lives in source
    strip (2r + a, 2p + b) at lane l_src.
    """
    wh, ww = window
    k = np.zeros((2, 2, 4, LANES, LANES), np.float32)
    for slot_t in (0, 1):
        for i_t in range(wh):
            for j_t in range(ww):
                l_t = _lane(slot_t, i_t, j_t, ww)
                for di in (0, 1):
                    for dj in (0, 1):
                        q = 2 * di + dj
                        hh = 2 * i_t + di  # in-strip source row offset
                        a, i_s = divmod(hh, wh)
                        woff = 2 * ww * slot_t + 2 * j_t + dj  # within 2-pair span
                        b, rem = divmod(woff, 2 * ww)
                        slot_s, j_s = divmod(rem, ww)
                        k[a, b, q, _lane(slot_s, i_s, j_s, ww), l_t] = 1.0
    return k


@functools.lru_cache(maxsize=None)
def _unmerge_selectors(window: Tuple[int, int]) -> np.ndarray:
    """(2, 2, 4, LANES, LANES) one-hot selectors K[ar, ap, q][l_src, l_dst]:

    target strip (r, p) = (2u + ar, 2v + ap) token (slot_t, i_t, j_t) at channel
    block q reads source strip (u, v) lane l_src — exactly one (q, l_src) is hot
    per target lane; summing the four q taps (each masked by its one-hot columns)
    reproduces the depth-to-space gather.
    """
    wh, ww = window
    k = np.zeros((2, 2, 4, LANES, LANES), np.float32)
    for ar in (0, 1):
        for ap in (0, 1):
            for slot_t in (0, 1):
                for i_t in range(wh):
                    for j_t in range(ww):
                        l_t = _lane(slot_t, i_t, j_t, ww)
                        h_t = wh * ar + i_t  # within the 2-strip-row span of u
                        w_t = 2 * ww * ap + ww * slot_t + j_t  # within v's 2-pair span
                        q = 2 * (h_t % 2) + (w_t % 2)
                        i_s = h_t // 2
                        slot_s, j_s = divmod(w_t // 2, ww)
                        k[ar, ap, q, _lane(slot_s, i_s, j_s, ww), l_t] = 1.0
    return k


def _normal_geometry(hw: Tuple[int, int], window: Tuple[int, int]) -> Tuple[int, int]:
    """(n_strip_rows, n_pair_cols) of the normal packing over map ``hw``."""
    *_, nh, nw = shift_pad_geometry(hw, window, False)
    return nh, nw // 2


def merge_selector_conv(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw_src: Tuple[int, int],
    hw_dst: Tuple[int, int],
) -> jnp.ndarray:
    """Space-to-depth on packed strips: (S, B, Rs, Ps, C, 128) normal strips over
    ``hw_src`` -> (S, B, Rt, Pt, C, 4*128) normal strips over ``hw_dst`` (= the
    merged map incl. its pad-to-window-multiple extension). The four space-to-depth
    quadrants live in q-major LANE blocks (position q*128 + lane), so the consumer
    dense contracts them with free 128-aligned lane slices and the reference-order
    (q-major) weight rows apply without permutation — and the conv computes only
    the four useful (a, b) taps (no dilation holes).

    Interior-exact; target tokens whose classic value involves reflect padding or
    out-of-grid source strips hold garbage here (see :func:`merge_packed`).
    """
    s, b, rs, ps, c, _ = xp.shape
    rt, pt = _normal_geometry(hw_dst, window)
    k = _merge_selectors(window)  # (a, b, q, l, m)
    kern = np.transpose(k, (0, 1, 3, 2, 4)).reshape(2, 2, 1, LANES, 4 * LANES)
    xm = xp.reshape(s * b, rs, ps, c, LANES)
    out = jax.lax.conv_general_dilated(
        xm,
        jnp.asarray(kern, xp.dtype),
        window_strides=(2, 2, 1),
        padding=((0, 2 * rt - rs), (0, 2 * pt - ps), (0, 0)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=xp.dtype,
    )
    return out.reshape(s, b, rt, pt, c, 4 * LANES)


def unmerge_selector_conv(
    xp4: jnp.ndarray,
    window: Tuple[int, int],
    hw_dst: Tuple[int, int],
) -> jnp.ndarray:
    """Depth-to-space on packed strips: (S, B, Rs, Ps, 4C, 128) normal strips
    (channels q-major: q*C + c — the reference ``(ph pw c)`` dense output order)
    over the merged map -> (S, B, Rt, Pt, C, 128) normal strips over ``hw_dst``
    (the upsampled-then-cropped map). Exact on every real target token."""
    s, b, rs, ps, cc, _ = xp4.shape
    c = cc // 4
    rt, pt = _normal_geometry(hw_dst, window)
    k = _unmerge_selectors(window)  # (ar, ap, q, l, m)
    # lhs_dilation 2 on (row, pair) with pad lo=1: output parity (ar, ap) selects
    # kernel tap (kr, kp) = (1 - ar, 1 - ap); all four kq = q channel taps (at
    # rhs_dilation C) contribute, each masked by its one-hot selector columns.
    kern = np.flip(k, axis=(0, 1))  # K[kr, kp, kq] = sel[ar=1-kr, ap=1-kp, q=kq]
    xm = xp4.reshape(s * b, rs, ps, cc, LANES)
    out = jax.lax.conv_general_dilated(
        xm,
        jnp.asarray(kern, xp4.dtype),
        window_strides=(1, 1, 1),
        padding=((1, rt - 2 * rs + 1), (1, pt - 2 * ps + 1), (0, 0)),
        lhs_dilation=(2, 2, 1),
        rhs_dilation=(1, 1, c),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=xp4.dtype,
    )
    return out.reshape(s, b, rt, pt, c, LANES)


def merge_packed(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw_src: Tuple[int, int],
    pad_merge: Tuple[int, int],
    pad_win: Tuple[int, int],
) -> jnp.ndarray:
    """Full encoder boundary on packed strips, bit-equal on real tokens to

        pack(pad_reflect(s2d(pad_reflect(unpack(xp, hw_src), pad_merge)), pad_win))

    with the four space-to-depth quadrants in q-major LANE blocks — channel
    position (c, q*128 + lane) — see :func:`merge_selector_conv`.

    Interior via :func:`merge_selector_conv`; bottom rows / right pair-columns
    whose classic values involve the reflect pads or dummy source strips are
    recomputed via the classic chain on small slabs and patched in.
    """
    s, b, rs, ps, c, _ = xp.shape
    wh, ww = window
    hs, ws = hw_src
    hp = hs + pad_merge[0]
    wp = ws + pad_merge[1]
    mh, mw = hp // 2, wp // 2  # merged map
    hw_dst = (mh + pad_win[0], mw + pad_win[1])
    out = merge_selector_conv(xp, window, hw_src, hw_dst)
    rt, pt = out.shape[2], out.shape[3]

    # --- classic-slab fixups -------------------------------------------------
    # A target token (h_t, w_t) is selector-exact iff it is not a pad_win reflect
    # copy (h_t < mh, w_t < mw) and its q=(1, .) source pixels are in-image
    # (2*h_t + 1 <= hs - 1; with pad_merge the row hs itself is a reflect copy).
    # First selector-wrong *real* target row/col (targets at or beyond hw_dst are
    # even-rounding dummies — garbage is fine there, like everywhere else):
    def first_bad(src_len: int, merged_len: int, pm: int, pw: int, real_len: int):
        bad = (src_len - 2) // 2 + 1 if pm == 0 else (src_len - 1) // 2
        if pw:
            bad = min(bad, merged_len)
        return bad if bad < real_len else None

    h_bad = first_bad(hs, mh, pad_merge[0], pad_win[0], hw_dst[0])
    w_bad = first_bad(ws, mw, pad_merge[1], pad_win[1], hw_dst[1])
    r_fix = rt if h_bad is None else h_bad // wh
    p_fix = pt if w_bad is None else w_bad // (2 * ww)

    def classic_slab(r0: int, p0: int, p_end: int) -> jnp.ndarray:
        """Classic chain on the source slab (strip rows >= 2*r0, pair cols
        [2*p0, 2*p_end)) -> target strips rows >= r0, pair cols [p0, p_end) in the
        selector-conv layout (C sublanes, q-major lane blocks).

        r0 is even and the slab keeps >= 1 strip row / pair column of left/top
        context, so every reflect read (reach < 8 pixels) lands inside the slab
        and the slab's even-rounded strip counts line up with the full target's.
        When p_end < pt the slab's own right-reflect columns are wrong — callers
        only use pair columns whose classic value does not touch the right edge.
        """
        sl = xp[:, :, 2 * r0 :, 2 * p0 : 2 * p_end]
        h_off, w_off = 2 * r0 * wh, 2 * p0 * 2 * ww
        # a narrowed slab that still reaches the real right edge behaves full-width
        full_w = 2 * p_end * 2 * ww >= ws
        w_ext = (ws if full_w else 2 * p_end * 2 * ww) - w_off
        m = unpack_windows_cmajor(sl, window, (hs - h_off, w_ext))
        m = pad_reflect_bottom_right_cmajor(m, pad_merge if full_w else (pad_merge[0], 0))
        m = space_to_depth_cmajor(m, (2, 2))  # channels (q, c) q-major
        m = pad_reflect_bottom_right_cmajor(m, pad_win if full_w else (pad_win[0], 0))
        packed, _ = pack_windows_cmajor(m, window, shift=False)
        # (q, c) sublanes -> (c, q*128 + lane): q moves into lane blocks
        sq = packed.reshape(s, b, packed.shape[2], packed.shape[3], 4, c, LANES)
        return jnp.moveaxis(sq, 4, 5).reshape(
            s, b, packed.shape[2], packed.shape[3], c, 4 * LANES
        )

    def fit(piece: jnp.ndarray, axis: int, want: int) -> jnp.ndarray:
        """Trim or zero-pad ``piece`` to ``want`` along strip-row/pair axis (a
        short piece only ever misses even-rounding dummy strips — masked)."""
        have = piece.shape[axis]
        if have > want:
            return jax.lax.slice_in_dim(piece, 0, want, axis=axis)
        if have < want:
            pads = [(0, 0)] * piece.ndim
            pads[axis] = (0, want - have)
            return jnp.pad(piece, pads)
        return piece

    if r_fix < rt:
        # deepest rows the slab's classic pads read back into: the pad_merge
        # reflect source (hs - 2) and the deepest pad_win reflect source on the
        # merged map (mh - 1 - pad_win). Start the slab at the latest even strip
        # row that still contains them (usually r_fix itself: 1-2 strip rows).
        r0 = min(r_fix, (hs - 2) // (2 * wh))
        if pad_win[0]:
            r0 = min(r0, (2 * (mh - 1 - pad_win[0])) // (2 * wh))
        r0 = max(0, r0 - (r0 % 2))
        # with a column fix pending, the row slab only needs pairs [0, p_fix)
        # (+1 pair of margin whose right-edge values are discarded)
        p_end = pt if p_fix >= pt else min(pt, p_fix + 1)
        slab = classic_slab(r0, 0, p_end)[:, :, r_fix - r0 :, : max(p_fix, 1) if p_fix < pt else pt]
        want_p = slab.shape[3]
        rows = jnp.concatenate(
            [out[:, :, :r_fix, :want_p], fit(slab, 2, rt - r_fix)], axis=2
        )
    else:
        rows = out
        want_p = pt
    if p_fix < pt:
        p0 = min(p_fix, (ws - 2) // (4 * ww))
        if pad_win[1]:
            p0 = min(p0, (2 * (mw - 1 - pad_win[1])) // (4 * ww))
        p0 = max(0, p0)
        slab = classic_slab(0, p0, pt)[:, :, :, p_fix - p0 :]
        out = jnp.concatenate(
            [rows[:, :, :, :p_fix], fit(fit(slab, 3, pt - p_fix), 2, rt)], axis=3
        )
    else:
        out = rows
    return out
