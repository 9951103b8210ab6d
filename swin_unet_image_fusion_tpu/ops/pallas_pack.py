"""Lane-packed C-major fused Swin block kernel for the small-C early stages.

Why: TPU HBM/VMEM buffers tile the last two dims to (8, 128). The early U-Net stages
have C = 24/48/96 channels (reference ``A000_CONFIG.py:61``), so every NHWC activation
buffer wastes up to 5.33x HBM bandwidth on lane padding — and the early stages carry
most of the activation volume (each later stage halves it). This was the round-1
roadmap's "single biggest known perf lever".

Layout design (zero lane padding):

- Between blocks the stage runs **C-major** (S, B, C, H, W): the minor dims (H, W) of
  real feature maps are large, so padding is negligible, while in NHWC the minor dim C
  is 24 -> padded to 128.
- Kernel I/O packs **two 7x7 windows per 128-lane register**: tokens padded 49 -> 64,
  window pair side by side -> (strips, TILE, C, 128). Both the sublane dim (C,
  a multiple of 8) and the lane dim (exactly 128) are tile-exact.
- Per-head q/k/v dims are padded to 8 (d = 3/6/12 -> dp = 8/8/16) *in the weights*,
  outside the kernel, so per-head slicing of the stacked (heads*dp, 128) q/k/v happens
  at 8-aligned sublane offsets (unaligned sublane slicing forces a Mosaic relayout).
  Zero-padded weight rows/bias entries keep the padded lanes exactly zero, so scores
  and outputs are unchanged.
- The attention of a window *pair* is computed as one 128x128 score matrix; the
  off-diagonal 64x64 blocks (cross-window scores) are disabled through the same
  set-to--1e10 masking the reference applies for shifted windows
  (``a001_WindowAttention.py:274-315``), so each window's softmax is exact. The
  2x score FLOPs are irrelevant — these stages are bandwidth-bound by ~5x.

The kernel fuses the whole reference ``BasicBlock`` (LN -> window attention -> +res ->
LN -> MLP -> +res, ``a005_BasicBlock.py:127-145``) like ``pallas_block.py``, but on the
packed layout. Differentiable: a custom VJP recomputes the block in VMEM on the
backward pass and accumulates every parameter gradient across the sequential grid
(zero-padded head rows produce exactly-zero pad gradients, so the outer unpadding
transposes recover the true weight gradients).

Odd window counts: nW is padded with one fully-masked dummy window column (zeros),
cropped again after unpacking.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hash_dropout as hdrop
from .pallas_attention import bwd_split_factor, fast_softmax, tpu_compiler_params
from .window import MASK_FILL_VALUE

LN_EPS = 1e-5
TOK = 64  # tokens per window slot (49 real + 15 masked pad)
LANES = 2 * TOK  # two windows per lane register

# Head-batched score/AV matmuls (see _packed_block_fwd_body): profiling showed the
# per-head loop's (128, dp)x(dp, 128) matmuls run the MXU at dp/128 (~6%) utilisation
# and dominate the 512^2 forward. Block-diagonal operands batch all heads into one
# matmul with a heads*dp contraction. Module flag for A/B benchmarking.
FUSED_HEAD_MATMULS = True

# Transposed half-size score maps (_win64_attention): keys on sublanes (head-major
# TOK blocks), queries on lanes (the packed 2-window layout). Each window's scores
# occupy 64 lanes instead of sharing a 2x-redundant 128x(H*128) map, halving every
# VPU pass over the score tensors (bias add, mask select, softmax, dropout) — the
# measured per-pair floor of the 128-lane layout (docs/ROADMAP.md roofline), and it
# also halves the in-kernel bias/mask/k/v tiling work. Requires the head-batched
# path and an 8-aligned all-head inner dim (sublane slices/concats). Module flag
# for A/B benchmarking.
WIN64_SCORES = True

# Fast in-kernel softmax: no max-subtraction pass, reciprocal-multiply instead of
# divide — see pallas_attention.FAST_SOFTMAX (PALLAS_FAST_SOFTMAX=0 restores
# jax.nn.softmax). Safe here because the hand-written backwards consume only the
# softmax OUTPUT p, which is max-shift-independent.
_softmax = fast_softmax

# Casting bmm operands to bf16 inside the packed kernels was A/B'd and REMOVED:
# a measured -1.6% at 512^2 bs=128 (docs/ROADMAP.md session-12 dead ends) — the
# kernel bodies compute in f32 (LN/softmax) and Mosaic's f32 MXU passes are not
# the bottleneck. Do not re-attempt.

# Wrap-roll shifted windows (the reference's torch.roll formulation, rolled over the
# window-multiple extent): the shifted geometry keeps the UNSHIFTED window grid —
# (top, left) become cyclic roll amounts instead of zero-pad amounts, and the wrap
# seams are handled by classic region masks (same-region-only attention) plus
# wrapped halo reads in :func:`repartition_packed`. The round-1 roll-free padded
# partition is mathematically identical (proof sketch in
# pallas_attention.shift_pad_geometry) but adds a window row AND column per shifted
# block (e.g. 100 vs 64 window slots at 56^2 — the measured 1.57x shifted-backward
# cost at the 224^2 training shapes). Module flag for A/B benchmarking; the actual
# per-geometry choice is :func:`use_wrap` — wrap only where it strictly reduces the
# window-slot count, because where it doesn't (e.g. every 512^2 stage map: 256/7
# pads to the same even-rounded grid either way) the pack/unpack rolls and wrap
# halos are pure cost (measured -6% on 512^2 inference when forced on).
WRAP_SHIFT = True

# test/debug hook: when set to a list, _backward appends its raw kernel feature
# gradients (pre any repart transpose) via io_callback
_BWD_DEBUG = None

# when False the backward never fuses the repart into its input load and always
# rematerialises via the standalone conv (test hook for the fallback path)
REPART_BWD_FUSE = True


@functools.lru_cache(maxsize=None)
def _wrap_profitable(hw: Tuple[int, int], window: Tuple[int, int]) -> bool:
    """True when the wrap-roll shifted partition has strictly fewer even-rounded
    window slots than the zero-padded one for this (map, window) geometry."""
    from .pallas_attention import shift_pad_geometry as base

    *_, nh_p, nw_p = base(hw, window, True, even_cols=True, even_rows=True)
    *_, nh_u, nw_u = base(hw, window, False, even_cols=True, even_rows=True)
    return nh_p * nw_p > nh_u * nw_u


def use_wrap(hw: Tuple[int, int], window: Tuple[int, int], shift: bool) -> bool:
    """Whether this shifted geometry uses the wrap-roll formulation (all pack /
    mask / repartition sites must agree, and do: each calls this)."""
    return WRAP_SHIFT and shift and _wrap_profitable(hw, window)


def _dp_pad(d: int) -> int:
    """Per-head dim padded to the 8-sublane boundary."""
    return ((d + 7) // 8) * 8


def pack_rows_per_tile(n_rows: int, n_pairs_w: int, c: int, hd: int,
                       num_heads: int = 8,
                       budget_bytes: Optional[int] = None,
                       attn_drop: bool = False,
                       win64: bool = False,
                       repart: bool = False) -> int:
    """Window-pair rows per grid step under a VMEM live-set budget.

    With head-batched attention (FUSED_HEAD_MATMULS) the dominant per-pair residents
    are the all-head score/softmax maps (2 x LANES x heads*LANES f32) and the
    block-diagonal k/v (2 x ~heads*8 x heads*LANES f32), not the feature strip; the
    strip + MLP-hidden term still matters at large C. The transposed win64 layout
    halves every score-shaped term."""
    if budget_bytes is None:
        # win64: the estimate below is deliberately conservative vs Mosaic's real
        # buffer reuse (tiles estimated at 134M compiled fine under the 100M scoped
        # limit), so the budget is set high enough to admit 2-row tiles at stage-0
        # shapes — measured -26% wall vs one-row grid steps (docs/BENCHMARKS.md)
        if win64:
            budget_bytes = 96 << 20
        else:
            budget_bytes = (40 << 20) if FUSED_HEAD_MATMULS else (2 << 20)
    per_pair = (c + hd) * LANES * 4
    if repart:
        # in-kernel re-partition: up to 4 shifted f32 views of the strip + the
        # accumulating tap matmuls live alongside the block's own tensors
        per_pair += 6 * c * LANES * 4
    if win64:
        hk = num_heads * TOK
        per_pair += 2 * hk * LANES * 4                 # s_t + p_t
        per_pair += 2 * (2 * num_heads * 8) * hk * 4   # k_bd2 + v_bd2
        per_pair += TOK * LANES                        # compact int8 mask
        if attn_drop:
            per_pair += 2 * hk * LANES * 4
    elif FUSED_HEAD_MATMULS:
        lanes_all = num_heads * LANES
        per_pair += 2 * LANES * lanes_all * 4          # s_all + p_cat
        per_pair += 2 * (num_heads * 8) * lanes_all * 4  # k_bd + v_bd (dp>=8)
        per_pair += LANES * lanes_all                  # tiled int8 mask
        if attn_drop:
            # hash intermediate (i32) + dropped weights, both score-sized
            per_pair += 2 * LANES * lanes_all * 4
    best = 1
    for r in range(1, n_rows + 1):
        if n_rows % r == 0 and r * n_pairs_w * per_pair <= budget_bytes:
            best = r
    return best


# --------------------------------------------------------------------------- kernel


def _headbatched_attention(
    q_all, k_all, v_all, bias, mask, num_heads, dp, scale, return_res=False,
    drop=None,
):
    """All-head window attention as two large MXU matmuls via block-diagonal operands.

    The per-head formulation issues (LANES, dp) x (dp, LANES) matmuls whose dp(=8)
    contraction fills 8/128 MXU rows; with 8 heads that is 16 near-empty matmul issues
    per tile and it dominates the small-C stage profile. Instead:

    - scores (all heads): S[t, i, h*LANES+j] = sum_d q[t, h*dp+d, i] * k[t, h*dp+d, j]
      = q_all^T @ K_bd with K_bd the lane-tiled k masked to head-diagonal blocks —
      ONE matmul with a heads*dp contraction (64 rows) and heads*LANES output lanes.
    - AV (all heads): av[t, h*dp+d, i] = sum_j v[t, h*dp+d, j] * p_h[t, i, j]
      = V_bd @ P_cat^T with P_cat the per-head softmaxes concatenated on lanes —
      ONE matmul with a heads*LANES (=1024) contraction, fully filling the MXU.

    The head-diagonal masks are iota comparisons (VPU); per-head softmax slices sit at
    128-aligned lane offsets (free). Zero-padded head rows stay exactly zero.
    """
    tile = q_all.shape[0]
    ip = num_heads * dp
    lanes_all = num_heads * LANES

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    row_head = jax.lax.broadcasted_iota(jnp.int32, (ip, lanes_all), 0) // dp
    col_head = jax.lax.broadcasted_iota(jnp.int32, (ip, lanes_all), 1) // LANES
    bd = (row_head == col_head)[None]                       # (1, IP, H*LANES)

    k_bd = jnp.where(bd, jnp.concatenate([k_all] * num_heads, axis=2), 0.0)
    # scale folded into q (one pass over the smaller q tensor, not the scores);
    # the grads fn receives the caller's UNSCALED q_all, so its *scale terms stand
    s_all = bmm(q_all * jnp.float32(scale), k_bd, ((1,), (1,)))  # (T, LANES, H*LANES)
    s_all = s_all + jnp.concatenate([bias] * num_heads, axis=-1)[None]
    mask_t = jnp.concatenate([mask] * num_heads, axis=-1)
    s_all = jnp.where(mask_t != 0, jnp.float32(MASK_FILL_VALUE), s_all)

    p_cat = jnp.concatenate(
        [
            _softmax(s_all[:, :, h * LANES : (h + 1) * LANES], axis=-1)
            for h in range(num_heads)
        ],
        axis=2,
    )                                                       # (T, LANES, H*LANES)
    # attention-weights dropout (reference a001_WindowAttention.py:58-61): the
    # softmax output feeds AV through the hash mask; residuals keep the pre-drop
    # p_cat so the backward recomputes the identical mask from (seed, position)
    p_use = hdrop.apply_mask(p_cat, *drop) if drop is not None else p_cat
    v_bd = jnp.where(bd, jnp.concatenate([v_all] * num_heads, axis=2), 0.0)
    av_all = bmm(v_bd, p_use, ((2,), (2,)))                 # (T, IP, LANES)
    if return_res:
        return av_all, (p_cat, k_bd, v_bd, bd)
    return av_all


def _headbatched_attention_grads(
    q_all, g_av_all, res, num_heads, dp, scale, drop=None
):
    """Gradients of the head-batched attention from the shared recompute residuals.

    Same math as the per-head loop, expressed as large block-diagonal matmuls (full
    MXU contraction). Returns (g_q_all, g_k_all, g_v_all, g_bias) with g_bias summed
    over heads and the tile axis (the rel-pos table is shared across heads —
    reference a001_WindowAttention.py:72-82).
    """
    p_cat, k_bd, v_bd, bd = res

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def diag_blocks(a):
        """(T, IP, H*LANES) -> (T, IP, LANES): keep each row's own head block."""
        a = jnp.where(bd, a, 0.0)
        out = a[:, :, :LANES]
        for h in range(1, num_heads):
            out = out + a[:, :, h * LANES : (h + 1) * LANES]
        return out

    # g_p_h[t,i,j] = sum_d g_av[t,hd,i] v[t,hd,j]  (contraction IP)
    g_p_cat = bmm(g_av_all, v_bd, ((1,), (1,)))             # (T, LANES, H*LANES)
    if drop is not None:
        # AV consumed p_drop = where(keep, p/q, 0): chain rule scales the softmax
        # cotangent by the same mask, and g_v must use the dropped weights
        p_drop = hdrop.apply_mask(p_cat, *drop)
        g_p_cat = hdrop.apply_mask(g_p_cat, *drop)
    else:
        p_drop = p_cat
    # softmax backward per head block (0 at masked positions by construction)
    g_s_heads = []
    for h in range(num_heads):
        sl = slice(h * LANES, (h + 1) * LANES)
        p = p_cat[:, :, sl]
        g_p = g_p_cat[:, :, sl]
        tmp = jnp.sum(g_p * p, axis=-1, keepdims=True)
        g_s_heads.append(p * (g_p - tmp))
    g_s_cat = jnp.concatenate(g_s_heads, axis=2)            # (T, LANES, H*LANES)
    g_bias = jnp.zeros((LANES, LANES), jnp.float32)
    for g_s in g_s_heads:
        g_bias = g_bias + jnp.sum(g_s, axis=0)
    # g_v_h[t,hd,j] = sum_i g_av[t,hd,i] p_h[t,i,j]  (contraction LANES, then the
    # diagonal head block of the (IP, H*LANES) result)
    g_v_all = diag_blocks(bmm(g_av_all, p_drop, ((2,), (1,))))
    # g_q[t,hd,i] = scale * sum_j k[t,hd,j] g_s_h[t,i,j]  (contraction H*LANES)
    g_q_all = bmm(k_bd, g_s_cat, ((2,), (2,))) * scale
    # g_k[t,hd,j] = scale * sum_i q[t,hd,i] g_s_h[t,i,j]
    g_k_all = diag_blocks(bmm(q_all, g_s_cat, ((2,), (1,)))) * scale
    return g_q_all, g_k_all, g_v_all, g_bias


def _bmm(a, b, contract):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(contract, ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _win64_selectors(num_heads: int):
    """Per-window lane selectors SEL_w (LANES, heads*TOK): SEL_w[l, h*TOK+j] = 1 iff
    l == w*TOK + j. Matmuls with these move a window's 64-lane slot into every
    head's TOK block — the MXU lane-gather idiom (cf. repartition_packed), avoiding
    64-offset lane slices (a Mosaic relayout)."""
    hk = num_heads * TOK
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, hk), 0)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (LANES, hk), 1)
    return tuple(
        (lane_l == w * TOK + lane_m % TOK).astype(jnp.float32) for w in (0, 1)
    )


def _win64_head_diag(num_heads: int, dp: int):
    """(1, heads*dp, heads*TOK) bool: row-head == lane-block-head."""
    ip = num_heads * dp
    hk = num_heads * TOK
    row_head = jax.lax.broadcasted_iota(jnp.int32, (ip, hk), 0) // dp
    col_head = jax.lax.broadcasted_iota(jnp.int32, (ip, hk), 1) // TOK
    return (row_head == col_head)[None]


def _win64_lane_w():
    """(1, 1, LANES) int32: window index of each packed lane."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2) // TOK


# A/B knob: force the selector-MATMUL k/v build even where the roll build is
# legal. The roll build is ~8x cheaper in isolation, but it runs on the VPU —
# the packed kernels' bound unit — while the selector matmuls run on the
# (mostly idle) MXU, so the e2e winner is an empirical question per chip.
_FORCE_SELBUILD = os.environ.get("PACK_WIN64_SELBUILD", "0") == "1"


def _win64_roll_ok(num_heads: int) -> bool:
    """The lane-roll build needs heads*TOK to be whole 128-lane blocks."""
    return not _FORCE_SELBUILD and (num_heads * TOK) % LANES == 0


def _win64_build(q_all, k_all, v_all, num_heads, dp):
    """Block-diagonal operands for the transposed score layout.

    q_bd (TILE, 2*ip, LANES): q duplicated per window, lane-masked to its window —
    rows (w, h*dp+d) so the score contraction picks each query's own window.
    k_bd2/v_bd2 (TILE, 2*ip, heads*TOK): rows (w, h*dp+d) hold window-w keys/values
    at lane block h (head-diagonal).

    Window separation is a 64-lane move inside each 128-lane block. With even
    heads it is done with ONE 64-lane roll + selects: tiling k to (ip, heads*TOK)
    makes every 128-block [w0|w1], a 64-lane roll of the periodic array gives
    [w1|w0] in every block (any roll direction — the array is 128-periodic), and
    two selects pick [w0|w0] / [w1|w1]. ~8x cheaper than the per-window selector
    matmuls, which remain as the odd-heads fallback.
    """
    hk = num_heads * TOK
    hd_bd = _win64_head_diag(num_heads, dp)
    lane_w = _win64_lane_w()

    if _win64_roll_ok(num_heads):
        low = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, hk), 2) % LANES) < TOK

        def bd2(a):
            tiled = jnp.concatenate([a] * (hk // LANES), axis=2)  # [w0|w1] blocks
            rolled = pltpu.roll(tiled, TOK, axis=2)               # [w1|w0] blocks
            kk0 = jnp.where(low, tiled, rolled)
            kk1 = jnp.where(low, rolled, tiled)
            return jnp.concatenate(
                [jnp.where(hd_bd, kk0, 0.0), jnp.where(hd_bd, kk1, 0.0)], axis=1
            )
    else:
        sels = _win64_selectors(num_heads)

        def bd2(a):
            return jnp.concatenate(
                [
                    jnp.where(hd_bd, jax.lax.dot_general(
                        a, sel, (((2,), (0,)), ((), ()))), 0.0)
                    for sel in sels
                ],
                axis=1,
            )

    q_bd = jnp.concatenate(
        [jnp.where(lane_w == w, q_all, 0.0) for w in (0, 1)], axis=1
    )
    return q_bd, bd2(k_all), bd2(v_all), lane_w


def _win64_attention(
    q_all, k_all, v_all, bias_t, mask_t, num_heads, dp, scale, return_res=False,
    drop=None,
):
    """All-head window attention on transposed (heads*TOK, LANES) score maps.

    S_T[t, h*TOK+j, w*TOK+i] = scores of query (w, i) against key j under head h:
    keys on sublanes, queries on lanes, one window per 64 score lanes. Same two big
    MXU matmuls as :func:`_headbatched_attention` but every score-shaped tensor is
    half the size — the dense per-window softmax (the measured VPU floor), the bias
    and mask selects, and the block-diagonal k/v tilings. ``bias_t``/``mask_t`` come
    pre-transposed from :func:`_packed_bias_t` / :func:`_packed_mask_t`.
    """
    ip = num_heads * dp
    # fold the attention scale into q BEFORE the score matmul: one VPU pass over
    # the (TILE, 2*ip, LANES) q tensor instead of one over the 64/dp-times-larger
    # (TILE, heads*TOK, LANES) score tensor. The residual q_bd is therefore
    # PRE-SCALED: _win64_attention_grads keeps *scale on the g_q path (ds/dq is
    # scale*k) and drops it on the g_k path (q_bd already carries it).
    q_bd, k_bd2, v_bd2, lane_w = _win64_build(
        q_all * jnp.float32(scale), k_all, v_all, num_heads, dp
    )

    s_t = _bmm(k_bd2, q_bd, ((1,), (1,)))

    # bias and mask rows are identical for every head (the table is shared across
    # heads, a001:72-82; validity doesn't depend on the head), so both come in
    # UNTILED — (TOK, LANES) instead of (heads*TOK, LANES) — and apply inside the
    # per-head softmax slices: 8x less mask DMA (the measured per-pair mask cost
    # at 512^2), zero extra VPU passes. The shared pad-token mask is pre-folded
    # into bias_t additively (s + -1e10 underflows to exactly 0 through the
    # shifted softmax, same as the reference's set-to--1e10); mask_t carries only
    # the per-pair edge validity and is None for all-interior geometries.
    def head_block(h):
        sl = s_t[:, h * TOK : (h + 1) * TOK, :] + bias_t[None]
        if mask_t is not None:
            sl = jnp.where(mask_t != 0, jnp.float32(MASK_FILL_VALUE), sl)
        return _softmax(sl, axis=1)

    p_t = jnp.concatenate([head_block(h) for h in range(num_heads)], axis=1)
    p_use = hdrop.apply_mask(p_t, *drop) if drop is not None else p_t
    out2 = _bmm(v_bd2, p_use, ((2,), (1,)))                 # (TILE, 2*ip, LANES)
    av_all = (
        jnp.where(lane_w == 0, out2[:, :ip, :], 0.0)
        + jnp.where(lane_w == 1, out2[:, ip:, :], 0.0)
    )
    if return_res:
        return av_all, (p_t, q_bd, k_bd2, v_bd2)
    return av_all


def _win64_attention_grads(g_av_all, res, num_heads, dp, scale, drop=None):
    """Gradients of :func:`_win64_attention` from the recompute residuals.

    All layout moves are the same masked stacks / selector matmuls as the forward
    build, transposed — no in-kernel transposes. Returns (g_q_all, g_k_all,
    g_v_all, g_bias_t) with g_bias_t in the transposed (heads*TOK, LANES) layout
    (mapped back to the shared (T, T) table outside the kernel by autodiff through
    :func:`_packed_bias_t`).
    """
    p_t, q_bd, k_bd2, v_bd2 = res
    ip = num_heads * dp
    hk = num_heads * TOK
    hd_bd = _win64_head_diag(num_heads, dp)
    lane_w = _win64_lane_w()

    g_av_bd = jnp.concatenate(
        [jnp.where(lane_w == w, g_av_all, 0.0) for w in (0, 1)], axis=1
    )
    g_p = _bmm(v_bd2, g_av_bd, ((1,), (1,)))                # (TILE, hk, LANES)
    if drop is not None:
        p_use = hdrop.apply_mask(p_t, *drop)
        g_p = hdrop.apply_mask(g_p, *drop)
    else:
        p_use = p_t

    g_s_heads = []
    g_bias_t = jnp.zeros((TOK, LANES), jnp.float32)
    for h in range(num_heads):
        sl = slice(h * TOK, (h + 1) * TOK)
        p = p_t[:, sl, :]
        gp = g_p[:, sl, :]
        tmp = jnp.sum(gp * p, axis=1, keepdims=True)
        g_s_h = p * (gp - tmp)
        g_s_heads.append(g_s_h)
        # the bias input is untiled (TOK, LANES), shared across heads -> sum
        g_bias_t = g_bias_t + jnp.sum(g_s_h, axis=0)
    g_s = jnp.concatenate(g_s_heads, axis=1)                # (TILE, hk, LANES)

    g_qbd = _bmm(k_bd2, g_s, ((2,), (1,))) * scale          # (TILE, 2*ip, LANES)
    g_q_all = (
        jnp.where(lane_w == 0, g_qbd[:, :ip, :], 0.0)
        + jnp.where(lane_w == 1, g_qbd[:, ip:, :], 0.0)
    )
    # q_bd in res is PRE-SCALED (the forward folds scale into q) — no extra *scale
    g_kbd = _bmm(q_bd, g_s, ((2,), (2,)))                   # (TILE, 2*ip, hk)
    g_vbd = _bmm(g_av_bd, p_use, ((2,), (2,)))

    if _win64_roll_ok(num_heads):
        # inverse of the roll build: head-diag mask, fold the 128-lane blocks
        # (128-aligned slices), then sum the two window halves with one roll and
        # select the window's own half into its packed lanes
        low128 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2) % LANES
        ) < TOK

        def unbd2(g):
            outs = []
            for w in (0, 1):
                gw = jnp.where(hd_bd, g[:, w * ip : (w + 1) * ip, :], 0.0)
                folded = gw[:, :, :LANES]
                for b in range(1, hk // LANES):
                    folded = folded + gw[:, :, b * LANES : (b + 1) * LANES]
                outs.append(folded + pltpu.roll(folded, TOK, axis=2))
            return jnp.where(low128, outs[0], outs[1])      # (TILE, ip, LANES)
    else:
        sels = _win64_selectors(num_heads)

        def unbd2(g):
            out = None
            for w, sel in enumerate(sels):
                gw = jnp.where(hd_bd, g[:, w * ip : (w + 1) * ip, :], 0.0)
                contrib = jax.lax.dot_general(gw, sel, (((2,), (1,)), ((), ())))
                out = contrib if out is None else out + contrib
            return out                                      # (TILE, ip, LANES)

    return g_q_all, unbd2(g_kbd), unbd2(g_vbd), g_bias_t


def _packed_block_fwd_body(
    x_ref,        # (1, TILE, C, 128)
    kv_ref,       # (1, TILE, C, 128) (cross) or x_ref (self)
    ln1s_ref,     # (1, C, 1)
    ln1b_ref,
    ln1kvs_ref,   # (1, C, 1) kv-stream LN1 (cross) or ln1s_ref (self)
    ln1kvb_ref,
    wq_ref,       # (1, heads*dp, C)  transposed + head-padded
    bq_ref,       # (1, heads*dp, 1)
    wk_ref,
    bk_ref,
    wv_ref,
    bv_ref,
    wp_ref,       # (1, C, heads*dp)
    bp_ref,       # (1, C, 1)
    bias_ref,     # (1, 128, 128) block-diag rel-pos bias, or (1, H*TOK, 128) win64
    mask_ref,     # (TILE or 1, 128, 128) int8
    ln2s_ref,     # (1, C, 1)
    ln2b_ref,
    w1_ref,       # (1, Hd, C)
    b1_ref,       # (1, Hd, 1)
    w2_ref,       # (1, C, Hd)
    b2_ref,       # (1, C, 1)
    out_ref,      # (1, TILE, C, 128)
    *,
    num_heads: int,
    dp: int,
    scale: float,
    activation: str,
    win64: bool = False,
    fold_mask: bool = False,  # win64 + shared mask: mask pre-added into the bias
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    seed_ref=None,  # (1,) SMEM f32 hash-dropout seed (only when any rate > 0)
    repart=None,    # static dict: in-kernel re-partition of the input load
    x_halo_ref=None,   # (1, nPw, C, 128) adjacent window row of the x strips
    kv_halo_ref=None,  # same for the kv stream (cross only)
    taps_ref=None,     # (nTaps, 128, 128) one-hot selector matrices
):
    _, tile, c, lanes = x_ref.shape
    x = x_ref[0].astype(jnp.float32)          # (TILE, C, 128)
    kv = kv_ref[0].astype(jnp.float32)

    if repart is not None:
        # fuse the normal<->shift re-partition into the input load: the strips
        # arrive in the FROM geometry; 2x2-neighbourhood taps (halo row via the
        # shifted-index halo ref) + one-hot lane matmuls produce the TO-geometry
        # windows in VMEM — no standalone conv pass, no relayout copies
        # (docs/ROADMAP.md session 8b)
        x = _repart_apply(x, x_halo_ref[0].astype(jnp.float32), taps_ref, **repart)
        if kv_ref is x_ref:
            kv = x
        else:
            kv = _repart_apply(
                kv, kv_halo_ref[0].astype(jnp.float32), taps_ref, **repart
            )

    # hash-dropout (ops/hash_dropout.py): masks are a pure function of
    # (seed, site, global pair index, intra-pair offset), so the re-tiled backward
    # grid recomputes bit-identical masks
    rate_a, rate_p, rate_m = drop_rates
    if seed_ref is not None:
        seed = seed_ref[0].astype(jnp.int32)
        pair0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def site_keep(site, inner_shape, rate):
            return hdrop.tile_keep_mask(seed, site, pair0, tile, inner_shape, rate)
    else:
        site_keep = None

    def layer_norm(a, s_ref, b_ref):
        mu = jnp.mean(a, axis=1, keepdims=True)
        var = jnp.mean((a - mu) ** 2, axis=1, keepdims=True)
        an = (a - mu) * jax.lax.rsqrt(var + LN_EPS)
        return an * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)

    ln_x = layer_norm(x, ln1s_ref, ln1b_ref)
    if kv_ref is x_ref and ln1kvs_ref is ln1s_ref:
        ln_kv = ln_x
    else:
        ln_kv = layer_norm(kv, ln1kvs_ref, ln1kvb_ref)

    bias = bias_ref[0].astype(jnp.float32)    # (128, 128) / (H*TOK, 128) win64
    mask = mask_ref[...]                      # (TILE or 1, 128, 128)

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bcast(w_ref):  # weight (1, M, K) -> (TILE, M, K) batch for bmm
        return jnp.broadcast_to(w_ref[0].astype(jnp.float32), (tile, *w_ref.shape[1:]))

    # stacked qkv for all heads at once: (TILE, heads*dp, 128)
    q_all = bmm(bcast(wq_ref), ln_x, ((2,), (1,))) + bq_ref[0].astype(jnp.float32)
    k_all = bmm(bcast(wk_ref), ln_kv, ((2,), (1,))) + bk_ref[0].astype(jnp.float32)
    v_all = bmm(bcast(wv_ref), ln_kv, ((2,), (1,))) + bv_ref[0].astype(jnp.float32)

    if win64:
        drop_a = (
            (site_keep(hdrop.SITE_ATTN, (num_heads * TOK, LANES), rate_a), rate_a)
            if seed_ref is not None and rate_a > 0 else None
        )
        av_all = _win64_attention(
            q_all, k_all, v_all, bias, None if fold_mask else mask,
            num_heads, dp, scale, drop=drop_a
        )
    elif FUSED_HEAD_MATMULS:
        drop_a = (
            (site_keep(hdrop.SITE_ATTN, (LANES, num_heads * LANES), rate_a), rate_a)
            if seed_ref is not None and rate_a > 0 else None
        )
        av_all = _headbatched_attention(
            q_all, k_all, v_all, bias, mask, num_heads, dp, scale, drop=drop_a
        )
    else:
        av_heads = []
        for h in range(num_heads):
            sl = slice(h * dp, (h + 1) * dp)  # 8-aligned sublane slice
            q = q_all[:, sl, :]               # (TILE, dp, 128)
            k = k_all[:, sl, :]
            v = v_all[:, sl, :]
            s = bmm(q * jnp.float32(scale), k, ((1,), (1,))) + bias[None]  # (TILE, 128, 128)
            s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
            p = _softmax(s, axis=-1)
            av_heads.append(bmm(v, p, ((2,), (2,))))           # (TILE, dp, 128)
        av_all = jnp.concatenate(av_heads, axis=1)         # (TILE, heads*dp, 128)

    acc = bmm(bcast(wp_ref), av_all, ((2,), (1,)))         # (TILE, C, 128)
    if seed_ref is not None and rate_p > 0:
        # proj dropout applies to proj(x)+bias before the residual add
        # (a001_WindowAttention.py:62-66)
        proj_out = acc + bp_ref[0].astype(jnp.float32)
        y = x + hdrop.apply_mask(
            proj_out, site_keep(hdrop.SITE_PROJ, (c, LANES), rate_p), rate_p
        )
    else:
        y = x + acc + bp_ref[0].astype(jnp.float32)

    ln_y = layer_norm(y, ln2s_ref, ln2b_ref)
    hdn = bmm(bcast(w1_ref), ln_y, ((2,), (1,))) + b1_ref[0].astype(jnp.float32)
    if activation == "elu":
        # expm1-free ELU (Mosaic TPU lacks an expm1 lowering)
        hdn = jnp.where(hdn > 0, hdn, jnp.exp(jnp.minimum(hdn, 0.0)) - 1.0)
    elif activation == "relu":
        hdn = jnp.maximum(hdn, 0.0)
    elif activation == "gelu":
        hdn = jax.nn.gelu(hdn)
    else:
        raise ValueError(activation)
    if seed_ref is not None and rate_m > 0:
        hd_dim = w1_ref.shape[1]
        hdn = hdrop.apply_mask(
            hdn, site_keep(hdrop.SITE_MLP_HIDDEN, (hd_dim, LANES), rate_m), rate_m
        )
    m = bmm(bcast(w2_ref), hdn, ((2,), (1,))) + b2_ref[0].astype(jnp.float32)
    if seed_ref is not None and rate_m > 0:
        m = hdrop.apply_mask(
            m, site_keep(hdrop.SITE_MLP_OUT, (c, LANES), rate_m), rate_m
        )

    out_ref[...] = (y + m)[None].astype(out_ref.dtype)


def _packed_fwd_kernel(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        refs, seed_ref, out = refs[:-2], refs[-2], refs[-1]
        kw = dict(kw, seed_ref=seed_ref)
    else:
        refs, out = refs[:-1], refs[-1]
    if kw.get("repart") is not None:
        x_ref, kv_ref, xh, kvh, taps, *rest = refs
        kw = dict(kw, x_halo_ref=xh, kv_halo_ref=kvh, taps_ref=taps)
        refs = (x_ref, kv_ref, *rest)
    (x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2) = refs
    _packed_block_fwd_body(x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                           out, **kw)


def _packed_fwd_kernel_self(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        refs, seed_ref, out = refs[:-2], refs[-2], refs[-1]
        kw = dict(kw, seed_ref=seed_ref)
    else:
        refs, out = refs[:-1], refs[-1]
    if kw.get("repart") is not None:
        x_ref, xh, taps, *rest = refs
        kw = dict(kw, x_halo_ref=xh, taps_ref=taps)
        refs = (x_ref, *rest)
    (x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2) = refs
    _packed_block_fwd_body(x_ref, x_ref, ln1s, ln1b, ln1s, ln1b, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                           out, **kw)


def _act_and_grad(z, activation):
    """activation(z) and its derivative, expm1/erf-free where Mosaic needs it."""
    if activation == "elu":
        ez = jnp.exp(jnp.minimum(z, 0.0))
        return jnp.where(z > 0, z, ez - 1.0), jnp.where(z > 0, 1.0, ez)
    if activation == "relu":
        return jnp.maximum(z, 0.0), (z > 0).astype(z.dtype)
    if activation == "gelu":
        inv_sqrt2 = 0.7071067811865476
        cdf = 0.5 * (1.0 + jax.lax.erf(z * inv_sqrt2))
        pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327
        return z * cdf, cdf + z * pdf
    raise ValueError(activation)


def _ln_fwd_c(a, scale, bias):
    """LayerNorm over the channel (sublane) axis 1 of (TILE, C, L)."""
    mu = jnp.mean(a, axis=1, keepdims=True)
    var = jnp.mean((a - mu) ** 2, axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (a - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd_c(g_out, xhat, inv, scale):
    """(g_a, g_scale, g_bias) for out = xhat * scale + bias, channel axis 1."""
    g_scale = jnp.sum(g_out * xhat, axis=(0, 2))[:, None]   # (C, 1)
    g_bias = jnp.sum(g_out, axis=(0, 2))[:, None]
    g_xhat = g_out * scale
    m1 = jnp.mean(g_xhat, axis=1, keepdims=True)
    m2 = jnp.mean(g_xhat * xhat, axis=1, keepdims=True)
    g_a = inv * (g_xhat - m1 - xhat * m2)
    return g_a, g_scale, g_bias


def _packed_block_bwd_body(
    x_ref, kv_ref,
    ln1s_ref, ln1b_ref, ln1kvs_ref, ln1kvb_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wp_ref, bp_ref,
    bias_ref, mask_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    g_ref,
    gx_ref, gkv_ref,
    gln1s_q_ref, gln1b_q_ref, gln1s_kv_ref, gln1b_kv_ref,
    gwq_ref, gbq_ref, gwk_ref, gbk_ref, gwv_ref, gbv_ref, gwp_ref, gbp_ref,
    gbias_ref,
    gln2s_ref, gln2b_ref,
    gw1_ref, gb1_ref, gw2_ref, gb2_ref,
    *,
    num_heads: int,
    dp: int,
    scale: float,
    activation: str,
    batch: int,
    win64: bool = False,
    fold_mask: bool = False,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    seed_ref=None,
    repart=None,    # static dict: in-kernel re-partition of the input load
    x_halo_ref=None,   # (1, nPw, C, 128) adjacent window row of the x strips
    kv_halo_ref=None,  # same for the kv stream (cross only)
    taps_ref=None,     # (nTaps, 128, 128) one-hot selector matrices
):
    """Recompute the packed block in VMEM, then backprop everything (C-major)."""
    _, tile, c, lanes = x_ref.shape

    x = x_ref[0].astype(jnp.float32)
    kv = kv_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)

    if repart is not None:
        # same fused input-load re-partition as the forward (the gradients this
        # body emits are then w.r.t. the TO-geometry strips; the caller routes
        # the feature cotangent back through the conv's linear transpose)
        x = _repart_apply(x, x_halo_ref[0].astype(jnp.float32), taps_ref, **repart)
        if kv_ref is x_ref:
            kv = x
        else:
            kv = _repart_apply(
                kv, kv_halo_ref[0].astype(jnp.float32), taps_ref, **repart
            )

    # identical hash-dropout masks to the forward: pair0 uses THIS grid's (finer)
    # tiling but indexes the same global pair sequence, so every mask matches
    rate_a, rate_p, rate_m = drop_rates
    if seed_ref is not None:
        seed = seed_ref[0].astype(jnp.int32)
        pair0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def site_keep(site, inner_shape, rate):
            return hdrop.tile_keep_mask(seed, site, pair0, tile, inner_shape, rate)
    else:
        site_keep = None

    s1 = ln1s_ref[0].astype(jnp.float32)
    b1 = ln1b_ref[0].astype(jnp.float32)
    s1o = ln1kvs_ref[0].astype(jnp.float32)
    b1o = ln1kvb_ref[0].astype(jnp.float32)
    s2 = ln2s_ref[0].astype(jnp.float32)
    b2v = ln2b_ref[0].astype(jnp.float32)

    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[...]

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def bcast(w_ref):
        return jnp.broadcast_to(w_ref[0].astype(jnp.float32), (tile, *w_ref.shape[1:]))

    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(0) % batch == 0)

    @pl.when(first)
    def _():
        for r in (
            gln1s_q_ref, gln1b_q_ref, gln1s_kv_ref, gln1b_kv_ref,
            gwq_ref, gbq_ref, gwk_ref, gbk_ref, gwv_ref, gbv_ref,
            gwp_ref, gbp_ref, gbias_ref, gln2s_ref, gln2b_ref,
            gw1_ref, gb1_ref, gw2_ref, gb2_ref,
        ):
            r[...] = jnp.zeros_like(r)

    # ---- recompute forward ----
    ln_x, xhat1, inv1 = _ln_fwd_c(x, s1, b1)
    if gkv_ref is None:
        ln_kv, xhat1kv, inv1kv = ln_x, xhat1, inv1
    else:
        ln_kv, xhat1kv, inv1kv = _ln_fwd_c(kv, s1o, b1o)

    q_all = bmm(bcast(wq_ref), ln_x, ((2,), (1,))) + bq_ref[0].astype(jnp.float32)
    k_all = bmm(bcast(wk_ref), ln_kv, ((2,), (1,))) + bk_ref[0].astype(jnp.float32)
    v_all = bmm(bcast(wv_ref), ln_kv, ((2,), (1,))) + bv_ref[0].astype(jnp.float32)

    if win64:
        drop_a = (
            (site_keep(hdrop.SITE_ATTN, (num_heads * TOK, LANES), rate_a), rate_a)
            if seed_ref is not None and rate_a > 0 else None
        )
        av_all, hb_res = _win64_attention(
            q_all, k_all, v_all, bias, None if fold_mask else mask,
            num_heads, dp, scale, return_res=True, drop=drop_a,
        )
        heads_p = None
    elif FUSED_HEAD_MATMULS:
        drop_a = (
            (site_keep(hdrop.SITE_ATTN, (LANES, num_heads * LANES), rate_a), rate_a)
            if seed_ref is not None and rate_a > 0 else None
        )
        av_all, hb_res = _headbatched_attention(
            q_all, k_all, v_all, bias, mask, num_heads, dp, scale, return_res=True,
            drop=drop_a,
        )
        heads_p = None
    else:
        heads_p = []
        av_heads = []
        for h in range(num_heads):
            sl = slice(h * dp, (h + 1) * dp)
            q = q_all[:, sl, :]
            k = k_all[:, sl, :]
            v = v_all[:, sl, :]
            s = bmm(q * jnp.float32(scale), k, ((1,), (1,))) + bias[None]  # (TILE, 128, 128)
            s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
            p = _softmax(s, axis=-1)
            av_heads.append(bmm(v, p, ((2,), (2,))))
            heads_p.append(p)
        av_all = jnp.concatenate(av_heads, axis=1)

    acc = bmm(bcast(wp_ref), av_all, ((2,), (1,)))
    if seed_ref is not None and rate_p > 0:
        keep_p = site_keep(hdrop.SITE_PROJ, (c, LANES), rate_p)
        y = x + hdrop.apply_mask(
            acc + bp_ref[0].astype(jnp.float32), keep_p, rate_p
        )
    else:
        keep_p = None
        y = x + acc + bp_ref[0].astype(jnp.float32)

    ln_y, xhat2, inv2 = _ln_fwd_c(y, s2, b2v)
    pre1 = bmm(bcast(w1_ref), ln_y, ((2,), (1,))) + b1_ref[0].astype(jnp.float32)
    h1, dact = _act_and_grad(pre1, activation)
    if seed_ref is not None and rate_m > 0:
        hd_dim = w1_ref.shape[1]
        keep_h = site_keep(hdrop.SITE_MLP_HIDDEN, (hd_dim, LANES), rate_m)
        keep_m = site_keep(hdrop.SITE_MLP_OUT, (c, LANES), rate_m)
        h1 = hdrop.apply_mask(h1, keep_h, rate_m)
    else:
        keep_h = keep_m = None

    # ---- backward ----
    # out = y + drop_m(W2 h1 + b2m); h1 already carries the hidden-site mask, so
    # gw2/g_h1 see the dropped hidden exactly as the forward's W2 matmul did
    g_y = g
    g_m = hdrop.apply_mask(g, keep_m, rate_m) if keep_m is not None else g
    gw2_ref[0] += jnp.sum(bmm(g_m, h1, ((2,), (2,))), axis=0)         # (C, Hd)
    gb2_ref[0] += jnp.sum(g_m, axis=(0, 2))[:, None]
    g_h1 = bmm(bcast(w2_ref), g_m, ((1,), (1,)))                      # (TILE, Hd, L)
    if keep_h is not None:
        g_h1 = hdrop.apply_mask(g_h1, keep_h, rate_m)
    g_pre = g_h1 * dact
    gw1_ref[0] += jnp.sum(bmm(g_pre, ln_y, ((2,), (2,))), axis=0)     # (Hd, C)
    gb1_ref[0] += jnp.sum(g_pre, axis=(0, 2))[:, None]
    g_lny = bmm(bcast(w1_ref), g_pre, ((1,), (1,)))                   # (TILE, C, L)
    g_y2, g_s2, g_b2 = _ln_bwd_c(g_lny, xhat2, inv2, s2)
    gln2s_ref[0] += g_s2
    gln2b_ref[0] += g_b2
    g_y = g_y + g_y2

    # attention backward (proj-site dropout scales the proj-output cotangent; the
    # residual path through y stays unmasked)
    g_po = hdrop.apply_mask(g_y, keep_p, rate_p) if keep_p is not None else g_y
    gbp_ref[0] += jnp.sum(g_po, axis=(0, 2))[:, None]
    g_av_all = bmm(bcast(wp_ref), g_po, ((1,), (1,)))                 # (TILE, IP, L)
    gwp_ref[0] += jnp.sum(bmm(g_po, av_all, ((2,), (2,))), axis=0)    # (C, IP)

    if win64:
        g_q_all, g_k_all, g_v_all, g_bias_acc = _win64_attention_grads(
            g_av_all, hb_res, num_heads, dp, scale, drop=drop_a
        )
    elif FUSED_HEAD_MATMULS:
        g_q_all, g_k_all, g_v_all, g_bias_acc = _headbatched_attention_grads(
            q_all, g_av_all, hb_res, num_heads, dp, scale, drop=drop_a
        )
    else:
        g_q_heads, g_k_heads, g_v_heads = [], [], []
        g_bias_acc = jnp.zeros((lanes, lanes), jnp.float32)
        for h in range(num_heads):
            sl = slice(h * dp, (h + 1) * dp)
            q = q_all[:, sl, :]
            k = k_all[:, sl, :]
            v = v_all[:, sl, :]
            p = heads_p[h]
            g_av = g_av_all[:, sl, :]
            g_p = bmm(g_av, v, ((1,), (1,)))                          # (TILE, L, L)
            g_v = bmm(g_av, p, ((2,), (1,)))                          # (TILE, dp, L)
            tmp = jnp.sum(g_p * p, axis=-1, keepdims=True)
            g_s = p * (g_p - tmp)                                     # 0 at masked
            g_bias_acc = g_bias_acc + jnp.sum(g_s, axis=0)
            g_q = bmm(k, g_s, ((2,), (2,))) * scale                   # (TILE, dp, L)
            g_k = bmm(q, g_s, ((2,), (1,))) * scale
            g_q_heads.append(g_q)
            g_k_heads.append(g_k)
            g_v_heads.append(g_v)
        g_q_all = jnp.concatenate(g_q_heads, axis=1)
        g_k_all = jnp.concatenate(g_k_heads, axis=1)
        g_v_all = jnp.concatenate(g_v_heads, axis=1)
    gbias_ref[0] += g_bias_acc

    g_lnx = bmm(bcast(wq_ref), g_q_all, ((1,), (1,)))                 # (TILE, C, L)
    g_lnkv = (
        bmm(bcast(wk_ref), g_k_all, ((1,), (1,)))
        + bmm(bcast(wv_ref), g_v_all, ((1,), (1,)))
    )
    gwq_ref[0] += jnp.sum(bmm(g_q_all, ln_x, ((2,), (2,))), axis=0)   # (IP, C)
    gwk_ref[0] += jnp.sum(bmm(g_k_all, ln_kv, ((2,), (2,))), axis=0)
    gwv_ref[0] += jnp.sum(bmm(g_v_all, ln_kv, ((2,), (2,))), axis=0)
    gbq_ref[0] += jnp.sum(g_q_all, axis=(0, 2))[:, None]
    gbk_ref[0] += jnp.sum(g_k_all, axis=(0, 2))[:, None]
    gbv_ref[0] += jnp.sum(g_v_all, axis=(0, 2))[:, None]

    if gkv_ref is None:
        g_x_ln, g_s1, g_b1 = _ln_bwd_c(g_lnx + g_lnkv, xhat1, inv1, s1)
        gln1s_q_ref[0] += g_s1
        gln1b_q_ref[0] += g_b1
        gln1s_kv_ref[0] += jnp.zeros_like(g_s1)
        gln1b_kv_ref[0] += jnp.zeros_like(g_b1)
        gx_ref[...] = (g_y + g_x_ln)[None].astype(gx_ref.dtype)
    else:
        g_x_ln, g_s1, g_b1 = _ln_bwd_c(g_lnx, xhat1, inv1, s1)
        gln1s_q_ref[0] += g_s1
        gln1b_q_ref[0] += g_b1
        g_kv_ln, g_s1o, g_b1o = _ln_bwd_c(g_lnkv, xhat1kv, inv1kv, s1o)
        gln1s_kv_ref[0] += g_s1o
        gln1b_kv_ref[0] += g_b1o
        gx_ref[...] = (g_y + g_x_ln)[None].astype(gx_ref.dtype)
        gkv_ref[...] = g_kv_ln[None].astype(gkv_ref.dtype)


def _packed_bwd_kernel(*refs, **kw):
    if kw.get("repart") is not None:
        # splice the halo/taps refs out FIRST so the fixed seed index below holds
        x_ref, kv_ref, xh, kvh, taps, *rest = refs
        kw = dict(kw, x_halo_ref=xh, kv_halo_ref=kvh, taps_ref=taps)
        refs = (x_ref, kv_ref, *rest)
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        # seed is the 24th input (appended after g); outputs follow it
        kw = dict(kw, seed_ref=refs[23])
        refs = refs[:23] + refs[24:]
    (x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
     gx, gkv, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
     gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
     gln2s, gln2b, gw1, gb1, gw2, gb2) = refs
    _packed_block_bwd_body(x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
                           gx, gkv, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
                           gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
                           gln2s, gln2b, gw1, gb1, gw2, gb2, **kw)


def _packed_bwd_kernel_self(*refs, **kw):
    if kw.get("repart") is not None:
        x_ref, xh, taps, *rest = refs
        kw = dict(kw, x_halo_ref=xh, taps_ref=taps)
        refs = (x_ref, *rest)
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        # seed is the 21st input (appended after g); outputs follow it
        kw = dict(kw, seed_ref=refs[20])
        refs = refs[:20] + refs[21:]
    (x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
     gx, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
     gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
     gln2s, gln2b, gw1, gb1, gw2, gb2) = refs
    _packed_block_bwd_body(x_ref, x_ref, ln1s, ln1b, ln1s, ln1b, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
                           gx, None, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
                           gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
                           gln2s, gln2b, gw1, gb1, gw2, gb2, **kw)


# ----------------------------------------------------------------- pack / unpack


def shift_pad_geometry(
    hw: Tuple[int, int], window: Tuple[int, int], shift: bool
) -> Tuple[int, int, int, int, int, int]:
    """Packed-layout geometry: :func:`pallas_attention.shift_pad_geometry` with the
    window-column count rounded to an even pair count (two windows per register)
    and the row count rounded even (multi-row kernel tiles).

    With :data:`WRAP_SHIFT`, the shifted geometry keeps the unshifted grid:
    (nh, nw) equal the ``shift=False`` counts and (top, left) are cyclic ROLL
    amounts over the window-multiple extents (see :func:`_wrap_extent`), not pad
    amounts. Rolling by (top, left) places every original pixel at exactly the
    in-window position the padded formulation gives it (both extents are window
    multiples), so masks/bias/repartition in-window algebra is shared; only the
    out-of-grid indexing (wrap instead of zero halo) differs.
    """
    from .pallas_attention import shift_pad_geometry as base

    if use_wrap(hw, window, shift):
        top, left, *_ = base(hw, window, True)
        _, _, hp, wp, nh, nw = base(hw, window, False, even_cols=True, even_rows=True)
        return top, left, hp, wp, nh, nw
    return base(hw, window, shift, even_cols=True, even_rows=True)


def _wrap_extent(hw: Tuple[int, int], window: Tuple[int, int]) -> Tuple[int, int]:
    """Real window-multiple extents (h, w rounded up) the wrap roll cycles over —
    excludes the dummy even-rounding windows, which hold no real data."""
    h, w = hw
    wh, ww = window
    return h + (-h) % wh, w + (-w) % ww


def pack_windows_cmajor(
    x: jnp.ndarray, window: Tuple[int, int], shift: bool = False
) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """(S, B, C, H, W) -> (S*B, nH, nPairsW, C, 128) with 2 windows per lane register.

    Token order within each 64-lane slot is the row-major (wh, ww) order the bias/mask
    machinery uses; tokens 49..63 are zero pad (masked in attention). ``shift=True``
    selects the roll-free shifted partition (see :func:`shift_pad_geometry`); all
    zero-padded positions are masked by :func:`_packed_mask`.
    """
    s, b, c, h, w = x.shape
    wh, ww = window
    t = wh * ww
    top, left, hp, wp, nh, nw = shift_pad_geometry((h, w), window, shift)
    if use_wrap((h, w), window, shift):
        # pad the real data to the window-multiple extent, roll cyclically over it,
        # then pad the dummy even-rounding windows (masked, never unpacked)
        hp0, wp0 = _wrap_extent((h, w), window)
        if hp0 > h or wp0 > w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, hp0 - h), (0, wp0 - w)))
        x = jnp.roll(x, (top, left), axis=(3, 4))
        if hp > hp0 or wp > wp0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, hp - hp0), (0, wp - wp0)))
    elif top or left or hp > top + h or wp > left + w:
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (0, 0), (top, hp - top - h), (left, wp - left - w)),
        )
    np_w = nw // 2
    x = x.reshape(s, b, c, nh, wh, np_w, 2, ww)
    # -> (s, b, nh, np_w, c, pair, wh, ww)
    x = x.transpose(0, 1, 3, 5, 2, 6, 4, 7)
    x = x.reshape(s, b, nh, np_w, c, 2, t)
    x = jnp.pad(x, ((0, 0),) * 5 + ((0, 0), (0, TOK - t)))
    x = x.reshape(s, b, nh, np_w, c, LANES)
    return x, (nh, np_w, nw)


def unpack_windows_cmajor(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    shift: bool = False,
) -> jnp.ndarray:
    """Inverse of :func:`pack_windows_cmajor` -> (S, B, C, H, W) cropped to hw."""
    s, b, nh, np_w, c, _ = xp.shape
    wh, ww = window
    t = wh * ww
    h, w = hw
    top, left, _, _, _, _ = shift_pad_geometry((h, w), window, shift)
    xp = xp.reshape(s, b, nh, np_w, c, 2, TOK)[..., :t]
    xp = xp.reshape(s, b, nh, np_w, c, 2, wh, ww)
    # inverse of (0,1,3,5,2,6,4,7)
    xp = xp.transpose(0, 1, 4, 2, 6, 3, 5, 7)
    xp = xp.reshape(s, b, c, nh * wh, np_w * 2 * ww)
    if use_wrap((h, w), window, shift):
        hp0, wp0 = _wrap_extent((h, w), window)
        xp = jnp.roll(xp[..., :hp0, :wp0], (-top, -left), axis=(3, 4))
        return xp[..., :h, :w]
    return xp[..., top : top + h, left : left + w]


@functools.lru_cache(maxsize=None)
def _packed_mask(
    hw: Tuple[int, int], window: Tuple[int, int], shift: bool, wrap: bool
) -> Tuple[np.ndarray, int]:
    """(nPairs or 1, 128, 128) int8 mask: cross-window blocks, token padding, and —
    for the shifted partition — edge/seam masking.

    Roll-free mode (``wrap=False``): the reference's wrap-region masking reduces to
    masking invalid (zero-padded) tokens — regions the rolled formulation keeps
    apart inside one wrap window live in separate windows there.

    Wrap mode (``wrap=True``, :data:`WRAP_SHIFT`): the classic swin region masks —
    the seam windows (grid row/column 0 after the +(top, left) roll) contain tokens
    wrapped from the opposite edge; tokens attend only within their own
    (row-region, col-region) cell, plus validity masking of any window-pad
    positions beyond the real (h, w)."""
    h, w = hw
    wh, ww = window
    t = wh * ww
    top, left, hp, wp, nh, nw = shift_pad_geometry(hw, window, shift)
    wrap = wrap and shift

    # fully masked except each window's own (T, T) block; pad tokens masked within it
    base = np.ones((LANES, LANES), np.int8)
    for o in (0, TOK):
        blk = np.zeros((TOK, TOK), np.int8)
        blk[:, t:] = 1  # pad-token keys
        blk[t:, :] = 1  # pad-token queries
        base[o : o + TOK, o : o + TOK] = blk

    if wrap:
        hp0, wp0 = _wrap_extent(hw, window)

        def row_info(r):  # validity + wrap-region id of each in-window row
            rows = r * wh + np.arange(wh)
            valid = (rows < hp0) & ((rows - top) % hp0 < h)
            return valid, rows < top

        def col_info(c):
            cols = c * ww + np.arange(ww)
            valid = (cols < wp0) & ((cols - left) % wp0 < w)
            return valid, cols < left

    else:

        def row_info(r):
            rows = r * wh + np.arange(wh)
            return (rows >= top) & (rows < top + h), np.zeros(wh, bool)

        def col_info(c):
            cols = c * ww + np.arange(ww)
            return (cols >= left) & (cols < left + w), np.zeros(ww, bool)

        all_valid = all(row_info(r)[0].all() for r in (0, nh - 1)) and all(
            col_info(c)[0].all() for c in (0, nw - 1)
        )
        if all_valid:
            return base[None], 1

    n_pairs = nh * (nw // 2)
    full = np.empty((n_pairs, LANES, LANES), np.int8)
    p = 0
    for r in range(nh):
        rv, rreg = row_info(r)
        for j in range(nw // 2):
            m = base.copy()
            for slot, col in ((0, 2 * j), (1, 2 * j + 1)):
                o = slot * TOK
                cv, creg = col_info(col)
                tok_valid = (rv[:, None] & cv[None, :]).reshape(t)
                bad = ~tok_valid
                m[o : o + t, o : o + t] |= bad[None, :] | bad[:, None]
                if wrap:
                    # same-region-only attention across the wrap seams
                    treg_r = np.repeat(rreg, ww)
                    treg_c = np.tile(creg, wh)
                    m[o : o + t, o : o + t] |= (
                        treg_r[:, None] != treg_r[None, :]
                    ) | (treg_c[:, None] != treg_c[None, :])
            full[p] = m
            p += 1
    return full, n_pairs


def _packed_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """(S, T, T) rel-pos bias -> (S, 128, 128) with a copy in each diagonal block."""
    s, t, _ = bias.shape
    out = jnp.zeros((s, LANES, LANES), bias.dtype)
    out = out.at[:, :t, :t].set(bias)
    out = out.at[:, TOK : TOK + t, TOK : TOK + t].set(bias)
    return out


def _packed_bias_t(bias: jnp.ndarray) -> jnp.ndarray:
    """(S, T, T) rel-pos bias -> (S, TOK, LANES) for the transposed layout.

    bias_t[s, j, w*TOK + i] = bias[s, i, j] for real tokens, MASK_FILL at
    pad-token rows/lanes (j or i >= T) — the shared part of the score mask is
    folded in additively. Rows are identical for every head block (the table is
    shared across heads, a001_WindowAttention.py:72-82) so the kernel applies this
    untiled inside each per-head softmax slice. Differentiable jnp ops so the
    kernel's transposed bias cotangent maps back onto the (T, T) table."""
    s, t, _ = bias.shape
    bt = jnp.full((s, TOK, TOK), jnp.float32(MASK_FILL_VALUE), bias.dtype)
    bt = bt.at[:, :t, :t].set(jnp.swapaxes(bias, 1, 2))
    return jnp.concatenate([bt, bt], axis=2)         # (S, TOK, LANES)


@functools.lru_cache(maxsize=None)
def _packed_mask_t(
    hw: Tuple[int, int], window: Tuple[int, int], shift: bool, wrap: bool
) -> Tuple[np.ndarray, int]:
    """:func:`_packed_mask` in the compact transposed layout: (n, TOK, LANES) with
    mask_t[p, j, w*TOK + i] = mask[p, w*TOK + i, w*TOK + j]. The cross-window
    blocks vanish (each window's scores own their 64 lanes) and the rows are
    head-independent, so the kernel applies this untiled per head slice — 8x less
    mask DMA than a (heads*TOK, LANES) tiling, the measured per-pair mask cost."""
    full, n = _packed_mask(hw, window, shift, wrap)
    blocks = [
        np.swapaxes(full[:, w * TOK : (w + 1) * TOK, w * TOK : (w + 1) * TOK], 1, 2)
        for w in (0, 1)
    ]
    return np.concatenate(blocks, axis=2), n         # (n, TOK, LANES)


def strips_use_win64(num_heads: int, dims_per_head: int) -> bool:
    """Mirror of the kernel's transposed-score-layout predicate (spmd helper)."""
    dp = dims_per_head if FUSED_HEAD_MATMULS else _dp_pad(dims_per_head)
    return WIN64_SCORES and FUSED_HEAD_MATMULS and (num_heads * dp) % 8 == 0


def packed_mask_rows(
    hw: Tuple[int, int],
    window: Tuple[int, int],
    shift: bool,
    num_heads: int,
    dims_per_head: int,
) -> Tuple[np.ndarray, bool]:
    """Global per-pair masks shaped (nh, nPairsW, *mask_inner) for the
    ``mask_rows`` operand of :func:`pallas_packed_block_strips` — the layout a
    row-sharded partitioned call slices along axis 0. Returns (mask, shared):
    when the geometry's mask is shared across pairs (mask_n == 1) the mask is
    (1, 1, *mask_inner) and must ride replicated, not sharded."""
    wrap = use_wrap(hw, window, shift)
    if strips_use_win64(num_heads, dims_per_head):
        mask_np, mask_n = _packed_mask_t(hw, window, shift, wrap)
    else:
        mask_np, mask_n = _packed_mask(hw, window, shift, wrap)
    if mask_n == 1:
        return np.asarray(mask_np).reshape(1, 1, *mask_np.shape[1:]), True
    *_, nh, nw = shift_pad_geometry(hw, window, shift)
    np_w = nw // 2
    return np.asarray(mask_np).reshape(nh, np_w, *mask_np.shape[1:]), False


# ------------------------------------------------------------------- entry point


def pallas_packed_block(
    x: jnp.ndarray,
    *,
    window: Tuple[int, int],
    shift: bool,
    **kwargs,
) -> jnp.ndarray:
    """One fused pre-norm Swin block on C-major stacked streams.

    x: (S, B, C, H, W) with H, W divisible by the window. Differentiable (custom
    VJP, flash-style recompute). Returns (S, B, C, H, W).
    """
    s, b, c, h, w = x.shape
    # shifted windows are roll-free: a shifted-partition pack + pad-token masks is
    # exactly equivalent to the reference's roll+wrap-mask (shift_pad_geometry).
    xp, _ = pack_windows_cmajor(x, window, shift)
    out = pallas_packed_block_strips(
        xp, hw=(h, w), window=window, shift=shift, **kwargs
    )
    return unpack_windows_cmajor(out, window, (h, w), shift)


def pallas_packed_block_strips(
    xp: jnp.ndarray,
    *,
    hw: Tuple[int, int],
    cross: bool,
    shift: bool,
    ln1_scale: jnp.ndarray,  # (S, C)
    ln1_bias: jnp.ndarray,
    attn: dict,              # wq/bq/wk/bk/wv/bv (S,C,inner)/(S,inner), wp, bp
    bias: jnp.ndarray,       # (S, T, T)
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    w1: jnp.ndarray,         # (S, C, Hd)
    b1: jnp.ndarray,
    w2: jnp.ndarray,         # (S, Hd, C)
    b2: jnp.ndarray,
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    activation: str = "elu",
    interpret: bool = False,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    drop_seed: Optional[jnp.ndarray] = None,
    repart_from: Optional[bool] = None,
    mask_rows: Optional[jnp.ndarray] = None,
    mask_shared: bool = False,
) -> jnp.ndarray:
    """The fused block directly on the packed strip layout.

    xp: (S, B, nh, nPairsW, C, 128), already packed for the ``(hw, window, shift)``
    geometry (:func:`pack_windows_cmajor` or :func:`repartition_packed`). Returns the
    same layout. This is the stage-fusion entry point: a 4-block quartet packs once,
    repartitions between the normal/shifted geometries with lane matmuls, and unpacks
    once — instead of 4 pack/unpack transpose chains (the round-1 "35% of the 512^2
    profile is pack/unpack" plateau, docs/ROADMAP.md).

    With ``repart_from`` set, ``xp`` instead arrives packed for the
    ``repart_from`` shift geometry and the kernel re-partitions it to ``shift`` in
    its input load (requires :func:`repart_in_kernel_ok`): no standalone conv pass
    and none of its relayout copies. The backward rematerialises the re-partitioned
    strips with the conv (:func:`repartition_packed`) and routes the feature
    cotangent back through its linear transpose, so gradients are exact.

    The cross path's kv (the OTHER stream's features) is read from the same packed
    strips through a stream-flipped BlockSpec — no jnp.flip, no second pack.

    ``mask_rows`` (spatial-sharding support, ops/pallas_pack_spmd.py): a traced
    (nh, nPairsW, *mask_inner) int8 operand REPLACING the statically-derived
    per-pair masks — ``xp``'s window rows may then be any contiguous row slice of
    the global geometry, with ``mask_rows`` holding exactly those rows' masks
    (the caller slices the global mask, or GSPMD slices it when both are sharded
    operands of a partitioned call). Forward-only: no custom VJP is attached on
    this path (the spatial fuser is an inference surface), and ``repart_from`` /
    dropout are unsupported with it.
    """
    s, b, nh, np_w, c, _ = xp.shape
    h, w = hw
    wh, ww = window
    d = dims_per_head
    # The head-batched kernels never slice q/k/v per head (heads are separated by
    # the block-diagonal iota masks and 128-aligned lane slices of p_cat), so the
    # per-head dim needs NO 8-sublane padding there: dp = d cuts the score/AV
    # contraction rows 64 -> heads*d (2.67x at stage 0, d=3). The per-head-loop
    # fallback still slices (heads*dp, 128) on sublanes and keeps the padding.
    dp = d if FUSED_HEAD_MATMULS else _dp_pad(d)
    # MLP hidden dim padded to at least 32 sublanes: the reference's decoder
    # stages use mlp_hidden = 4*in_dims (a013_ModelDefinition.py:196), which is 4
    # at the outermost decoder stage, and Mosaic handles hidden sizes <= 16 badly
    # (measured at stage-0 geometry: 381/384 ns/pair for hd=8/16 vs 286 at hd=32
    # and 307 at the encoder's real 96 — the kernel gets FASTER with 4x the MLP
    # FLOPs). Zero-padded hidden rows stay exactly zero through every supported
    # activation (act(0) = 0), so outputs are unchanged; the outside jnp.pad maps
    # the padded weight gradients back through autodiff.
    hd = max(32, ((w1.shape[-1] + 7) // 8) * 8)
    hd_pad = hd - w1.shape[-1]
    # transposed half-size score maps need 8-aligned sublane slices/concats of the
    # (2*heads*dp, ·) block-diagonal operands
    use_win64 = WIN64_SCORES and FUSED_HEAD_MATMULS and (num_heads * dp) % 8 == 0

    drop_rates = tuple(float(r) for r in drop_rates)
    has_drop = any(drop_rates)
    if has_drop:
        if not FUSED_HEAD_MATMULS:
            raise NotImplementedError(
                "hash dropout requires the head-batched attention path"
            )
        if drop_seed is None:
            raise ValueError("drop_rates > 0 requires a drop_seed")
        # f32 seed (< 2^24, exact in f32): custom_vjp then returns an ordinary
        # zero cotangent for it (int inputs would need float0 special-casing)
        seed_arr = jnp.asarray(drop_seed, jnp.float32).reshape(1)

    r_t = pack_rows_per_tile(
        nh, np_w, c, hd, num_heads, attn_drop=bool(drop_rates[0]),
        win64=use_win64, repart=repart_from is not None,
    )
    n_tiles = nh // r_t
    tile = r_t * np_w
    n = s * b

    repart = None
    if repart_from is not None:
        assert repart_in_kernel_ok((h, w), window, repart_from, shift), (
            (h, w), window, repart_from, shift,
        )
        tap_list, dr_side, dj_side, taps_np = _repart_tap_info(
            window, repart_from, shift
        )
        repart_wrap = use_wrap((h, w), window, True)
        repart = dict(
            tap_list=tap_list, dr_side=dr_side, dj_side=dj_side,
            wrap=repart_wrap, np_w=np_w,
        )

    def to_strips(a):  # (S, B, nH, nPw, C, 128) -> (n*n_tiles, TILE, C, 128)
        return a.reshape(n * n_tiles, tile, c, LANES)

    wrap = use_wrap((h, w), window, shift)
    if use_win64:
        mask_np, mask_n = _packed_mask_t((h, w), window, shift, wrap)
        bias_p = _packed_bias_t(bias)  # pad-token mask pre-folded (additive)
    else:
        mask_np, mask_n = _packed_mask((h, w), window, shift, wrap)
        bias_p = _packed_bias(bias)
    mask_per_pair = False
    if mask_rows is not None:
        # spatial sharding: xp holds a row slice of the global geometry and the
        # caller supplies exactly those rows' per-pair masks as a traced operand
        # ((1, 1, ...) = the geometry's shared mask, replicated). An operand
        # (not a closure constant) because custom_partitioning forbids consts —
        # and it is exactly the array GSPMD must slice alongside the strips.
        assert repart_from is None and not has_drop, (
            "mask_rows (spatial sharding) is a forward-only inference path"
        )
        assert mask_rows.shape[2:] == tuple(mask_np.shape[1:]), (
            mask_rows.shape, mask_np.shape,
        )
        if mask_shared:  # the geometry's single interior mask, replicated
            assert mask_rows.shape[:2] == (1, 1), mask_rows.shape
            mask_n = 1
        else:
            # per-pair rows — note a 1-row shard of a 1-pair-wide geometry also
            # has shape (1, 1, ...), hence the explicit flag (shape sniffing
            # would silently fold a real edge/seam mask away)
            assert mask_rows.shape[:2] == (nh, np_w), (mask_rows.shape, nh, np_w)
            mask_n = nh * np_w
            mask_per_pair = True
        mask_rows = mask_rows.reshape(mask_n, *mask_rows.shape[2:])
    # all-interior win64 geometries need no mask input at all: the only masking
    # left (pad tokens) is already folded into the bias
    fold_mask = use_win64 and mask_n == 1 and not mask_per_pair
    bias_shape = tuple(bias_p.shape[1:])
    mask_inner = tuple(mask_np.shape[1:])

    def t_w(wmat):  # (S, C, inner) -> (S, heads*dp, C), transposed + head-padded
        wt = wmat.reshape(s, c, num_heads, d).transpose(0, 2, 3, 1)  # (S, H, d, C)
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, dp - d), (0, 0)))
        return wt.reshape(s, num_heads * dp, c)

    def t_b(bvec):  # (S, inner) -> (S, heads*dp, 1)
        bt = jnp.pad(bvec.reshape(s, num_heads, d), ((0, 0), (0, 0), (0, dp - d)))
        return bt.reshape(s, num_heads * dp, 1)

    def t_wp(wmat):  # (S, inner, C) -> (S, C, heads*dp)
        wt = wmat.reshape(s, num_heads, d, c).transpose(0, 3, 1, 2)  # (S, C, H, d)
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
        return wt.reshape(s, c, num_heads * dp)

    col = lambda a: a[..., None]  # (S, C) -> (S, C, 1)

    def feat_spec_pair(nt, tl):
        """(feat, feat_other) BlockSpecs for a grid with nt tiles of tl pairs each.

        feat_other reads the other stream's strip of the same array (the cross qkv
        swap, reference a002_AutoPathWinAtt.py:67-73); identity when S != 2."""
        own = pl.BlockSpec(
            (1, tl, c, LANES), lambda i, r: (i * nt + r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if s == 2:
            other = pl.BlockSpec(
                (1, tl, c, LANES),
                lambda i, r: (((1 - i // b) * b + i % b) * nt + r, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            other = own
        return own, other

    feat, feat_other = feat_spec_pair(n_tiles, tile)

    def stream_spec(shape, other=False):
        if other and s == 2:
            index = lambda i, r: (1 - i // b, *([0] * len(shape)))
        else:
            index = lambda i, r: (i // b, *([0] * len(shape)))
        return pl.BlockSpec((1, *shape), index, memory_space=pltpu.VMEM)

    if mask_n == 1:
        mask_spec = pl.BlockSpec(
            (1, *mask_inner), lambda i, r: (0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        mask_spec = pl.BlockSpec(
            (tile, *mask_inner), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
        )

    inner_p = num_heads * dp
    feat_inputs = [feat, feat_other] if cross else [feat]

    def make_repart_specs(rows_per_tile):
        # one-row halo ref over the row-granular view (n*nh, nPw, C, 128): reads
        # ONLY the adjacent window row per grid step (not a whole neighbour tile).
        # Wrap mode uses modular row indexing (the cyclic halo); pad mode clamps
        # and the kernel zeroes the edge contribution. Parametrised by the grid's
        # rows-per-tile so the backward's finer grid reuses it.
        def halo_row_idx(r):
            g = (
                r * rows_per_tile - 1
                if dr_side == -1 else (r + 1) * rows_per_tile
            )
            if repart_wrap:
                return g % nh
            return jnp.clip(g, 0, nh - 1)

        def halo_spec(other=False):
            if other and s == 2:
                idx = lambda i, r: (
                    ((1 - i // b) * b + i % b) * nh + halo_row_idx(r), 0, 0, 0,
                )
            else:
                idx = lambda i, r: (i * nh + halo_row_idx(r), 0, 0, 0)
            return pl.BlockSpec((1, np_w, c, LANES), idx, memory_space=pltpu.VMEM)

        taps_spec = pl.BlockSpec(
            (len(tap_list), LANES, LANES), lambda i, r: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return (
            [halo_spec(), halo_spec(other=True), taps_spec]
            if cross else [halo_spec(), taps_spec]
        )

    repart_specs = [] if repart is None else make_repart_specs(r_t)
    ln1kv_inputs = (
        [stream_spec((c, 1), other=cross), stream_spec((c, 1), other=cross)]
        if cross else []
    )
    def make_in_specs(feat_specs, mask_sp):
        return [
            *feat_specs,
            stream_spec((c, 1)), stream_spec((c, 1)),
            *ln1kv_inputs,
            stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
            stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
            stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
            stream_spec((c, inner_p)), stream_spec((c, 1)),
            stream_spec(bias_shape),
            mask_sp,
            stream_spec((c, 1)), stream_spec((c, 1)),
            stream_spec((hd, c)), stream_spec((hd, 1)),
            stream_spec((c, hd)), stream_spec((c, 1)),
        ]

    in_specs = make_in_specs([*feat_inputs, *repart_specs], mask_spec)

    static = dict(
        num_heads=num_heads, dp=dp, scale=d**-0.5, activation=activation,
        win64=use_win64, fold_mask=fold_mask, drop_rates=drop_rates,
    )
    fwd_static = dict(static, repart=repart) if repart is not None else static
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    f32 = jnp.float32
    inner_shapes = dict(
        w=(s, inner_p, c), b=(s, inner_p, 1), wp=(s, c, inner_p), cvec=(s, c, 1),
    )

    def _forward(feats, ln1s, ln1b, wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl,
                 bias_pa, ln2s, ln2b, w1a, b1l, w2a, b2l, *extra):
        # mask materialised inside the closure: a shared jnp constant would leak as a
        # tracer across the custom_vjp/remat boundary (mask_rows bypasses custom_vjp
        # entirely, so capturing the traced operand here is safe)
        mask_arr = mask_rows if mask_rows is not None else jnp.asarray(mask_np)
        if repart is not None:
            # halo refs are row-granular views of the SAME strips (free reshape);
            # the kv halo is the same view read through the stream-flipped spec
            taps_arr = jnp.asarray(taps_np, jnp.float32)
            halo = feats[0].reshape(n * nh, np_w, c, LANES)
            feat_args = (
                (feats[0], feats[1], halo, halo, taps_arr)
                if cross else (feats[0], halo, taps_arr)
            )
        else:
            feat_args = feats
        if cross:
            args = (*feat_args, ln1s, ln1b, ln1s, ln1b)
            kernel = _packed_fwd_kernel
        else:
            args = (*feat_args, ln1s, ln1b)
            kernel = _packed_fwd_kernel_self
        return pl.pallas_call(
            functools.partial(kernel, **fwd_static),
            grid=(n, n_tiles),
            in_specs=[*in_specs, seed_spec] if has_drop else in_specs,
            out_specs=feat,
            out_shape=jax.ShapeDtypeStruct((n * n_tiles, tile, c, LANES), xp.dtype),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(
            *args,
            wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl, bias_pa, mask_arr,
            ln2s, ln2b, w1a, b1l, w2a, b2l,
            *extra,
        )

    def _backward(res, g):
        (feats, ln1s, ln1b, wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl,
         bias_pa, ln2s, ln2b, w1a, b1l, w2a, b2l, *extra) = res
        mask_arr = jnp.asarray(mask_np)

        if repart is not None:
            # both backward routes need the repartition conv: as the remat of the
            # TO-geometry strips when the kernel can't fuse it, and (always) as
            # the linear map whose transpose routes the feature cotangent back to
            # the source geometry
            def rep_src(a):
                a6 = a.reshape(s, b, nh, np_w, c, LANES)
                r6 = repartition_packed(a6, window, (h, w), repart_from, shift)
                return r6.reshape(n * n_tiles, tile, c, LANES)

        # finer tiles than the forward: strips re-tile for free via a leading-dim
        # reshape. The head-BATCHED backward keeps ~6 all-head score-sized
        # (TILE, LANES, H*LANES) f32 tensors live (p/g_p/g_s + two matmul results),
        # far fewer than the per-head-loop accounting in bwd_split_factor — use a
        # matching estimate or the bwd degenerates to one pair per grid step.
        rep_pp = 6 * c * LANES * 4  # in-kernel repart residents per pair

        def pick_f(per_pair, budget, row_aligned):
            # smallest split factor whose tile fits the budget; row_aligned
            # additionally keeps whole window rows per tile (in-kernel repart)
            return next(
                (
                    f
                    for f in range(1, tile + 1)
                    if tile % f == 0
                    and (not row_aligned or (tile // f) % np_w == 0)
                    and (tile // f) * per_pair <= budget
                ),
                None,
            )

        if use_win64:
            # score-shaped tensors are (heads*TOK, LANES) — half the 128-lane
            # layout's; the (2*ip, hk) block-diagonal operands and their
            # cotangents are the other residents. PACK_BWD_BUDGET_SCALE (env)
            # A/Bs the tile size: the estimate is conservative vs Mosaic's real
            # buffer reuse, and the backward's finer tiles double its per-step
            # fixed cost vs the forward (round-5 session; fwd:bwd kernel wall
            # 10.3:25.3 ms at 224^2 bs=20 stage 0).
            hk = num_heads * TOK
            per_pair = (
                6 * hk * LANES * 4
                + 6 * (2 * inner_p) * hk * 4
                + (c + hd) * LANES * 16
            )
            if drop_rates[0]:
                per_pair += 3 * hk * LANES * 4
            budget = int(
                (80 << 20) * float(os.environ.get("PACK_BWD_BUDGET_SCALE", "1"))
            )
        elif FUSED_HEAD_MATMULS:
            lanes_all = num_heads * LANES
            per_pair = (
                6 * LANES * lanes_all * 4
                + 2 * (num_heads * 8) * lanes_all * 4
                + (c + hd) * LANES * 16
            )
            if drop_rates[0]:
                # attention keep-mask hash + the extra dropped-weights tensor
                per_pair += 3 * LANES * lanes_all * 4
            budget = 48 << 20
        else:
            per_pair = budget = None

        want_fuse = repart is not None and REPART_BWD_FUSE
        fuse_bwd = False
        if per_pair is not None:
            f_b = None
            if want_fuse:
                # prefer fusing the repart into the backward's input load
                # (whole-row tiles required); fall back to the remat conv
                f_b = pick_f(per_pair + rep_pp, budget, True)
                fuse_bwd = f_b is not None
            if f_b is None:
                f_b = pick_f(per_pair, budget, False) or tile
        else:
            f_b = bwd_split_factor(tile, LANES, num_heads)
            fuse_bwd = want_fuse and (tile // f_b) % np_w == 0

        if repart is not None and not fuse_bwd:
            # rematerialise the re-partitioned strips with the standalone conv
            # (bit-equal to the kernel's in-VMEM taps: both select exact values)
            # and run the unmodified backward kernel on them
            rep_x = rep_src(feats[0])
            feats = (rep_x, rep_x) if cross else (rep_x,)
        tile_b = tile // f_b
        n_tiles_b = n_tiles * f_b
        feat_b, feat_other_b = feat_spec_pair(n_tiles_b, tile_b)
        if mask_n == 1:
            mask_spec_b = mask_spec
        else:
            mask_spec_b = pl.BlockSpec(
                (tile_b, *mask_inner), lambda i, r: (r, 0, 0),
                memory_space=pltpu.VMEM,
            )
        feat_inputs_b = [feat_b, feat_other_b] if cross else [feat_b]
        repart_specs_b = make_repart_specs(tile_b // np_w) if fuse_bwd else []
        bwd_in_specs = make_in_specs(
            [*feat_inputs_b, *repart_specs_b], mask_spec_b
        )

        def retile(a):
            return a.reshape(n * n_tiles_b, tile_b, c, LANES)

        feats = tuple(retile(a) for a in feats)
        g = retile(g)

        if fuse_bwd:
            # FROM-geometry strips + the row-granular halo view (same data)
            taps_arr = jnp.asarray(taps_np, jnp.float32)
            halo = feats[0].reshape(n * nh, np_w, c, LANES)
            feat_args = (
                (feats[0], feats[1], halo, halo, taps_arr)
                if cross else (feats[0], halo, taps_arr)
            )
        else:
            feat_args = feats
        if cross:
            in_args = (*feat_args, ln1s, ln1b, ln1s, ln1b)
            kernel = _packed_bwd_kernel
        else:
            in_args = (*feat_args, ln1s, ln1b)
            kernel = _packed_bwd_kernel_self
        n_fg = len(feat_inputs)
        bwd_static = dict(static, repart=repart) if fuse_bwd else static
        outs = pl.pallas_call(
            functools.partial(kernel, batch=b, **bwd_static),
            grid=(n, n_tiles_b),
            in_specs=(
                [*bwd_in_specs, feat_b, seed_spec]
                if has_drop else [*bwd_in_specs, feat_b]
            ),
            out_specs=(
                *feat_inputs_b,
                stream_spec((c, 1)), stream_spec((c, 1)),
                stream_spec((c, 1), other=cross), stream_spec((c, 1), other=cross),
                stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
                stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
                stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
                stream_spec((c, inner_p)), stream_spec((c, 1)),
                stream_spec(bias_shape),
                stream_spec((c, 1)), stream_spec((c, 1)),
                stream_spec((hd, c)), stream_spec((hd, 1)),
                stream_spec((c, hd)), stream_spec((c, 1)),
            ),
            out_shape=(
                *([jax.ShapeDtypeStruct((n * n_tiles_b, tile_b, c, LANES), xp.dtype)]
                  * n_fg),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct(inner_shapes["w"], f32),
                jax.ShapeDtypeStruct(inner_shapes["b"], f32),
                jax.ShapeDtypeStruct(inner_shapes["w"], f32),
                jax.ShapeDtypeStruct(inner_shapes["b"], f32),
                jax.ShapeDtypeStruct(inner_shapes["w"], f32),
                jax.ShapeDtypeStruct(inner_shapes["b"], f32),
                jax.ShapeDtypeStruct(inner_shapes["wp"], f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct((s, *bias_shape), f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct(inner_shapes["cvec"], f32),
                jax.ShapeDtypeStruct((s, hd, c), f32),
                jax.ShapeDtypeStruct((s, hd, 1), f32),
                jax.ShapeDtypeStruct((s, c, hd), f32),
                jax.ShapeDtypeStruct((s, c, 1), f32),
            ),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(
            *in_args,
            wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl, bias_pa, mask_arr,
            ln2s, ln2b, w1a, b1l, w2a, b2l,
            g,
            *extra,
        )
        # back to the forward strip tiling (grads must match the residuals' shape)
        feat_grads = tuple(
            fg.reshape(n * n_tiles, tile, c, LANES) for fg in outs[:n_fg]
        )
        if _BWD_DEBUG is not None:  # test-only stash of raw kernel feat grads
            from jax.experimental import io_callback as _io_cb

            for fg in feat_grads:
                _io_cb(lambda a: _BWD_DEBUG.append(np.asarray(a)), None, fg)
        if repart is not None:
            # cotangent w.r.t. the SOURCE strips: transpose of the (linear)
            # re-partition — reversed taps with transposed selectors, here taken
            # directly from the conv's transpose rule
            src_aval = jax.ShapeDtypeStruct((n * n_tiles, tile, c, LANES), xp.dtype)
            t_fn = jax.linear_transpose(rep_src, src_aval)
            feat_grads = tuple(t_fn(fg)[0] for fg in feat_grads)
        (gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
         gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp,
         gbias, gln2s, gln2b, gw1, gb1, gw2, gb2) = outs[n_fg:]

        def cast(a, ref):
            return a.astype(ref.dtype)

        return (
            feat_grads,
            cast(gln1s_q + gln1s_kv, ln1s), cast(gln1b_q + gln1b_kv, ln1b),
            cast(gwq, wqh), cast(gbq, bqh),
            cast(gwk, wkh), cast(gbk, bkh),
            cast(gwv, wvh), cast(gbv, bvh),
            cast(gwp, wph), cast(gbp, bpl),
            cast(gbias, bias_pa),
            cast(gln2s, ln2s), cast(gln2b, ln2b),
            cast(gw1, w1a), cast(gb1, b1l),
            cast(gw2, w2a), cast(gb2, b2l),
            *(jnp.zeros_like(e) for e in extra),  # seed: no gradient
        )

    @jax.custom_vjp
    def core(*args):
        return _forward(*args)

    def core_fwd(*args):
        return _forward(*args), args

    core.defvjp(core_fwd, _backward)

    strips = to_strips(xp)
    # cross kv = the same strips read through the stream-flipped BlockSpec; the two
    # cotangents are summed into x by autodiff
    feats = (strips, strips) if cross else (strips,)
    call = _forward if mask_rows is not None else core  # mask_rows: forward-only
    out = call(
        feats,
        col(ln1_scale), col(ln1_bias),
        t_w(attn["wq"]), t_b(attn["bq"]),
        t_w(attn["wk"]), t_b(attn["bk"]),
        t_w(attn["wv"]), t_b(attn["bv"]),
        t_wp(attn["wp"]), col(attn["bp"]),
        bias_p,
        col(ln2_scale), col(ln2_bias),
        jnp.pad(jnp.swapaxes(w1, -1, -2), ((0, 0), (0, hd_pad), (0, 0))),
        jnp.pad(col(b1), ((0, 0), (0, hd_pad), (0, 0))),
        jnp.pad(jnp.swapaxes(w2, -1, -2), ((0, 0), (0, 0), (0, hd_pad))), col(b2),
        *((seed_arr,) if has_drop else ()),
    )

    return out.reshape(s, b, nh, np_w, c, LANES)


# -------------------------------------------------------------- repartition (fused)


@functools.lru_cache(maxsize=None)
def _repartition_matrices(
    window: Tuple[int, int], from_shift: bool, to_shift: bool
) -> Tuple[Tuple[int, int, np.ndarray], ...]:
    """Lane selector matrices for the packed normal<->shift window re-partition.

    The composition ``pack(to_shift) . unpack(from_shift)`` is a fixed, position-
    independent permutation of the packed layout: each real token of target window
    pair (r, p) comes from source pair (r+dr, p+dj) with (dr, dj) in a 2x2
    neighbourhood, at a lane determined only by the in-window offset deltas. Encoded
    as (dr, dj, M) triples with M (128, 128) one-hot-per-column:

        out[r, p] = sum_(dr,dj) in[r+dr, p+dj] @ M[dr,dj]

    The matmul runs the re-partition on the MXU *in the packed layout* — no
    transposes, no (8,128)-tile relayouts, unlike the unpack/pack reshape chains.
    Columns for pad-token lanes are zero (target pad lanes don't matter: they are
    masked as attention queries/keys and cropped at the final unpack — exactly like
    the garbage a block's residual path leaves in source pad lanes).
    """
    wh, ww = window
    top_f = wh - wh // 2 if from_shift else 0
    left_f = ww - ww // 2 if from_shift else 0
    top_t = wh - wh // 2 if to_shift else 0
    left_t = ww - ww // 2 if to_shift else 0
    dtop = top_f - top_t
    dleft = left_f - left_t
    mats: dict = {}
    for slot_t in (0, 1):
        for i_t in range(wh):
            for j_t in range(ww):
                lane_t = slot_t * TOK + i_t * ww + j_t
                ii = i_t + dtop
                dr, i_f = ii // wh, ii % wh
                jj = j_t + dleft
                coff, j_f = jj // ww, jj % ww
                cc = slot_t + coff
                dj, slot_f = cc // 2, cc % 2
                lane_f = slot_f * TOK + i_f * ww + j_f
                m = mats.setdefault((dr, dj), np.zeros((LANES, LANES), np.float32))
                m[lane_f, lane_t] = 1.0
    return tuple((dr, dj, m) for (dr, dj), m in sorted(mats.items()))


def repart_in_kernel_ok(
    hw: Tuple[int, int], window: Tuple[int, int], from_shift: bool, to_shift: bool
) -> bool:
    """Whether the normal<->shift re-partition can run inside the packed block
    kernel's input load (docs/ROADMAP.md session 8b: the ~10% e2e lever).

    Requirements of the in-kernel form (which reads a one-row halo ref through
    shifted BlockSpec index maps and pair-rolls inside the tile):

    - both geometries share the same (nh, nPairsW) grid, so the kernel's grid and
      the source strips line up one-to-one. With :data:`WRAP_SHIFT` on this holds
      for every pad-mode geometry (wrap is used exactly where the grids differ);
    - wrap mode additionally needs no dummy even-rounding rows/columns (the wrap
      cycle must be the whole strip grid for modular index maps to be the cyclic
      halo). True for every in-model stage map at the reference configs (224^2
      training: all real grids even; 512^2: wrap unprofitable -> pad mode).

    Anything else falls back to the standalone conv (:func:`repartition_packed`).
    """
    if from_shift == to_shift:
        return False
    gf = shift_pad_geometry(hw, window, from_shift)
    gt = shift_pad_geometry(hw, window, to_shift)
    if gf[2:] != gt[2:]:
        return False
    if use_wrap(hw, window, True):
        return _wrap_extent(hw, window) == (gf[2], gf[3])
    return True


def repart_in_kernel_profitable(hw: Tuple[int, int], window: Tuple[int, int]) -> bool:
    """Whether the in-kernel re-partition is a measured WIN (the model's gate).

    Correctness holds wherever :func:`repart_in_kernel_ok` is true, but
    profitability is geometry-dependent (one-v5e-chip measurements,
    docs/ROADMAP.md session 9):

    - pad mode (512^2-class maps): vs the standalone CONV (which XLA brackets
      with relayout copies) fusing into the kernel's input load was +5.4% e2e
      inference (116.5 -> 122.8 pairs/s at bs=128, session 9). Vs the standalone
      MOSAIC kernel (:func:`repartition_packed_pallas`, session 11 — no conv
      layout, no brackets) the fusion is a measured LOSS (130.25 vs 131.69
      pairs/s at 512^2 bs=128): it shrinks the block kernel's tiles (halo/tap
      VMEM residents) and pays in-kernel tap matmuls, while the standalone
      kernel shrinks nothing. Fusion therefore only remains profitable when the
      standalone Pallas route is disabled (``REPART_PALLAS=0`` -> conv form);
    - wrap mode (224^2-class maps, all window-multiple grids): the standalone
      forms are cheap (roll-assembly conv, or the Mosaic kernel) while fusion
      measured -2.4% on the 224^2 bs=20 train step (130.9 -> 134.1 ms).
    """
    if os.environ.get("REPART_FUSE", "1") == "0":  # profiling kill-switch
        return False
    if os.environ.get("REPART_PALLAS", "1") != "0":
        # standalone Mosaic repartition active -> in-kernel fusion never wins
        return False
    return repart_in_kernel_ok(hw, window, False, True) and not use_wrap(
        hw, window, True
    )


@functools.lru_cache(maxsize=None)
def _repart_tap_info(window: Tuple[int, int], from_shift: bool, to_shift: bool):
    """Static tap data for the in-kernel re-partition.

    Returns (tap_list, dr_side, dj_side, taps_np):
    tap_list[i] = (dr, dj) of taps_np[i]; dr/dj take values in {0, dr_side}/{0,
    dj_side} with dr_side, dj_side in {-1, +1} (the 2x2 neighbourhood of
    :func:`_repartition_matrices`).
    """
    terms = _repartition_matrices(window, from_shift, to_shift)
    tap_list = tuple((dr, dj) for dr, dj, _ in terms)
    drs = {dr for dr, _ in tap_list if dr != 0}
    djs = {dj for _, dj in tap_list if dj != 0}
    assert len(drs) <= 1 and len(djs) <= 1, (tap_list,)
    dr_side = drs.pop() if drs else -1
    dj_side = djs.pop() if djs else -1
    taps_np = np.stack([m for _, _, m in terms])
    return tap_list, dr_side, dj_side, taps_np


def _repart_apply(
    own, halo_row, taps_ref, *, np_w, tap_list, dr_side, dj_side, wrap
):
    """In-kernel packed re-partition: (TILE, C, LANES) f32 -> same, target geometry.

    ``own`` is the tile's from-geometry strip; ``halo_row`` (nPw, C, LANES) is the
    adjacent window row (previous row for dr_side=-1, next for +1) read through the
    row-granular halo ref. Wrap mode's modular halo index map makes it the cyclic
    halo everywhere; pad mode zero-fills it at the grid edge here (the clamped
    index map reads a valid row there, which must contribute nothing).
    All moves are leading-dim slices/concats (free under Mosaic); each tap is one
    (LANES, LANES) one-hot matmul on the MXU.
    """
    tile, c, lanes = own.shape
    r_t = tile // np_w  # whole-row tiles (the forward always; the backward when
    # its split factor keeps rows intact — guaranteed by the caller)
    x4 = own.reshape(r_t, np_w, c, lanes)
    if not wrap:
        r_id = pl.program_id(1)
        edge = (r_id == 0) if dr_side == -1 else (r_id == pl.num_programs(1) - 1)
        halo_row = jnp.where(edge, jnp.zeros_like(halo_row), halo_row)
    halo = halo_row[None]                              # (1, nPw, C, LANES)
    if r_t == 1:
        rows_sh = halo
    elif dr_side == -1:
        rows_sh = jnp.concatenate([halo, x4[:-1]], axis=0)
    else:
        rows_sh = jnp.concatenate([x4[1:], halo], axis=0)

    def pshift(a):
        if dj_side == -1:
            hp = a[:, -1:] if wrap else jnp.zeros_like(a[:, :1])
            return hp if np_w == 1 else jnp.concatenate([hp, a[:, :-1]], axis=1)
        hp = a[:, :1] if wrap else jnp.zeros_like(a[:, -1:])
        return hp if np_w == 1 else jnp.concatenate([a[:, 1:], hp], axis=1)

    srcs = {(0, 0): x4, (dr_side, 0): rows_sh}
    if any(dj for _, dj in tap_list):
        srcs[(0, dj_side)] = pshift(x4)
        srcs[(dr_side, dj_side)] = pshift(rows_sh)
    out = None
    for idx, tap in enumerate(tap_list):
        a = srcs[tap].reshape(tile, c, lanes)
        term = jax.lax.dot_general(
            a, taps_ref[idx].astype(jnp.float32),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out


def repartition_packed(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    from_shift: bool,
    to_shift: bool,
) -> jnp.ndarray:
    """Re-partition packed strips between the normal and shifted window geometries.

    xp: (S, B, nh_f, nPw_f, C, 128) packed for ``from_shift``; returns
    (S, B, nh_t, nPw_t, C, 128) packed for ``to_shift``. Equals
    ``pack(to) . crop . unpack(from)`` on every real pixel (pad lanes may hold
    garbage, which the target-geometry attention mask ignores). Differentiable by
    construction (plain einsums).
    """
    s, b, nh_f, npw_f, c, _ = xp.shape
    *_, nh_t, nw_t = shift_pad_geometry(hw, window, to_shift)
    npw_t = nw_t // 2
    terms = _repartition_matrices(window, from_shift, to_shift)

    if use_wrap(hw, window, from_shift or to_shift):
        # Wrap mode: both geometries share the unshifted grid, |dr|, |dj| <= 1, and
        # out-of-grid neighbourhood reads WRAP over the real window rows/columns
        # (the cyclic roll's seams). The selector matrices are unchanged — rolling
        # preserves every in-window offset — so the wrap is entirely in the halo:
        # row halos are the opposite-edge real rows; column halos are assembled in
        # window-column space (a halo PAIR holds two window columns, which for odd
        # real column counts live in different source pairs/slots), and an odd
        # count's dummy slot in the last real pair is pre-filled with wrap column 0
        # (the dj=0 slot-1 read of target column nw_real-1). Dummy even-rounding
        # rows/pairs are excluded from the wrap cycle (no real data), and dummy
        # TARGETS may read garbage — they are masked in attention and never
        # unpacked, exactly like the pad mode's halo reads.
        hp0, wp0 = _wrap_extent(hw, window)
        wh, ww = window
        nh_real, nw_real = hp0 // wh, wp0 // ww

        def col_strip(wc):  # window-column wc (mod real cols) as a TOK-lane strip
            pair, slot = divmod(wc % nw_real, 2)
            return xp[:, :, :, pair : pair + 1, :, slot * TOK : (slot + 1) * TOK]

        def halo_pair(wc0):  # halo pair holding window columns (wc0, wc0 + 1)
            return jnp.concatenate([col_strip(wc0), col_strip(wc0 + 1)], axis=-1)

        cols = [halo_pair(-2)]
        if nw_real % 2:
            last_p = (nw_real - 1) // 2
            filled = jnp.concatenate(
                [xp[:, :, :, last_p : last_p + 1, :, :TOK], col_strip(nw_real)],
                axis=-1,
            )
            cols += [xp[:, :, :, :last_p], filled, xp[:, :, :, last_p + 1 :]]
        else:
            cols += [xp]
        cols += [halo_pair(2 * npw_f)]
        xc = jnp.concatenate(cols, axis=3)

        zeros_rows = nh_t - nh_real
        rows = [
            xc[:, :, nh_real - 1 : nh_real],
            xc[:, :, :nh_real],
            xc[:, :, 0:1],
        ]
        if zeros_rows > 0:
            rows.append(jnp.zeros((s, b, zeros_rows, *xc.shape[3:]), xc.dtype))
        xpad = jnp.concatenate(rows, axis=2)
        hr, hc = 1, 1
    else:
        # zero halo so 2x2-neighbourhood reads at the borders contribute nothing —
        # expressed as the convolution's own explicit zero padding below (free: no
        # pad/slice materialisation). Halo depth notes: with even-rounded row
        # counts the target geometry can have up to two more (dummy) rows than the
        # source (e.g. nh 2 -> 3 -> 4) and the dr=0/1 taps then reach nh_f + 2 —
        # real pixels never live there, only masked dummy positions read the halo.
        hr = hc = 0
        xpad = xp
    # All taps in ONE dilated convolution. Each (dr, dj) term is a full-array
    # read + 128x128 lane matmul; as separate einsums XLA runs 4 bandwidth-bound
    # passes over the packed activations (measured ~710 GB/s each at 512^2). A
    # convolution over (row, pair) with the pair-column axis merged with c and
    # rhs_dilation=c reads the array once and contracts every tap on the MXU:
    # merged index m = p*c + cc, so a kernel tap at dilated offset dj*c reads
    # pair p+dj at the same cc. Bit-exactness is preserved: the selector
    # matrices are one-hot per target lane across all taps, so each output
    # element is one exact product plus exact zeros.
    dr0 = min(dr for dr, _, _ in terms)
    dj0 = min(dj for _, dj, _ in terms)
    kr = max(dr for dr, _, _ in terms) - dr0 + 1
    kp = max(dj for _, dj, _ in terms) - dj0 + 1
    kernel = np.zeros((kr, kp, LANES, LANES), np.float32)
    for dr, dj, m in terms:
        kernel[dr - dr0, dj - dj0] = m
    # conv padding (possibly negative = crop) aligns tap a=0 with offset dr0/dj0
    # and sizes the output to the target grid; the merged axis pads in units of c
    nh_in, npw_in = xpad.shape[2], xpad.shape[3]
    pad_r = (-(hr + dr0), (hr + dr0 + nh_t + kr - 1) - nh_in)
    pad_m = (-(hc + dj0) * c, ((hc + dj0 + npw_t + kp - 1) - npw_in) * c)
    xm = xpad.reshape(s * b, nh_in, npw_in * c, LANES)  # 8-aligned: pure bitcast
    out = jax.lax.conv_general_dilated(
        xm,
        jnp.asarray(kernel, xp.dtype),
        window_strides=(1, 1),
        padding=(pad_r, pad_m),
        rhs_dilation=(1, c),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xp.dtype,
    )
    return out.reshape(s, b, nh_t, npw_t, c, LANES)


# ---------------------------------------------------------------------------
# Standalone Pallas re-partition (the conv form's relayout-bracket killer)
# ---------------------------------------------------------------------------
#
# The one-dilated-conv form above is MXU-exact, but XLA assigns the conv a
# batch-second-minor operand layout its neighbours don't use, bracketing every
# call with relayout copies (docs/ROADMAP.md session 8b: ~3-4 ms per call at
# 512^2 bs=128 stage-0 shapes). A Mosaic kernel reads/writes the strips in
# their native {3,2,1,0} tiling, so the brackets vanish; the arithmetic is the
# identical tap matmuls (:func:`_repart_apply` — the same body the in-kernel
# fused form runs). Eligibility is :func:`repart_in_kernel_ok` (equal grids;
# the wrap cycle must be the whole grid), which holds at every in-model stage
# geometry of the reference configs; anything else falls back to the conv.


def _repart_rows_per_tile(nh: int, np_w: int, c: int) -> int:
    """Whole strip rows per grid step under a VMEM live-set budget: the body
    holds ~6 f32 strip views (own + row/pair-shifted + accumulator) plus the
    bf16 in/out blocks."""
    per_row = (6 * 4 + 2 * 2) * c * LANES * np_w
    r = max(1, min(nh, (64 << 20) // max(1, per_row)))
    while nh % r:
        r -= 1
    return r


def _repart_standalone_call(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    tap_list,
    dr_side: int,
    dj_side: int,
    taps_np: np.ndarray,
    wrap: bool,
    interpret: bool,
    taps_arr: Optional[jnp.ndarray] = None,  # traced operand (spmd: no consts)
) -> jnp.ndarray:
    s, b, nh, np_w, c, _ = xp.shape
    n = s * b
    r_t = _repart_rows_per_tile(nh, np_w, c)
    n_tiles = nh // r_t
    tile = r_t * np_w

    repart = dict(
        tap_list=tap_list, dr_side=dr_side, dj_side=dj_side,
        wrap=wrap, np_w=np_w,
    )

    def kernel(x_ref, halo_ref, taps_ref, o_ref):
        out = _repart_apply(
            x_ref[0].astype(jnp.float32),
            halo_ref[0].astype(jnp.float32),
            taps_ref,
            **repart,
        )
        o_ref[0] = out.astype(o_ref.dtype)

    def halo_row_idx(r):
        g = r * r_t - 1 if dr_side == -1 else (r + 1) * r_t
        if wrap:
            return g % nh
        return jnp.clip(g, 0, nh - 1)

    feat = pl.BlockSpec(
        (1, tile, c, LANES), lambda i, r: (i * n_tiles + r, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo = pl.BlockSpec(
        (1, np_w, c, LANES), lambda i, r: (i * nh + halo_row_idx(r), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    taps = pl.BlockSpec(
        (len(tap_list), LANES, LANES), lambda i, r: (0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[feat, halo, taps],
        out_specs=feat,
        out_shape=jax.ShapeDtypeStruct((n * n_tiles, tile, c, LANES), xp.dtype),
        compiler_params=tpu_compiler_params(),
        interpret=interpret,
    )(
        xp.reshape(n * n_tiles, tile, c, LANES),
        xp.reshape(n * nh, np_w, c, LANES),
        jnp.asarray(taps_np, jnp.float32) if taps_arr is None else taps_arr,
    )
    return out.reshape(s, b, nh, np_w, c, LANES)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def repartition_packed_pallas(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    from_shift: bool,
    to_shift: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`repartition_packed` as one Mosaic kernel (equal-grid geometries).

    Bit-equal to the conv form on every lane (each output element is one exact
    product plus exact zeros, in either form); gradient is the exact linear
    transpose (the same kernel with negated tap offsets and transposed
    selector matrices). Requires ``repart_in_kernel_ok(hw, window, ...)``.
    """
    assert repart_in_kernel_ok(hw, window, from_shift, to_shift), (
        hw, window, from_shift, to_shift,
    )
    tap_list, dr_side, dj_side, taps_np = _repart_tap_info(
        window, from_shift, to_shift
    )
    wrap = use_wrap(hw, window, True)
    return _repart_standalone_call(
        xp, window, hw, tap_list, dr_side, dj_side, taps_np, wrap, interpret
    )


def _repart_pallas_fwd(xp, window, hw, from_shift, to_shift, interpret=False):
    return (
        repartition_packed_pallas(xp, window, hw, from_shift, to_shift, interpret),
        None,
    )


def _repart_pallas_bwd(window, hw, from_shift, to_shift, interpret, _res, g):
    # exact linear transpose: out[r,p] = sum in[r+dr,p+dj] @ M  =>
    # d_in[r,p] = sum d_out[r-dr,p-dj] @ M^T (zero- or wrap-read like the fwd)
    tap_list, dr_side, dj_side, taps_np = _repart_tap_info(
        window, from_shift, to_shift
    )
    tap_list_t = tuple((-dr, -dj) for dr, dj in tap_list)
    taps_t = np.ascontiguousarray(np.swapaxes(taps_np, 1, 2))
    wrap = use_wrap(hw, window, True)
    return (
        _repart_standalone_call(
            g, window, hw, tap_list_t, -dr_side, -dj_side, taps_t, wrap, interpret
        ),
    )


repartition_packed_pallas.defvjp(_repart_pallas_fwd, _repart_pallas_bwd)


def repartition_packed_auto(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    from_shift: bool,
    to_shift: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Route a standalone re-partition to the Mosaic kernel where eligible
    (``REPART_PALLAS=0`` is the profiling kill-switch), else the conv form.

    Under :func:`pallas_pack_spmd.spatial_partitioning` the eligible kernel
    route goes through its GSPMD-partitionable wrapper (explicit ppermute
    strip-row halo); the conv fallback needs nothing — GSPMD shards convs
    with its own halo exchange."""
    if os.environ.get("REPART_PALLAS", "1") != "0" and repart_in_kernel_ok(
        hw, window, from_shift, to_shift
    ):
        from .pallas_pack_spmd import repartition_packed_spmd, spatial_spmd_active

        if spatial_spmd_active():
            return repartition_packed_spmd(
                xp, window, hw, from_shift, to_shift, interpret
            )
        return repartition_packed_pallas(
            xp, window, hw, from_shift, to_shift, interpret
        )
    return repartition_packed(xp, window, hw, from_shift, to_shift)
