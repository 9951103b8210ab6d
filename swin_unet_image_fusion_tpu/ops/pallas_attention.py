"""Fused window-attention Pallas TPU kernel (with custom VJP).

Fuses the reference's attention pipeline (``/root/reference/a001_WindowAttention.py:
448-474``) — q/k/v projections, scaled scores + relative-position bias (+ shift mask),
softmax, AV, output projection — into one VMEM-resident kernel per strip of windows.
The jnp composition (``models/layers.py``) materialises q/k/v and the (nWin, heads, T,
T) score/softmax tensors in HBM between XLA fusions; at 512² stage 0 those score
tensors alone are ~0.8 GB per block — this kernel never writes them out.

Division of labour (driven by Mosaic's layout rules):
- the cyclic roll and the window partition stay OUTSIDE (XLA lowers them to cheap
  copies; re-splitting the W axis inside a kernel is an unsupported vector shape cast);
- windows are padded from T=49 to T_PAD=56 tokens so every in-kernel reshape
  merges/splits leading dims on 8-aligned sublane boundaries (Mosaic-supported);
  the 7 pad tokens are masked out of the softmax;
- per-head weights arrive pre-split as (S, heads, C, d): the per-head q/k/v matmuls
  then need no lane slicing, and summed over heads they cost exactly the same FLOPs
  as one combined projection;
- Mosaic's tpu.matmul supports at most ONE batch dim: all batched dots use the window
  tile as the single batch axis.

Grid: (N, nRows) with N = streams*batch; one step processes one row of windows.
Per-stream weights are selected via the grid index map (stream = n // batch), so
self/cross routing stays a data question (caller passes kv = flip(x) for cross).

The custom VJP recomputes the strip's forward in VMEM (flash-style — no softmax
weights stored) and accumulates weight/bias/rel-pos-table grads across the sequential
grid with first-visit zeroing.

Numerics: matmul accumulation and softmax in fp32; masked scores are *set* to -1e10
(reference a001:310).
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
from .window import MASK_FILL_VALUE, window_partition, window_unpartition

# Fast in-kernel softmax (fwd/recompute only; every hand-written backward consumes
# the softmax OUTPUT p, which is max-shift-independent): skip the max-subtraction
# pass — scores are fp32, the -1e10 mask/pad fill still underflows exp() to exactly
# 0 — and replace the per-element divide with a reciprocal broadcast-multiply.
# Removes ~2 of the ~5 VPU passes over the score tensors (the measured VPU floor of
# the small-C stages, docs/ROADMAP.md roofline). Fully-masked rows (dummy windows,
# pad tokens) get p=0 via the denominator epsilon instead of jax.nn.softmax's
# uniform junk — both are discarded at unpartition.
# PALLAS_FAST_SOFTMAX=0 restores jax.nn.softmax (A/B; ALSO the first thing to try
# if a training loss ever goes non-finite).
FAST_SOFTMAX = os.environ.get("PALLAS_FAST_SOFTMAX", "1") != "0"

# Overflow guard for the fast softmax: exp() overflows f32 at s ~ 88.7, so an
# unguarded scores-to-inf spike would turn inf/inf into NaN — silently, and
# default-ON in training where score scale evolves with the weights (round-4
# VERDICT, Weak #2). One jnp.minimum pass clamps scores at SOFTMAX_CLAMP:
# bit-exact whenever every score < the clamp (the empirical regime — the
# analytic worst-case bound from LN-output x weight norms is reported by
# tools/score_bound.py, and the 20-epoch recipe's trained blocks sit orders of
# magnitude below it), monotone saturation (finite, mask-preserving; scores past
# the clamp tie at the row's max probability) above it. The -1e10 mask fill must NOT be clamped from below:
# exp underflow to exact 0 IS the masking mechanism, so the clamp is one-sided.
# A row whose valid scores ALL sit below exp's underflow (~-104) still yields
# p=0 rather than a distribution — a benign degradation jax.nn.softmax shares
# in spirit (uniform junk) and unreachable orders of magnitude before the
# overflow cliff was. PALLAS_SOFTMAX_CLAMP=0 disables the guard (A/B);
# measured cost on one v5e chip: within run-to-run noise (docs/BENCHMARKS.md
# round-5 softmax-guard note).
SOFTMAX_CLAMP = float(os.environ.get("PALLAS_SOFTMAX_CLAMP", "80"))


def fast_softmax(s, axis=-1):
    """Softmax without the max-subtraction pass, overflow-clamped (FAST_SOFTMAX)."""
    if not FAST_SOFTMAX:
        return jax.nn.softmax(s, axis=axis)
    if SOFTMAX_CLAMP:
        s = jnp.minimum(s, jnp.float32(SOFTMAX_CLAMP))
    e = jnp.exp(s)
    return e * (1.0 / (jnp.sum(e, axis=axis, keepdims=True) + jnp.float32(1e-30)))

T_PAD_MULTIPLE = 8  # sublane alignment

# Mosaic's default scoped-VMEM limit is 16MiB; the deep stages (C=384, d=48, fp32
# accumulators + per-head weight tiles) legitimately need more, and v5e has 128MiB
# of VMEM. Same knob JAX's own flash-attention kernels raise.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def tpu_compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _padded_t(t: int) -> int:
    return ((t + T_PAD_MULTIPLE - 1) // T_PAD_MULTIPLE) * T_PAD_MULTIPLE


def shift_pad_geometry(
    hw: Tuple[int, int],
    window: Tuple[int, int],
    shift: bool,
    even_cols: bool = False,
    even_rows: bool = False,
) -> Tuple[int, int, int, int, int, int]:
    """Padded-map geometry for the roll-free shifted window partition.

    Shifted (SW-MSA) windows are computed WITHOUT ``torch.roll`` semantics
    (reference ``a001_WindowAttention.py:419-446``): a standard partition of the map
    zero-padded by ``window - shift`` on top/left is mathematically identical to
    roll + wrap-masking — the wrap window's two regions are masked apart by the
    reference (``a001:274-315``) so they never interact, the relative-position bias
    depends only on in-window position deltas, and the top/left padding places each
    edge region at exactly the in-window positions it occupies in the rolled wrap
    window. Dropping the roll kills two full-feature-map copies per shifted block.

    Returns (top, left, H', W', nh, nw); ``even_cols`` additionally rounds nw up to
    an even count (the lane-packed kernel packs two windows per 128-lane register).
    """
    h, w = hw
    wh, ww = window
    top = wh - wh // 2 if shift else 0
    left = ww - ww // 2 if shift else 0
    hp = top + h
    wp = left + w
    hp += (-hp) % wh
    wp += (-wp) % ww
    nh, nw = hp // wh, wp // ww
    if even_cols and nw % 2:
        nw += 1  # dummy (fully masked) window column so pairs pack evenly
        wp += ww
    if even_rows and nh % 2:
        # dummy (fully masked) window row: an even row count always admits a
        # multi-row kernel tile (prime counts like 37/19 at 512^2 forced one-row
        # grid steps, whose fixed per-step cost is ~25% at the win64 speed)
        nh += 1
        hp += wh
    return top, left, hp, wp, nh, nw


# Wrap-roll shifted windows for the NHWC kernel path (the reference's torch.roll
# formulation): when the map is window-multiple (always true for in-model stage
# maps, ops/shape_plan.py), the shifted partition cyclically rolls the map by
# (top, left) instead of zero-padding it — the window grid stays at the unshifted
# counts (e.g. 16 vs 25 windows at 28^2, 4 vs 9 at 14^2: the padded partition adds
# a window row AND column), and the wrap seams are masked by the classic
# same-region-only masks (:func:`_wrap_region_mask`). Mathematically identical to
# the padded partition (see :func:`shift_pad_geometry`); module flag for A/B.
WRAP_SHIFT = True


@functools.lru_cache(maxsize=None)
def _wrap_region_mask(hw: Tuple[int, int], window: Tuple[int, int]) -> np.ndarray:
    """(nWin, T, T) int8 same-region mask for the wrap-rolled shifted partition.

    After rolling by (+top, +left), grid row/column 0 hold the wrap seams: in-window
    rows < top (columns < left) wrapped from the opposite edge. Tokens attend only
    within their own (row-region, col-region) cell — the reference's wrap masking
    (a001_WindowAttention.py:274-315) with the regions reduced to the seam split."""
    h, w = hw
    wh, ww = window
    t = wh * ww
    top = wh - wh // 2
    left = ww - ww // 2
    n_rows, n_w = h // wh, w // ww
    out = np.zeros((n_rows * n_w, t, t), np.int8)
    for r in range(n_rows):
        rreg = np.repeat(r * wh + np.arange(wh) < top, ww)
        for cidx in range(n_w):
            creg = np.tile(cidx * ww + np.arange(ww) < left, wh)
            out[r * n_w + cidx] = (rreg[:, None] != rreg[None, :]) | (
                creg[:, None] != creg[None, :]
            )
    return out


@functools.lru_cache(maxsize=None)
def _shift_edge_mask(hw: Tuple[int, int], window: Tuple[int, int]) -> np.ndarray:
    """(nWin, T, T) int8 mask of the zero-padded edge tokens in the roll-free
    shifted partition (the only masking SW-MSA needs in that formulation)."""
    h, w = hw
    wh, ww = window
    t = wh * ww
    top, left, hp, wp, n_rows, n_w = shift_pad_geometry(hw, window, True)
    out = np.zeros((n_rows * n_w, t, t), np.int8)
    for r in range(n_rows):
        rows = r * wh + np.arange(wh)
        rv = (rows >= top) & (rows < top + h)
        for cidx in range(n_w):
            cols = cidx * ww + np.arange(ww)
            cv = (cols >= left) & (cols < left + w)
            bad = ~(rv[:, None] & cv[None, :]).reshape(t)
            out[r * n_w + cidx] = bad[None, :] | bad[:, None]
    return out


def rows_per_tile(n_rows: int, n_w: int, tp: int, c: int, budget_bytes: int = 2 << 20,
                  attn_drop: bool = False) -> int:
    """Window-rows per grid step: largest divisor of n_rows whose strip fits the VMEM
    budget. Deep stages have tiny rows (n_w as small as 2) — batching rows per step
    raises MXU occupancy and cuts grid overhead; stage 0 stays at 1 row."""
    per_window = tp * c * 4
    if attn_drop:
        # per-head keep-mask + hash intermediate (Mosaic does not reuse the
        # unrolled head loop's buffers)
        per_window += 2 * 8 * tp * tp * 4
    best = 1
    for r in range(1, n_rows + 1):
        if n_rows % r == 0 and r * n_w * per_window <= budget_bytes:
            best = r
    return best


# Backward-kernel VMEM budget, derived from the scoped-VMEM limit above (2/3 of it:
# the estimate in bwd_split_factor is calibrated, not exact, so leave headroom for
# double-buffered window IO). Module-level so tests can shrink it to force the
# re-tiled backward path on small shapes.
BWD_VMEM_BUDGET_BYTES = (VMEM_LIMIT_BYTES * 2) // 3


def bwd_split_factor(
    wt: int, tp: int, num_heads: int, budget_bytes: Optional[int] = None
) -> int:
    """Backward tile split: how many pieces to cut the forward tile into for the
    backward kernel's grid.

    The backward kernels keep ~O(heads) score-sized (WT, TP, TP) f32 tensors live at
    once (per-head softmax maps are all rematerialised before the gradient walk, and
    Mosaic does not reuse the unrolled per-head loop's buffers), so a forward-sized
    tile can exceed VMEM by an order of magnitude. Observed on v5e: a WT=256, TP=56,
    heads=8 stage needs 399M of VMEM against the 100M limit, i.e. ~16 score-sized
    tensors per head — which is the calibration constant used here. Strips re-tile for
    free (a leading-dim reshape), so the backward just runs a finer grid.
    """
    if budget_bytes is None:
        budget_bytes = BWD_VMEM_BUDGET_BYTES
    for f in range(1, wt + 1):
        if wt % f == 0 and (wt // f) * tp * tp * 4 * num_heads * 16 <= budget_bytes:
            return f
    return wt


def _attention_fwd_kernel(
    x_ref,       # (1, TILE, TP, C)
    kv_ref,      # (1, TILE, TP, C) — pass x_ref again for self-attention (no extra DMA
                 # happens for the self variant below, which omits this input entirely)
    wq_ref,      # (1, heads, C, d)
    bq_ref,      # (1, heads, 1, d)
    wk_ref,
    bk_ref,
    wv_ref,
    bv_ref,
    wp_ref,      # (1, heads, d, C)
    bp_ref,      # (1, 1, C)
    bias_ref,    # (1, TP, TP)
    mask_ref,    # (TILE or 1, TP, TP) int8  (includes the T-padding mask)
    out_ref,     # (1, TILE, TP, C)
    *,
    num_heads: int,
    dims_per_head: int,
    t_pad: int,
    attn_drop_rate: float = 0.0,
    seed_ref=None,
):
    _, tile, tp, c = x_ref.shape
    scale = dims_per_head**-0.5
    dtype = x_ref.dtype

    xw = x_ref[0].reshape(tile * tp, c)     # merge leading dim (tp % 8 == 0: free)
    kvw = kv_ref[0].reshape(tile * tp, c)

    if seed_ref is not None and attn_drop_rate > 0:
        # hash dropout on the softmax weights (ops/hash_dropout.py): masks keyed
        # by (seed, global window index, head, q, k) — tiling-independent
        seed = seed_ref[0].astype(jnp.int32)
        win0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def head_keep(h):
            return hdrop.tile_keep_mask(
                seed, hdrop.SITE_ATTN, win0, tile, (tp, tp), attn_drop_rate,
                intra_base=h * tp * tp,
            )
    else:
        head_keep = None

    bias = bias_ref[0].astype(jnp.float32)  # (TP, TP)
    mask = mask_ref[...]                    # (TILE or 1, TP, TP)

    def mm(a, b):  # (M, K) @ (K, N) on the MXU, fp32 accumulation
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def bmm(a, b, contract):  # single-batch-dim dot
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    acc = jnp.zeros((tile * tp, c), jnp.float32)
    for h in range(num_heads):
        q = mm(xw, wq_ref[0, h].astype(dtype)) + bq_ref[0, h, 0].astype(jnp.float32)
        k = mm(kvw, wk_ref[0, h].astype(dtype)) + bk_ref[0, h, 0].astype(jnp.float32)
        v = mm(kvw, wv_ref[0, h].astype(dtype)) + bv_ref[0, h, 0].astype(jnp.float32)
        q = q.reshape(tile, tp, dims_per_head)
        k = k.reshape(tile, tp, dims_per_head)
        v = v.reshape(tile, tp, dims_per_head)

        # scale folded into the (smaller) q operand — saves a full score-map pass
        s = bmm(q * jnp.float32(scale), k, ((2,), (2,))) + bias[None]  # (TILE, TP, TP)
        s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
        p = fast_softmax(s, axis=-1)
        if head_keep is not None:
            p = hdrop.apply_mask(p, head_keep(h), attn_drop_rate)

        av = bmm(p.astype(dtype), v.astype(dtype), ((2,), (1,)))  # (TILE, TP, d)
        acc = acc + mm(
            av.reshape(tile * tp, dims_per_head).astype(dtype),
            wp_ref[0, h].astype(dtype),
        )

    out = acc + bp_ref[0, 0].astype(jnp.float32)
    out_ref[...] = out.reshape(1, tile, tp, c).astype(out_ref.dtype)


def _attention_bwd_body(
    x_ref,
    kv_ref,
    wq_ref,
    bq_ref,
    wk_ref,
    bk_ref,
    wv_ref,
    bv_ref,
    wp_ref,
    bp_ref,
    bias_ref,
    mask_ref,
    g_ref,
    gx_ref,
    gkv_ref,   # None in the self variant: kv grads are folded into gx
    gwq_ref,
    gbq_ref,
    gwk_ref,
    gbk_ref,
    gwv_ref,
    gbv_ref,
    gwp_ref,
    gbp_ref,
    gbias_ref,
    *,
    num_heads: int,
    dims_per_head: int,
    t_pad: int,
    batch: int,
    attn_drop_rate: float = 0.0,
    seed_ref=None,
):
    """Recompute the strip's forward per head, then accumulate all grads."""
    _, tile, tp, c = x_ref.shape
    scale = dims_per_head**-0.5

    if seed_ref is not None and attn_drop_rate > 0:
        # identical masks to the forward under this (finer) grid: global window
        # index is tiling-invariant
        seed = seed_ref[0].astype(jnp.int32)
        win0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def head_keep(hh):
            return hdrop.tile_keep_mask(
                seed, hdrop.SITE_ATTN, win0, tile, (tp, tp), attn_drop_rate,
                intra_base=hh * tp * tp,
            )
    else:
        head_keep = None

    xw = x_ref[0].reshape(tile * tp, c).astype(jnp.float32)
    kvw = kv_ref[0].reshape(tile * tp, c).astype(jnp.float32)
    g = g_ref[0].reshape(tile * tp, c).astype(jnp.float32)

    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[...]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mm_tn(a, b):  # a^T @ b for (M, K)->(K, M) style grads
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(0) % batch == 0)

    @pl.when(first)
    def _():
        gwq_ref[...] = jnp.zeros_like(gwq_ref)
        gbq_ref[...] = jnp.zeros_like(gbq_ref)
        gwk_ref[...] = jnp.zeros_like(gwk_ref)
        gbk_ref[...] = jnp.zeros_like(gbk_ref)
        gwv_ref[...] = jnp.zeros_like(gwv_ref)
        gbv_ref[...] = jnp.zeros_like(gbv_ref)
        gwp_ref[...] = jnp.zeros_like(gwp_ref)
        gbp_ref[...] = jnp.zeros_like(gbp_ref)
        gbias_ref[...] = jnp.zeros_like(gbias_ref)

    g_x_acc = jnp.zeros((tile * tp, c), jnp.float32)
    g_kv_acc = jnp.zeros((tile * tp, c), jnp.float32)
    g_bias_acc = jnp.zeros((tp, tp), jnp.float32)

    for h in range(num_heads):
        wq = wq_ref[0, h].astype(jnp.float32)
        wk = wk_ref[0, h].astype(jnp.float32)
        wv = wv_ref[0, h].astype(jnp.float32)
        wp = wp_ref[0, h].astype(jnp.float32)

        # recompute forward for this head
        q2 = mm(xw, wq) + bq_ref[0, h, 0].astype(jnp.float32)
        k2 = mm(kvw, wk) + bk_ref[0, h, 0].astype(jnp.float32)
        v2 = mm(kvw, wv) + bv_ref[0, h, 0].astype(jnp.float32)
        q = q2.reshape(tile, tp, dims_per_head)
        k = k2.reshape(tile, tp, dims_per_head)
        v = v2.reshape(tile, tp, dims_per_head)

        # scale folded into q inline (q itself stays unscaled — the g_q/g_k lines
        # below contract the UNSCALED q/k and carry their own *scale)
        s = bmm(q * jnp.float32(scale), k, ((2,), (2,))) + bias[None]
        s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
        p = fast_softmax(s, axis=-1)  # (TILE, TP, TP)
        if head_keep is not None:
            keep = head_keep(h)
            p_use = hdrop.apply_mask(p, keep, attn_drop_rate)
        else:
            keep = None
            p_use = p
        av = bmm(p_use, v, ((2,), (1,)))  # (TILE, TP, d)

        # backward for this head
        g_av2 = mm(g, wp.T)  # (tile*tp, d)
        gwp_ref[0, h] += mm_tn(av.reshape(tile * tp, dims_per_head), g)

        g_av = g_av2.reshape(tile, tp, dims_per_head)
        g_p = bmm(g_av, v, ((2,), (2,)))      # (TILE, TP, TP)
        g_v = bmm(p_use, g_av, ((1,), (1,)))  # (TILE, TP, d)

        if keep is not None:
            # AV consumed p_use = where(keep, p/q, 0): scale the softmax cotangent
            g_p = hdrop.apply_mask(g_p, keep, attn_drop_rate)
        tmp = jnp.sum(g_p * p, axis=-1, keepdims=True)
        g_s = p * (g_p - tmp)                 # zero at masked/pad entries (p==0)

        g_bias_acc = g_bias_acc + jnp.sum(g_s, axis=0)

        g_q = bmm(g_s, k, ((2,), (1,))) * scale
        g_k = bmm(g_s, q, ((1,), (1,))) * scale

        g_q2 = g_q.reshape(tile * tp, dims_per_head)
        g_k2 = g_k.reshape(tile * tp, dims_per_head)
        g_v2 = g_v.reshape(tile * tp, dims_per_head)

        g_x_acc = g_x_acc + mm(g_q2, wq.T)
        g_kv_acc = g_kv_acc + mm(g_k2, wk.T) + mm(g_v2, wv.T)

        gwq_ref[0, h] += mm_tn(xw, g_q2)
        gwk_ref[0, h] += mm_tn(kvw, g_k2)
        gwv_ref[0, h] += mm_tn(kvw, g_v2)
        gbq_ref[0, h, 0] += g_q2.sum(axis=0)
        gbk_ref[0, h, 0] += g_k2.sum(axis=0)
        gbv_ref[0, h, 0] += g_v2.sum(axis=0)

    gbp_ref[0, 0] += g.sum(axis=0)
    gbias_ref[0] += g_bias_acc
    if gkv_ref is None:  # self-attention: q and k/v grads land on the same input
        g_x_acc = g_x_acc + g_kv_acc
        gx_ref[...] = g_x_acc.reshape(1, tile, tp, c).astype(gx_ref.dtype)
    else:
        gx_ref[...] = g_x_acc.reshape(1, tile, tp, c).astype(gx_ref.dtype)
        gkv_ref[...] = g_kv_acc.reshape(1, tile, tp, c).astype(gkv_ref.dtype)


def _attention_bwd_kernel(*refs, **kw):
    """cross variant: distinct x / kv inputs and separate gx / gkv outputs."""
    if kw.get("attn_drop_rate", 0.0) > 0:
        # seed is the 14th input (appended after g); outputs follow it
        kw = dict(kw, seed_ref=refs[13])
        refs = refs[:13] + refs[14:]
    (x_ref, kv_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, g,
     gx, gkv, gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias) = refs
    _attention_bwd_body(x_ref, kv_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, g,
                        gx, gkv, gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias, **kw)


def _attention_bwd_kernel_self(*refs, **kw):
    """self variant: one input strip, kv grads folded into gx (one DMA saved each way)."""
    if kw.get("attn_drop_rate", 0.0) > 0:
        # seed is the 13th input (appended after g); outputs follow it
        kw = dict(kw, seed_ref=refs[12])
        refs = refs[:12] + refs[13:]
    (x_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, g,
     gx, gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias) = refs
    _attention_bwd_body(x_ref, x_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, g,
                        gx, None, gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias, **kw)


def _attention_fwd_kernel_cross(*refs, **kw):
    (x_ref, kv_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, *rest) = refs
    if kw.get("attn_drop_rate", 0.0) > 0:
        seed_ref, out = rest
        kw = dict(kw, seed_ref=seed_ref)
    else:
        (out,) = rest
    _attention_fwd_kernel(x_ref, kv_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask,
                          out, **kw)


def _attention_fwd_kernel_self(*refs, **kw):
    (x_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask, *rest) = refs
    if kw.get("attn_drop_rate", 0.0) > 0:
        seed_ref, out = rest
        kw = dict(kw, seed_ref=seed_ref)
    else:
        (out,) = rest
    _attention_fwd_kernel(x_ref, x_ref, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask,
                          out, **kw)


@functools.lru_cache(maxsize=None)
def _pad_key_mask(t: int, t_pad: int) -> np.ndarray:
    """(1, TP, TP) mask hiding the T->T_PAD pad tokens from every window's softmax."""
    m = np.zeros((1, t_pad, t_pad), np.int8)
    m[:, :, t:] = 1
    return m


def _full_mask(mask: Optional[np.ndarray], t: int, t_pad: int) -> Tuple[np.ndarray, int]:
    """Combine the shift mask (nWin, T, T) with the pad mask -> (nWin or 1, TP, TP)."""
    pad_m = _pad_key_mask(t, t_pad)
    if mask is None:
        return pad_m, 1
    n_win = mask.shape[0]
    full = np.zeros((n_win, t_pad, t_pad), np.int8)
    full[:, :t, :t] = mask.astype(np.int8)
    full |= pad_m
    return full, n_win


def pallas_window_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    wv: jnp.ndarray,
    bv: jnp.ndarray,
    wp: jnp.ndarray,
    bp: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    shift: bool = False,
    cross: bool = False,
    interpret: bool = False,
    attn_drop_rate: float = 0.0,
    drop_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused window attention over stacked streams.

    x: (S, B, H, W, C) with H, W divisible by the window (guaranteed by the static
    shape plan). ``cross=False`` selects the self-attention kernel variant (single
    strip DMA; kv grads folded into x's); ``cross=True`` reads k/v from the OTHER
    stream's strips of the same array via a stream-flipped BlockSpec (reference
    a002_AutoPathWinAtt.py:67-73) — no flip, no second windowing pass. ``shift``
    uses the roll-free shifted partition (see :func:`shift_pad_geometry`). Weights:
    wq/wk/wv (S, C, inner), wp (S, inner, C), biases (S, inner) / (S, C); bias:
    (S, T, T) gathered rel-pos bias. Returns (S, B, H, W, C). Differentiable
    (custom VJP).
    """
    s, b, orig_h, orig_w, c = x.shape
    wh, ww = window
    t = wh * ww
    tp = _padded_t(t)
    # wrap-roll shifted partition: only for window-multiple maps (in-model stage
    # maps always are); other sizes keep the zero-padded partition
    wrap = WRAP_SHIFT and shift and orig_h % wh == 0 and orig_w % ww == 0
    if wrap:
        top, left, *_ = shift_pad_geometry((orig_h, orig_w), window, True)
        h, w = orig_h, orig_w
        n_rows, n_w = h // wh, w // ww
        # outside the custom_vjp core: autodiff rolls the cotangent back
        x = jnp.roll(x, (top, left), axis=(2, 3))
    else:
        top, left, h, w, n_rows, n_w = shift_pad_geometry(
            (orig_h, orig_w), window, shift
        )
    if (h, w) != (orig_h, orig_w):
        # zero-pad for the shifted partition; autodiff handles the pad/crop outside
        # the custom_vjp core, and the edge mask hides the pad tokens
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (top, h - top - orig_h), (left, w - left - orig_w), (0, 0)),
        )
    n = s * b
    inner = num_heads * dims_per_head
    d = dims_per_head

    attn_drop_rate = float(attn_drop_rate)
    has_drop = attn_drop_rate > 0
    if has_drop:
        if drop_seed is None:
            raise ValueError("attn_drop_rate > 0 requires a drop_seed")
        # f32 seed (< 2^24, exact): custom_vjp then returns an ordinary zero
        # cotangent for it. Proj dropout is applied by the caller on the kernel
        # output (the kernel ends at proj+bias), matching a001:62-66.
        seed_arr = jnp.asarray(drop_seed, jnp.float32).reshape(1)

    r_t = rows_per_tile(n_rows, n_w, tp, c, attn_drop=has_drop)
    n_tiles = n_rows // r_t
    wt = r_t * n_w  # windows per grid step

    if wrap:
        edge_mask = _wrap_region_mask((orig_h, orig_w), window)
    else:
        edge_mask = _shift_edge_mask((orig_h, orig_w), window) if shift else None
    mask_np, mask_nwin = _full_mask(edge_mask, t, tp)

    # rel-pos bias padded to (S, TP, TP)
    bias_p = jnp.zeros((s, tp, tp), bias.dtype).at[:, :t, :t].set(bias)

    # per-head weight/bias splits (outside the kernel: no lane slicing inside)
    def split_heads_w(wmat):  # (S, C, inner) -> (S, heads, C, d)
        return wmat.reshape(s, c, num_heads, d).transpose(0, 2, 1, 3)

    def split_heads_wp(wmat):  # (S, inner, C) -> (S, heads, d, C)
        return wmat.reshape(s, num_heads, d, c)

    def split_heads_b(bvec):  # (S, inner) -> (S, heads, 1, d)
        return bvec.reshape(s, num_heads, 1, d)

    def to_padded_windows(a):  # (S, B, H, W, C) -> (S, B*nRows, nW, TP, C)
        aw = window_partition(a, window)  # (S, B*nH*nW, T, C)
        aw = aw.reshape(s, b * n_rows, n_w, t, c)
        return jnp.pad(aw, ((0, 0), (0, 0), (0, 0), (0, tp - t), (0, 0)))

    def from_padded_windows(aw):  # inverse
        aw = aw[:, :, :, :t, :].reshape(s, b * n_rows * n_w, t, c)
        return window_unpartition(aw, window, (h, w))

    def stream_spec(shape):
        return pl.BlockSpec(
            (1, *shape), lambda i, r: (i // b, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    if mask_nwin == 1:
        mask_spec = pl.BlockSpec(
            (1, tp, tp), lambda i, r: (0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        mask_spec = pl.BlockSpec(
            (wt, tp, tp), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
        )

    static = dict(
        num_heads=num_heads, dims_per_head=d, t_pad=tp,
        attn_drop_rate=attn_drop_rate,
    )
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    weight_specs = [
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, d, c)), stream_spec((1, c)),
        stream_spec((tp, tp)),
    ]

    same_kv = not cross

    def feat_spec_pair(nt, tl):
        """(feat, feat_other) specs; feat_other reads the other stream's strip of
        the same array (the cross qkv swap); identity when S != 2."""
        own = pl.BlockSpec(
            (1, tl, tp, c), lambda i, r: (i * nt + r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if s == 2:
            other = pl.BlockSpec(
                (1, tl, tp, c),
                lambda i, r: (((1 - i // b) * b + i % b) * nt + r, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            other = own
        return own, other

    feat, feat_other = feat_spec_pair(n_tiles, wt)
    feat_shape = jax.ShapeDtypeStruct((n * n_tiles, wt, tp, c), x.dtype)
    grad_shapes = (
        jax.ShapeDtypeStruct((s, num_heads, c, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, 1, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, c, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, 1, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, c, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, 1, d), jnp.float32),
        jax.ShapeDtypeStruct((s, num_heads, d, c), jnp.float32),
        jax.ShapeDtypeStruct((s, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((s, tp, tp), jnp.float32),
    )
    grad_specs = (
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
        stream_spec((num_heads, d, c)), stream_spec((1, c)),
        stream_spec((tp, tp)),
    )

    def split_all(wq, bq, wk, bk, wv, bv, wp, bp):
        return (
            split_heads_w(wq), split_heads_b(bq),
            split_heads_w(wk), split_heads_b(bk),
            split_heads_w(wv), split_heads_b(bv),
            split_heads_wp(wp), bp[:, None, :],
        )

    def _forward(feats, wq, bq, wk, bk, wv, bv, wp, bp, bias_p, *extra):
        # the mask constant is materialised inside each traced closure: a shared
        # jnp constant would leak as a tracer across the custom_vjp/remat boundary
        mask_arr = jnp.asarray(mask_np)
        (xf,) = feats
        xw = to_padded_windows(xf).reshape(n * n_tiles, wt, tp, c)
        # cross kv = the same strips read through the stream-flipped BlockSpec
        fw = [xw] if same_kv else [xw, xw]
        in_feat_specs = [feat] if same_kv else [feat, feat_other]
        kernel = _attention_fwd_kernel_self if same_kv else _attention_fwd_kernel_cross
        out = pl.pallas_call(
            functools.partial(kernel, **static),
            grid=(n, n_tiles),
            in_specs=(
                [*in_feat_specs, *weight_specs, mask_spec, seed_spec]
                if has_drop else [*in_feat_specs, *weight_specs, mask_spec]
            ),
            out_specs=feat,
            out_shape=feat_shape,
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(*fw, *split_all(wq, bq, wk, bk, wv, bv, wp, bp), bias_p, mask_arr, *extra)
        return from_padded_windows(out.reshape(s, b * n_rows, n_w, tp, c))

    def _backward(res, g):
        feats, wq, bq, wk, bk, wv, bv, wp, bp, bias_p, *extra = res
        mask_arr = jnp.asarray(mask_np)
        # finer tiles than the forward: the bwd kernel's live set is ~O(heads)
        # score-sized tensors per window (see bwd_split_factor)
        f_b = bwd_split_factor(wt, tp, num_heads)
        wt_b = wt // f_b
        n_tiles_b = n_tiles * f_b
        feat_b, feat_other_b = feat_spec_pair(n_tiles_b, wt_b)
        if mask_nwin == 1:
            mask_spec_b = mask_spec
        else:
            mask_spec_b = pl.BlockSpec(
                (wt_b, tp, tp), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
            )
        feat_shape_b = jax.ShapeDtypeStruct((n * n_tiles_b, wt_b, tp, c), x.dtype)
        (xf,) = feats
        xw = to_padded_windows(xf).reshape(n * n_tiles_b, wt_b, tp, c)
        fw = [xw] if same_kv else [xw, xw]
        in_feat_specs = [feat_b] if same_kv else [feat_b, feat_other_b]
        gw = to_padded_windows(g).reshape(n * n_tiles_b, wt_b, tp, c)
        kernel = _attention_bwd_kernel_self if same_kv else _attention_bwd_kernel
        n_feat_grads = 1 if same_kv else 2
        # the kv gradient writes back through the flipped spec, landing at the
        # physical strip it was read from; outside we sum the two contributions
        out_feat_specs = [feat_b] if same_kv else [feat_b, feat_other_b]
        outs = pl.pallas_call(
            functools.partial(kernel, batch=b, **static),
            grid=(n, n_tiles_b),
            in_specs=(
                [*in_feat_specs, *weight_specs, mask_spec_b, feat_b, seed_spec]
                if has_drop
                else [*in_feat_specs, *weight_specs, mask_spec_b, feat_b]
            ),
            out_specs=(*out_feat_specs, *grad_specs),
            out_shape=(*([feat_shape_b] * n_feat_grads), *grad_shapes),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(*fw, *split_all(wq, bq, wk, bk, wv, bv, wp, bp), bias_p, mask_arr, gw,
          *extra)
        feat_grads = outs[:n_feat_grads]
        gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias = outs[n_feat_grads:]

        def unsplit_w(a):  # (S, heads, C, d) -> (S, C, inner)
            return a.transpose(0, 2, 1, 3).reshape(s, c, inner)

        g_x = feat_grads[0]
        for fg in feat_grads[1:]:
            g_x = g_x + fg  # q-path + kv-path contributions to the same array
        g_x = from_padded_windows(g_x.reshape(s, b * n_rows, n_w, tp, c))
        return (
            (g_x,),
            unsplit_w(gwq).astype(wq.dtype), gbq.reshape(s, inner).astype(bq.dtype),
            unsplit_w(gwk).astype(wk.dtype), gbk.reshape(s, inner).astype(bk.dtype),
            unsplit_w(gwv).astype(wv.dtype), gbv.reshape(s, inner).astype(bv.dtype),
            gwp.reshape(s, inner, c).astype(wp.dtype),
            gbp[:, 0].astype(bp.dtype),
            gbias.astype(bias_p.dtype),
            *(jnp.zeros_like(e) for e in extra),  # seed: no gradient
        )

    @jax.custom_vjp
    def core(feats, wq, bq, wk, bk, wv, bv, wp, bp, bias_p, *extra):
        return _forward(feats, wq, bq, wk, bk, wv, bv, wp, bp, bias_p, *extra)

    def core_fwd(*args):
        return _forward(*args), args

    core.defvjp(core_fwd, _backward)
    out = core(
        (x,), wq, bq, wk, bk, wv, bv, wp, bp, bias_p,
        *((seed_arr,) if has_drop else ()),
    )
    if wrap:
        out = jnp.roll(out, (-top, -left), axis=(2, 3))
    elif (h, w) != (orig_h, orig_w):
        out = out[:, :, top : top + orig_h, left : left + orig_w, :]
    return out
