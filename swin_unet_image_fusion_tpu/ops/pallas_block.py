"""Fully fused Swin block Pallas kernel: LN -> window attention -> +residual ->
LN -> MLP -> +residual, one HBM read and one write per strip of windows.

This is the full-fusion variant of ``pallas_attention.py`` — the whole reference
``BasicBlock`` (``/root/reference/a005_BasicBlock.py:127-145``: two pre-norm residual
stages, ``a004_AddAndLayerNormWithOtherModule.py``) computes in VMEM. On top of never
materialising q/k/v/scores, this also keeps the LayerNorm outputs and the 4C-wide MLP
hidden activations on-chip; the MLP hidden alone is ~8 strip-copies of HBM traffic in
the composed path.

Cross-attention detail: the reference normalises each stream with its *own* LN before
the qkv swap (``a004:29-40`` then ``a002:67-73``), so the kernel receives the raw
flipped stream as kv plus the *other* stream's LN1 weights (selected by the grid index
map) and re-normalises it in VMEM — a cheap VPU recompute that keeps the kernel
single-pass.

Differentiable: a custom VJP recomputes the whole block in VMEM on the backward pass
(flash-style) and accumulates every parameter gradient across the sequential grid —
including the cross-stream LN1 weights, whose kv-side contributions are routed to the
*other* stream's accumulator slot by the output index map. Layout constraints are
identical to pallas_attention.py (windows pre-partitioned outside, T padded to 56,
per-head pre-split weights, single-batch-dim dots).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hash_dropout as hdrop
from .pallas_attention import (
    _full_mask,
    fast_softmax,
    _padded_t,
    _shift_edge_mask,
    bwd_split_factor,
    rows_per_tile,
    shift_pad_geometry,
    tpu_compiler_params,
)
from .window import MASK_FILL_VALUE, window_partition, window_unpartition

LN_EPS = 1e-5


def _block_fwd_body(
    x_ref,        # (1, TILE, TP, C) raw (rolled, padded-window) stream-s features
    kv_ref,       # (1, TILE, TP, C) raw features of the kv stream (flip(x) if cross)
    ln1s_ref,     # (1, 1, C) LN1 scale, stream s
    ln1b_ref,     # (1, 1, C) LN1 bias, stream s
    ln1kvs_ref,   # (1, 1, C) LN1 scale of the kv stream
    ln1kvb_ref,
    wq_ref,       # (1, heads, C, d)
    bq_ref,       # (1, heads, 1, d)
    wk_ref,
    bk_ref,
    wv_ref,
    bv_ref,
    wp_ref,       # (1, heads, d, C)
    bp_ref,       # (1, 1, C)
    bias_ref,     # (1, TP, TP)
    mask_ref,     # (TILE or 1, TP, TP)
    ln2s_ref,     # (1, 1, C)
    ln2b_ref,
    w1_ref,       # (1, C, Hd)
    b1_ref,       # (1, 1, Hd)
    w2_ref,       # (1, Hd, C)
    b2_ref,       # (1, 1, C)
    out_ref,      # (1, TILE, TP, C)
    *,
    num_heads: int,
    dims_per_head: int,
    activation: str,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    seed_ref=None,
):
    _, tile, tp, c = x_ref.shape
    scale = dims_per_head**-0.5
    dtype = x_ref.dtype

    rate_a, rate_p, rate_m = drop_rates
    if seed_ref is not None and any(drop_rates):
        # in-kernel hash dropout (ops/hash_dropout.py): masks keyed by
        # (seed, site, global window index, intra offset) — tiling-independent,
        # so the backward's finer grid regenerates the identical masks
        seed = seed_ref[0].astype(jnp.int32)
        win0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def site_keep(site, inner, rate, intra_base=0):
            return hdrop.tile_keep_mask(
                seed, site, win0, tile, inner, rate, intra_base=intra_base
            )

        def drop2(a2d, site, cols, rate):
            """Dropout on a (tile*tp, cols) tensor via per-window (tp, cols) masks."""
            keep = site_keep(site, (tp, cols), rate)
            return hdrop.apply_mask(
                a2d.reshape(tile, tp, cols), keep, rate
            ).reshape(tile * tp, cols)
    else:
        site_keep = drop2 = None

    x = x_ref[0].reshape(tile * tp, c).astype(jnp.float32)
    kv = kv_ref[0].reshape(tile * tp, c).astype(jnp.float32)

    def layer_norm(a, s_ref, b_ref):
        mu = jnp.mean(a, axis=-1, keepdims=True)
        var = jnp.mean((a - mu) ** 2, axis=-1, keepdims=True)
        an = (a - mu) * jax.lax.rsqrt(var + LN_EPS)
        return an * s_ref[0, 0].astype(jnp.float32) + b_ref[0, 0].astype(jnp.float32)

    ln_x = layer_norm(x, ln1s_ref, ln1b_ref).astype(dtype)
    if kv_ref is x_ref and ln1kvs_ref is ln1s_ref:
        ln_kv = ln_x  # self mode: reuse the normalised strip
    else:
        ln_kv = layer_norm(kv, ln1kvs_ref, ln1kvb_ref).astype(dtype)

    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[...]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def bmm(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # ---- attention on the normalised features ----
    acc = jnp.zeros((tile * tp, c), jnp.float32)
    for h in range(num_heads):
        q = mm(ln_x, wq_ref[0, h].astype(dtype)) + bq_ref[0, h, 0].astype(jnp.float32)
        k = mm(ln_kv, wk_ref[0, h].astype(dtype)) + bk_ref[0, h, 0].astype(jnp.float32)
        v = mm(ln_kv, wv_ref[0, h].astype(dtype)) + bv_ref[0, h, 0].astype(jnp.float32)
        q = q.reshape(tile, tp, dims_per_head)
        k = k.reshape(tile, tp, dims_per_head)
        v = v.reshape(tile, tp, dims_per_head)

        # scale folded into the (smaller) q operand — saves a full score-map pass
        s = bmm(q * jnp.float32(scale), k, ((2,), (2,))) + bias[None]
        s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
        p = fast_softmax(s, axis=-1)
        if site_keep is not None and rate_a > 0:
            p = hdrop.apply_mask(
                p, site_keep(hdrop.SITE_ATTN, (tp, tp), rate_a, h * tp * tp), rate_a
            )

        av = bmm(p.astype(dtype), v.astype(dtype), ((2,), (1,)))
        acc = acc + mm(
            av.reshape(tile * tp, dims_per_head).astype(dtype),
            wp_ref[0, h].astype(dtype),
        )

    proj = acc + bp_ref[0, 0].astype(jnp.float32)
    if drop2 is not None and rate_p > 0:
        proj = drop2(proj, hdrop.SITE_PROJ, c, rate_p)
    y = x + proj  # first residual

    # ---- MLP on the second pre-norm ----
    ln_y = layer_norm(y, ln2s_ref, ln2b_ref).astype(dtype)
    hdn = mm(ln_y, w1_ref[0].astype(dtype)) + b1_ref[0, 0].astype(jnp.float32)
    if activation == "elu":
        # jax.nn.elu lowers to expm1, which Mosaic TPU has no lowering for
        hdn = jnp.where(hdn > 0, hdn, jnp.exp(jnp.minimum(hdn, 0.0)) - 1.0)
    elif activation == "relu":
        hdn = jax.nn.relu(hdn)
    elif activation == "gelu":
        hdn = jax.nn.gelu(hdn)
    else:
        raise ValueError(activation)
    if drop2 is not None and rate_m > 0:
        hdn = drop2(hdn, hdrop.SITE_MLP_HIDDEN, hdn.shape[-1], rate_m)
    m = mm(hdn.astype(dtype), w2_ref[0].astype(dtype)) + b2_ref[0, 0].astype(jnp.float32)
    if drop2 is not None and rate_m > 0:
        m = drop2(m, hdrop.SITE_MLP_OUT, c, rate_m)

    out = y + m
    out_ref[...] = out.reshape(1, tile, tp, c).astype(out_ref.dtype)



def _act_and_grad(z, activation):
    """activation(z) and d activation/dz."""
    if activation == "elu":
        # expm1-free ELU (Mosaic TPU lacks an expm1 lowering); exp input clamped so
        # the untaken branch cannot overflow
        ez = jnp.exp(jnp.minimum(z, 0.0))
        return jnp.where(z > 0, z, ez - 1.0), jnp.where(z > 0, 1.0, ez)
    if activation == "relu":
        return jax.nn.relu(z), (z > 0).astype(z.dtype)
    if activation == "gelu":
        inv_sqrt2 = 0.7071067811865476
        cdf = 0.5 * (1.0 + jax.lax.erf(z * inv_sqrt2))
        pdf = jnp.exp(-0.5 * z * z) * 0.3989422804014327
        return z * cdf, cdf + z * pdf
    raise ValueError(activation)


def _ln_fwd(a, scale, bias):
    mu = jnp.mean(a, axis=-1, keepdims=True)
    var = jnp.mean((a - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (a - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(g_out, xhat, inv, scale):
    """Returns (g_a, g_scale, g_bias) for out = xhat * scale + bias."""
    g_scale = jnp.sum(g_out * xhat, axis=0)
    g_bias = jnp.sum(g_out, axis=0)
    g_xhat = g_out * scale
    m1 = jnp.mean(g_xhat, axis=-1, keepdims=True)
    m2 = jnp.mean(g_xhat * xhat, axis=-1, keepdims=True)
    g_a = inv * (g_xhat - m1 - xhat * m2)
    return g_a, g_scale, g_bias


def _block_bwd_body(
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
    dims_per_head: int,
    activation: str,
    batch: int,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    seed_ref=None,
):
    """Recompute the fused block in VMEM, then backprop everything."""
    _, tile, tp, c = x_ref.shape
    scale_qk = dims_per_head**-0.5

    rate_a, rate_p, rate_m = drop_rates
    if seed_ref is not None and any(drop_rates):
        # identical masks to the forward under this (finer) grid: the hash is a
        # pure function of the global window index
        seed = seed_ref[0].astype(jnp.int32)
        win0 = (
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        ) * jnp.int32(tile)

        def site_keep(site, inner, rate, intra_base=0):
            return hdrop.tile_keep_mask(
                seed, site, win0, tile, inner, rate, intra_base=intra_base
            )

        def drop2(a2d, site, cols, rate):
            keep = site_keep(site, (tp, cols), rate)
            return hdrop.apply_mask(
                a2d.reshape(tile, tp, cols), keep, rate
            ).reshape(tile * tp, cols)
    else:
        site_keep = drop2 = None

    x = x_ref[0].reshape(tile * tp, c).astype(jnp.float32)
    kv = kv_ref[0].reshape(tile * tp, c).astype(jnp.float32)
    g = g_ref[0].reshape(tile * tp, c).astype(jnp.float32)

    s1 = ln1s_ref[0, 0].astype(jnp.float32)
    b1 = ln1b_ref[0, 0].astype(jnp.float32)
    s1o = ln1kvs_ref[0, 0].astype(jnp.float32)
    b1o = ln1kvb_ref[0, 0].astype(jnp.float32)
    s2 = ln2s_ref[0, 0].astype(jnp.float32)
    b2v = ln2b_ref[0, 0].astype(jnp.float32)
    w1 = w1_ref[0].astype(jnp.float32)
    b1m = b1_ref[0, 0].astype(jnp.float32)
    w2 = w2_ref[0].astype(jnp.float32)
    b2m = b2_ref[0, 0].astype(jnp.float32)

    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[...]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mm_tn(a, b):
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
        for r in (
            gln1s_q_ref, gln1b_q_ref, gln1s_kv_ref, gln1b_kv_ref,
            gwq_ref, gbq_ref, gwk_ref, gbk_ref, gwv_ref, gbv_ref,
            gwp_ref, gbp_ref, gbias_ref, gln2s_ref, gln2b_ref,
            gw1_ref, gb1_ref, gw2_ref, gb2_ref,
        ):
            r[...] = jnp.zeros_like(r)

    # ---- recompute forward ----
    ln_x, xhat1, inv1 = _ln_fwd(x, s1, b1)
    if gkv_ref is None:
        ln_kv, xhat1kv, inv1kv = ln_x, xhat1, inv1  # self mode
    else:
        ln_kv, xhat1kv, inv1kv = _ln_fwd(kv, s1o, b1o)

    # attention fwd per head, keeping per-head residuals in a python list (static)
    heads_res = []
    acc = jnp.zeros((tile * tp, c), jnp.float32)
    for h in range(num_heads):
        wq = wq_ref[0, h].astype(jnp.float32)
        wk = wk_ref[0, h].astype(jnp.float32)
        wv = wv_ref[0, h].astype(jnp.float32)
        wp = wp_ref[0, h].astype(jnp.float32)
        q = (mm(ln_x, wq) + bq_ref[0, h, 0].astype(jnp.float32)).reshape(tile, tp, dims_per_head)
        k = (mm(ln_kv, wk) + bk_ref[0, h, 0].astype(jnp.float32)).reshape(tile, tp, dims_per_head)
        v = (mm(ln_kv, wv) + bv_ref[0, h, 0].astype(jnp.float32)).reshape(tile, tp, dims_per_head)
        # scale folded into q inline (q stays unscaled for the *scale_qk grad lines)
        sc = bmm(q * jnp.float32(scale_qk), k, ((2,), (2,))) + bias[None]
        sc = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), sc)
        p = fast_softmax(sc, axis=-1)
        if site_keep is not None and rate_a > 0:
            p_use = hdrop.apply_mask(
                p, site_keep(hdrop.SITE_ATTN, (tp, tp), rate_a, h * tp * tp), rate_a
            )
        else:
            p_use = p
        av = bmm(p_use, v, ((2,), (1,)))
        acc = acc + mm(av.reshape(tile * tp, dims_per_head), wp)
        heads_res.append((q, k, v, p, p_use, av))

    proj = acc + bp_ref[0, 0].astype(jnp.float32)
    if drop2 is not None and rate_p > 0:
        proj = drop2(proj, hdrop.SITE_PROJ, c, rate_p)
    y = x + proj
    ln_y, xhat2, inv2 = _ln_fwd(y, s2, b2v)
    pre1 = mm(ln_y, w1) + b1m
    h1, dact = _act_and_grad(pre1, activation)
    if drop2 is not None and rate_m > 0:
        h1 = drop2(h1, hdrop.SITE_MLP_HIDDEN, h1.shape[-1], rate_m)

    # ---- backward ----
    # out = y + drop(drop(h1) @ w2 + b2m); h1 above is already dropped
    g_y = g
    g_m = drop2(g, hdrop.SITE_MLP_OUT, c, rate_m) if (drop2 is not None and rate_m > 0) else g
    gw2_ref[0] += mm_tn(h1, g_m)
    gb2_ref[0, 0] += g_m.sum(axis=0)
    g_h1 = mm(g_m, w2.T)
    if drop2 is not None and rate_m > 0:
        g_h1 = drop2(g_h1, hdrop.SITE_MLP_HIDDEN, g_h1.shape[-1], rate_m)
    g_pre1 = g_h1 * dact
    gw1_ref[0] += mm_tn(ln_y, g_pre1)
    gb1_ref[0, 0] += g_pre1.sum(axis=0)
    g_lny = mm(g_pre1, w1.T)
    g_y2, g_s2, g_b2 = _ln_bwd(g_lny, xhat2, inv2, s2)
    gln2s_ref[0, 0] += g_s2
    gln2b_ref[0, 0] += g_b2
    g_y = g_y + g_y2

    # attention backward: upstream grad of `acc` (+bp) is g_y through the proj drop
    g_proj = (
        drop2(g_y, hdrop.SITE_PROJ, c, rate_p)
        if (drop2 is not None and rate_p > 0)
        else g_y
    )
    g_lnx = jnp.zeros((tile * tp, c), jnp.float32)
    g_lnkv = jnp.zeros((tile * tp, c), jnp.float32)
    g_bias_acc = jnp.zeros((tp, tp), jnp.float32)
    gbp_ref[0, 0] += g_proj.sum(axis=0)
    for h in range(num_heads):
        wq = wq_ref[0, h].astype(jnp.float32)
        wk = wk_ref[0, h].astype(jnp.float32)
        wv = wv_ref[0, h].astype(jnp.float32)
        wp = wp_ref[0, h].astype(jnp.float32)
        q, k, v, p, p_use, av = heads_res[h]

        g_av2 = mm(g_proj, wp.T)
        gwp_ref[0, h] += mm_tn(av.reshape(tile * tp, dims_per_head), g_proj)
        g_av = g_av2.reshape(tile, tp, dims_per_head)
        g_p = bmm(g_av, v, ((2,), (2,)))
        g_v = bmm(p_use, g_av, ((1,), (1,)))
        if site_keep is not None and rate_a > 0:
            # AV consumed p_use = where(keep, p/q, 0): scale the softmax cotangent
            g_p = hdrop.apply_mask(
                g_p, site_keep(hdrop.SITE_ATTN, (tp, tp), rate_a, h * tp * tp), rate_a
            )
        tmp = jnp.sum(g_p * p, axis=-1, keepdims=True)
        g_s = p * (g_p - tmp)
        g_bias_acc = g_bias_acc + jnp.sum(g_s, axis=0)
        g_q = (bmm(g_s, k, ((2,), (1,))) * scale_qk).reshape(tile * tp, dims_per_head)
        g_k = (bmm(g_s, q, ((1,), (1,))) * scale_qk).reshape(tile * tp, dims_per_head)
        g_v2 = g_v.reshape(tile * tp, dims_per_head)

        g_lnx = g_lnx + mm(g_q, wq.T)
        g_lnkv = g_lnkv + mm(g_k, wk.T) + mm(g_v2, wv.T)
        gwq_ref[0, h] += mm_tn(ln_x, g_q)
        gwk_ref[0, h] += mm_tn(ln_kv, g_k)
        gwv_ref[0, h] += mm_tn(ln_kv, g_v2)
        gbq_ref[0, h, 0] += g_q.sum(axis=0)
        gbk_ref[0, h, 0] += g_k.sum(axis=0)
        gbv_ref[0, h, 0] += g_v2.sum(axis=0)

    gbias_ref[0] += g_bias_acc

    if gkv_ref is None:
        # self mode: q-side and kv-side LN gradients combine through the same LN
        g_x_ln, g_s1, g_b1 = _ln_bwd(g_lnx + g_lnkv, xhat1, inv1, s1)
        gln1s_q_ref[0, 0] += g_s1
        gln1b_q_ref[0, 0] += g_b1
        gln1s_kv_ref[0, 0] += jnp.zeros_like(g_s1)
        gln1b_kv_ref[0, 0] += jnp.zeros_like(g_b1)
        g_x_total = g_y + g_x_ln
        gx_ref[...] = g_x_total.reshape(1, tile, tp, c).astype(gx_ref.dtype)
    else:
        g_x_ln, g_s1, g_b1 = _ln_bwd(g_lnx, xhat1, inv1, s1)
        gln1s_q_ref[0, 0] += g_s1
        gln1b_q_ref[0, 0] += g_b1
        g_kv_ln, g_s1o, g_b1o = _ln_bwd(g_lnkv, xhat1kv, inv1kv, s1o)
        gln1s_kv_ref[0, 0] += g_s1o
        gln1b_kv_ref[0, 0] += g_b1o
        g_x_total = g_y + g_x_ln  # residual + LN1 path
        gx_ref[...] = g_x_total.reshape(1, tile, tp, c).astype(gx_ref.dtype)
        gkv_ref[...] = g_kv_ln.reshape(1, tile, tp, c).astype(gkv_ref.dtype)


def _block_fwd_kernel(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        *refs, seed_ref, out = refs
        kw = dict(kw, seed_ref=seed_ref)
    else:
        *refs, out = refs
    (x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2) = refs
    _block_fwd_body(x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv,
                    wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, out, **kw)


def _block_fwd_kernel_self(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        *refs, seed_ref, out = refs
        kw = dict(kw, seed_ref=seed_ref)
    else:
        *refs, out = refs
    (x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2) = refs
    _block_fwd_body(x_ref, x_ref, ln1s, ln1b, ln1s, ln1b, wq, bq, wk, bk, wv, bv,
                    wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, out, **kw)


def _block_bwd_kernel(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        # seed is appended after g (the 23rd input); outputs follow it
        kw = dict(kw, seed_ref=refs[23])
        refs = refs[:23] + refs[24:]
    (x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
     gx, gkv, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
     gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
     gln2s, gln2b, gw1, gb1, gw2, gb2) = refs
    _block_bwd_body(x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv,
                    wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
                    gx, gkv, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
                    gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
                    gln2s, gln2b, gw1, gb1, gw2, gb2, **kw)


def _block_bwd_kernel_self(*refs, **kw):
    if any(kw.get("drop_rates", (0.0, 0.0, 0.0))):
        # seed is appended after g (the 20th input); outputs follow it
        kw = dict(kw, seed_ref=refs[20])
        refs = refs[:20] + refs[21:]
    (x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
     gx, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
     gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
     gln2s, gln2b, gw1, gb1, gw2, gb2) = refs
    _block_bwd_body(x_ref, x_ref, ln1s, ln1b, ln1s, ln1b, wq, bq, wk, bk, wv, bv,
                    wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2, g,
                    gx, None, gln1s_q, gln1b_q, gln1s_kv, gln1b_kv,
                    gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias,
                    gln2s, gln2b, gw1, gb1, gw2, gb2, **kw)


def pallas_fused_block(
    x: jnp.ndarray,
    *,
    cross: bool,
    shift: bool,
    ln1_scale: jnp.ndarray,  # (S, C)
    ln1_bias: jnp.ndarray,
    attn: dict,  # wq/bq/wk/bk/wv/bv (S,C,inner)/(S,inner), wp (S,inner,C), bp (S,C), table
    bias: jnp.ndarray,  # gathered rel-pos bias (S, T, T)
    mask: Optional[np.ndarray],  # (nWin, T, T) or None
    ln2_scale: jnp.ndarray,
    ln2_bias: jnp.ndarray,
    w1: jnp.ndarray,  # (S, C, Hd)
    b1: jnp.ndarray,  # (S, Hd)
    w2: jnp.ndarray,  # (S, Hd, C)
    b2: jnp.ndarray,  # (S, C)
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    activation: str = "elu",
    interpret: bool = False,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    drop_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One fused pre-norm Swin block on stacked streams (S, B, H, W, C) -> same.

    Shift uses the roll-free shifted partition (see
    :func:`pallas_attention.shift_pad_geometry`); the cross path's k/v reads the
    other stream's strips of the same windowed array through a stream-flipped
    BlockSpec — no roll, no flip, no second windowing. ``mask`` is ignored (kept
    for signature stability); the edge mask is derived from the geometry.

    ``drop_rates`` = (attention, proj, mlp) dropout rates, applied in-kernel via
    hash masks (ops/hash_dropout.py) at the reference's four sites
    (a001_WindowAttention.py:58-66, a003_AutoPathMLP.py:26-31)."""
    s, b, orig_h, orig_w, c = x.shape
    wh, ww = window
    t = wh * ww
    tp = _padded_t(t)
    top, left, h, w, n_rows, n_w = shift_pad_geometry((orig_h, orig_w), window, shift)
    if (h, w) != (orig_h, orig_w):
        x = jnp.pad(
            x,
            ((0, 0), (0, 0), (top, h - top - orig_h), (left, w - left - orig_w), (0, 0)),
        )
    n = s * b
    d = dims_per_head
    hd = w1.shape[-1]

    drop_rates = tuple(float(r) for r in drop_rates)
    has_drop = any(drop_rates)
    if has_drop and drop_seed is None:
        raise ValueError("drop_rates > 0 requires a drop_seed")
    seed_arr = (
        jnp.asarray(drop_seed, jnp.float32).reshape(1) if has_drop else None
    )

    # VMEM budget counts the 4C-wide MLP hidden resident alongside the strip
    r_t = rows_per_tile(n_rows, n_w, tp, c + hd, attn_drop=bool(drop_rates[0]))
    n_tiles = n_rows // r_t
    wt = r_t * n_w

    edge_mask = _shift_edge_mask((orig_h, orig_w), window) if shift else None
    mask_np, mask_nwin = _full_mask(edge_mask, t, tp)
    bias_p = jnp.zeros((s, tp, tp), bias.dtype).at[:, :t, :t].set(bias)

    def split_heads_w(wmat):
        return wmat.reshape(s, c, num_heads, d).transpose(0, 2, 1, 3)

    def split_heads_wp(wmat):
        return wmat.reshape(s, num_heads, d, c)

    def split_heads_b(bvec):
        return bvec.reshape(s, num_heads, 1, d)

    def to_padded_windows(a):
        aw = window_partition(a, window)
        aw = aw.reshape(s, b * n_rows, n_w, t, c)
        return jnp.pad(aw, ((0, 0), (0, 0), (0, 0), (0, tp - t), (0, 0)))

    xw = to_padded_windows(x).reshape(n * n_tiles, wt, tp, c)
    # cross kv = the same strips read through the stream-flipped BlockSpec
    kvw = xw if cross else None

    def feat_spec_pair(nt, tl):
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

    def stream_spec(shape, other_stream=False):
        if other_stream and s == 2:
            index = lambda i, r: (1 - i // b, *([0] * len(shape)))
        else:
            index = lambda i, r: (i // b, *([0] * len(shape)))
        return pl.BlockSpec((1, *shape), index, memory_space=pltpu.VMEM)

    if mask_nwin == 1:
        mask_spec = pl.BlockSpec(
            (1, tp, tp), lambda i, r: (0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        mask_spec = pl.BlockSpec(
            (wt, tp, tp), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
        )

    kv_is_other = cross and s == 2

    # self mode drops the kv strip and the other-stream LN1 weight inputs entirely
    feat_inputs = [feat, feat_other] if cross else [feat]
    ln1kv_inputs = (
        [stream_spec((1, c), other_stream=kv_is_other),
         stream_spec((1, c), other_stream=kv_is_other)]
        if cross else []
    )
    def make_in_specs(feat_specs, mask_sp):
        return [
            *feat_specs,
            stream_spec((1, c)), stream_spec((1, c)),
            *ln1kv_inputs,
            stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
            stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
            stream_spec((num_heads, c, d)), stream_spec((num_heads, 1, d)),
            stream_spec((num_heads, d, c)), stream_spec((1, c)),
            stream_spec((tp, tp)),
            mask_sp,
            stream_spec((1, c)), stream_spec((1, c)),
            stream_spec((c, hd)), stream_spec((1, hd)),
            stream_spec((hd, c)), stream_spec((1, c)),
        ]

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    fwd_in_specs = make_in_specs(feat_inputs, mask_spec)
    if has_drop:
        fwd_in_specs = [*fwd_in_specs, seed_spec]
    static_drop = dict(drop_rates=drop_rates) if has_drop else {}

    def _forward(feats, ln1s, ln1b, wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl,
                 bias_pa, ln2s, ln2b, w1a, b1l, w2a, b2l, *extra):
        xw, kvw = (feats if cross else (feats[0], None))
        mask_arr = jnp.asarray(mask_np)
        if cross:
            args = (xw, kvw, ln1s, ln1b, ln1s, ln1b)
            kernel = _block_fwd_kernel
        else:
            args = (xw, ln1s, ln1b)
            kernel = _block_fwd_kernel_self
        return pl.pallas_call(
            functools.partial(
                kernel,
                num_heads=num_heads,
                dims_per_head=d,
                activation=activation,
                **static_drop,
            ),
            grid=(n, n_tiles),
            in_specs=fwd_in_specs,
            out_specs=feat,
            out_shape=jax.ShapeDtypeStruct((n * n_tiles, wt, tp, c), x.dtype),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(
            *args,
            wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl, bias_pa, mask_arr,
            ln2s, ln2b, w1a, b1l, w2a, b2l, *extra,
        )

    def _backward(res, g):
        (feats, ln1s, ln1b, wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl,
         bias_pa, ln2s, ln2b, w1a, b1l, w2a, b2l, *extra) = res
        mask_arr = jnp.asarray(mask_np)
        f32 = jnp.float32

        # finer tiles than the forward: the bwd live set is ~O(heads) score-sized
        # tensors per window (see pallas_attention.bwd_split_factor); strips re-tile
        # for free via a leading-dim reshape
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
        feat_inputs_b = [feat_b, feat_other_b] if cross else [feat_b]
        bwd_in_specs = make_in_specs(feat_inputs_b, mask_spec_b)
        bwd_tail_specs = [feat_b, seed_spec] if has_drop else [feat_b]

        def retile(a):
            return a.reshape(n * n_tiles_b, wt_b, tp, c)

        feats_b = tuple(retile(a) for a in feats)
        xw, kvw = (feats_b if cross else (feats_b[0], None))
        gw = retile(g)

        def out_stream_spec(shape, other_stream=False):
            return stream_spec(shape, other_stream=other_stream)

        if cross:
            in_args = (xw, kvw, ln1s, ln1b, ln1s, ln1b)
            kernel = _block_bwd_kernel
        else:
            in_args = (xw, ln1s, ln1b)
            kernel = _block_bwd_kernel_self
        outs = pl.pallas_call(
            functools.partial(
                kernel,
                num_heads=num_heads,
                dims_per_head=d,
                activation=activation,
                batch=b,
                **static_drop,
            ),
            grid=(n, n_tiles_b),
            in_specs=[*bwd_in_specs, *bwd_tail_specs],
            out_specs=(
                *feat_inputs_b,
                out_stream_spec((1, c)), out_stream_spec((1, c)),
                out_stream_spec((1, c), other_stream=kv_is_other),
                out_stream_spec((1, c), other_stream=kv_is_other),
                out_stream_spec((num_heads, c, d)), out_stream_spec((num_heads, 1, d)),
                out_stream_spec((num_heads, c, d)), out_stream_spec((num_heads, 1, d)),
                out_stream_spec((num_heads, c, d)), out_stream_spec((num_heads, 1, d)),
                out_stream_spec((num_heads, d, c)), out_stream_spec((1, c)),
                out_stream_spec((tp, tp)),
                out_stream_spec((1, c)), out_stream_spec((1, c)),
                out_stream_spec((c, hd)), out_stream_spec((1, hd)),
                out_stream_spec((hd, c)), out_stream_spec((1, c)),
            ),
            out_shape=(
                *([jax.ShapeDtypeStruct((n * n_tiles_b, wt_b, tp, c), x.dtype)]
                  * len(feat_inputs)),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, num_heads, c, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, 1, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, c, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, 1, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, c, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, 1, d), f32),
                jax.ShapeDtypeStruct((s, num_heads, d, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, tp, tp), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, c, hd), f32),
                jax.ShapeDtypeStruct((s, 1, hd), f32),
                jax.ShapeDtypeStruct((s, hd, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
            ),
            compiler_params=tpu_compiler_params(),
            interpret=interpret,
        )(
            *in_args,
            wqh, bqh, wkh, bkh, wvh, bvh, wph, bpl, bias_pa, mask_arr,
            ln2s, ln2b, w1a, b1l, w2a, b2l,
            gw, *extra,
        )
        n_fg = len(feat_inputs)
        # back to the forward strip tiling (grads must match the residuals' shape)
        feat_grads = tuple(
            fg.reshape(n * n_tiles, wt, tp, c) for fg in outs[:n_fg]
        )
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

    feats = (xw, kvw) if cross else (xw,)
    out = core(
        feats,
        ln1_scale[:, None, :], ln1_bias[:, None, :],
        split_heads_w(attn["wq"]), split_heads_b(attn["bq"]),
        split_heads_w(attn["wk"]), split_heads_b(attn["bk"]),
        split_heads_w(attn["wv"]), split_heads_b(attn["bv"]),
        split_heads_wp(attn["wp"]), attn["bp"][:, None, :],
        bias_p,
        ln2_scale[:, None, :], ln2_bias[:, None, :],
        w1, b1[:, None, :], w2, b2[:, None, :],
        *((seed_arr,) if has_drop else ()),
    )

    out = out.reshape(s, b * n_rows, n_w, tp, c)[:, :, :, :t, :]
    out = window_unpartition(out.reshape(s, b * n_rows * n_w, t, c), window, (h, w))
    if (h, w) != (orig_h, orig_w):
        out = out[:, :, top : top + orig_h, left : left + orig_w, :]
    return out
