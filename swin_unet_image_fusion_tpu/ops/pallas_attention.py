"""Fused window-attention Pallas TPU kernel.

One kernel application computes, for a strip of window rows, the reference's entire
window-attention pipeline (``/root/reference/a001_WindowAttention.py:448-474``):
window partition -> q/k/v projections -> scaled scores + relative-position bias
(+ shift mask) -> softmax -> AV -> output projection -> window un-partition.

The jnp composition (``models/layers.py:DualWindowAttention``) materialises the
partitioned copies and attention intermediates in HBM between XLA fusions; this kernel
keeps everything for a strip in VMEM: the feature strip is read once and the projected
strip written once — the layout churn that dominates the reference profile disappears.

Grid: (N, nH) where N = streams*batch folds the dual-stream axis and nH is the number
of window rows. Per-stream weights are stacked on a leading S axis and selected via the
grid index map (stream = n // batch), so cross/self routing stays a pure data question
(the caller passes kv = flip(x) for cross attention, exactly like the jnp path).

The cyclic roll stays outside the kernel (XLA lowers jnp.roll to a cheap copy that
fuses with the surrounding ops); the shift mask arrives as a per-row-strip constant.

Numerics: matmuls accumulate in fp32 (``preferred_element_type``), softmax in fp32,
masked scores are *set* to -1e10 (reference a001:310).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window import MASK_FILL_VALUE


def _attention_kernel(
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
    out_ref,
    *,
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    use_mask: bool,
):
    wh, ww = window
    t = wh * ww
    _, _, w_len, c = x_ref.shape  # block (1, wh, W, C)
    n_w = w_len // ww
    inner = num_heads * dims_per_head
    scale = dims_per_head**-0.5

    def to_windows(ref):
        strip = ref[0]  # (wh, W, C)
        s = strip.reshape(wh, n_w, ww, c).transpose(1, 0, 2, 3)  # (nW, wh, ww, C)
        return s.reshape(n_w * t, c)

    xw = to_windows(x_ref)
    kvw = to_windows(kv_ref)

    dtype = x_ref.dtype

    def proj(inp, w_ref, b_ref):
        y = jax.lax.dot_general(
            inp,
            w_ref[0].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + b_ref[0, 0].astype(jnp.float32)  # biases arrive as (1, 1, dim)

    q = proj(xw, wq_ref, bq_ref)  # (nW*T, inner) fp32
    k = proj(kvw, wk_ref, bk_ref)
    v = proj(kvw, wv_ref, bv_ref)

    # Mosaic tpu.matmul supports at most ONE batch dim: fold (window, head) together.
    def split(a):  # (nW*T, inner) -> (nW*heads, T, d)
        return (
            a.reshape(n_w, t, num_heads, dims_per_head)
            .transpose(0, 2, 1, 3)
            .reshape(n_w * num_heads, t, dims_per_head)
        )

    qh, kh, vh = split(q), split(k), split(v)

    scores = jax.lax.dot_general(
        qh,
        kh,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (nW*heads, T, T)

    scores = scores.reshape(n_w, num_heads, t, t)
    scores = scores + bias_ref[0][None, None, :, :].astype(jnp.float32)

    if use_mask:
        mask = mask_ref[...]  # (nW, T, T) int8/bool
        scores = jnp.where(
            mask[:, None, :, :] != 0, jnp.float32(MASK_FILL_VALUE), scores
        )

    weights = jax.nn.softmax(scores, axis=-1).reshape(n_w * num_heads, t, t)

    av = jax.lax.dot_general(
        weights.astype(dtype),
        vh.astype(dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (nW*heads, T, d)

    merged = (
        av.reshape(n_w, num_heads, t, dims_per_head)
        .transpose(0, 2, 1, 3)
        .reshape(n_w * t, inner)
    )
    out = jax.lax.dot_general(
        merged.astype(dtype),
        wp_ref[0].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0, 0].astype(jnp.float32)  # (nW*T, C)

    strip = out.reshape(n_w, wh, ww, c).transpose(1, 0, 2, 3).reshape(1, wh, w_len, c)
    out_ref[...] = strip.astype(out_ref.dtype)


def _attention_bwd_kernel(
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
    gkv_ref,
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
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    use_mask: bool,
    batch: int,
):
    """Flash-style backward: recompute the strip's forward in VMEM, then produce input
    grads (per strip) and weight/bias grads (accumulated across the sequential grid).
    """
    wh, ww = window
    t = wh * ww
    _, _, w_len, c = x_ref.shape
    n_w = w_len // ww
    inner = num_heads * dims_per_head
    scale = dims_per_head**-0.5
    dtype = x_ref.dtype

    def to_windows(ref):
        strip = ref[0]
        s = strip.reshape(wh, n_w, ww, c).transpose(1, 0, 2, 3)
        return s.reshape(n_w * t, c)

    xw = to_windows(x_ref).astype(jnp.float32)
    kvw = to_windows(kv_ref).astype(jnp.float32)
    gw_flat = to_windows(g_ref).astype(jnp.float32)  # (nW*T, C)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    wq = wq_ref[0].astype(jnp.float32)
    wk = wk_ref[0].astype(jnp.float32)
    wv = wv_ref[0].astype(jnp.float32)
    wp = wp_ref[0].astype(jnp.float32)

    # ---- recompute forward ----
    q = dot(xw, wq) + bq_ref[0, 0].astype(jnp.float32)
    k = dot(kvw, wk) + bk_ref[0, 0].astype(jnp.float32)
    v = dot(kvw, wv) + bv_ref[0, 0].astype(jnp.float32)

    # Mosaic tpu.matmul supports at most ONE batch dim: fold (window, head) together.
    def split(a):  # (nW*T, inner) -> (nW*heads, T, d)
        return (
            a.reshape(n_w, t, num_heads, dims_per_head)
            .transpose(0, 2, 1, 3)
            .reshape(n_w * num_heads, t, dims_per_head)
        )

    qh, kh, vh = split(q), split(k), split(v)

    def bdot(a, b, contract):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(contract, ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    scores = bdot(qh, kh, ((2,), (2,))) * scale  # (nW*heads, T, T)
    scores = scores.reshape(n_w, num_heads, t, t)
    scores = scores + bias_ref[0][None, None, :, :].astype(jnp.float32)
    if use_mask:
        mask = mask_ref[...]
        scores = jnp.where(
            mask[:, None, :, :] != 0, jnp.float32(MASK_FILL_VALUE), scores
        )
    p = jax.nn.softmax(scores, axis=-1).reshape(n_w * num_heads, t, t)

    av = bdot(p, vh, ((2,), (1,)))  # (nW*heads, T, d)
    merged = (
        av.reshape(n_w, num_heads, t, dims_per_head)
        .transpose(0, 2, 1, 3)
        .reshape(n_w * t, inner)
    )

    # ---- backward ----
    g_merged = dot(gw_flat, wp.T)  # (nW*T, inner)
    g_wp = dot(merged.T, gw_flat)  # (inner, C)
    g_bp = gw_flat.sum(axis=0)  # (C,)

    g_av = split(g_merged)  # (nW*heads, T, d)
    # dP = g_av @ v^T ; dV = P^T @ g_av
    g_p = bdot(g_av, vh, ((2,), (2,)))  # (nW*heads, T, T)
    g_vh = bdot(p, g_av, ((1,), (1,)))  # (nW*heads, T, d)

    tmp = jnp.sum(g_p * p, axis=-1, keepdims=True)
    g_s = p * (g_p - tmp)  # masked entries: p == 0 -> g_s == 0

    g_bias = jnp.sum(
        g_s.reshape(n_w, num_heads, t, t), axis=(0, 1)
    )  # (T, T)

    g_qh = bdot(g_s, kh, ((2,), (1,))) * scale
    g_kh = bdot(g_s, qh, ((1,), (1,))) * scale  # sum over T1: g_S^T q

    def unsplit(a):  # (nW*heads, T, d) -> (nW*T, inner)
        return (
            a.reshape(n_w, num_heads, t, dims_per_head)
            .transpose(0, 2, 1, 3)
            .reshape(n_w * t, inner)
        )

    g_q, g_k, g_v = unsplit(g_qh), unsplit(g_kh), unsplit(g_vh)

    g_xw = dot(g_q, wq.T)
    g_kvw = dot(g_k, wk.T) + dot(g_v, wv.T)

    g_wq = dot(xw.T, g_q)
    g_wk = dot(kvw.T, g_k)
    g_wv = dot(kvw.T, g_v)
    g_bq, g_bk, g_bv = g_q.sum(axis=0), g_k.sum(axis=0), g_v.sum(axis=0)

    def to_strip(flat):  # (nW*T, C) -> (1, wh, W, C)
        return (
            flat.reshape(n_w, wh, ww, c).transpose(1, 0, 2, 3).reshape(1, wh, w_len, c)
        )

    gx_ref[...] = to_strip(g_xw).astype(gx_ref.dtype)
    gkv_ref[...] = to_strip(g_kvw).astype(gkv_ref.dtype)

    # accumulate weight grads across the sequential grid; zero on the first visit of
    # each stream's block (grid order: last dim fastest -> r loops inside n)
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

    gwq_ref[0] += g_wq
    gbq_ref[0, 0] += g_bq
    gwk_ref[0] += g_wk
    gbk_ref[0, 0] += g_bk
    gwv_ref[0] += g_wv
    gbv_ref[0, 0] += g_bv
    gwp_ref[0] += g_wp
    gbp_ref[0, 0] += g_bp
    gbias_ref[0] += g_bias


def pallas_window_attention(
    x: jnp.ndarray,
    kv: jnp.ndarray,
    wq: jnp.ndarray,
    bq: jnp.ndarray,
    wk: jnp.ndarray,
    bk: jnp.ndarray,
    wv: jnp.ndarray,
    bv: jnp.ndarray,
    wp: jnp.ndarray,
    bp: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[np.ndarray],
    *,
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused window attention over stacked streams.

    x, kv: (S, B, H, W, C) with H % wh == 0, W % ww == 0 (the static shape plan
    guarantees this). Weights: wq/wk/wv (S, C, inner), wp (S, inner, C), biases
    (S, inner) / (S, C); bias (S, T, T) gathered rel-pos bias; mask (nWin, T, T)
    boolean (or None when not shifted). Returns (S, B, H, W, C).
    """
    s, b, h, w, c = x.shape
    wh, ww = window
    t = wh * ww
    n_rows = h // wh
    n_w = w // ww
    n = s * b
    inner = num_heads * dims_per_head

    if mask is None:
        mask_arr = jnp.zeros((n_rows * n_w, t, t), jnp.int8)
        use_mask = False
    else:
        mask_arr = jnp.asarray(mask, jnp.int8)
        use_mask = True

    def feat_spec():
        return pl.BlockSpec(
            (1, wh, w, c), lambda i, r: (i, r, 0, 0), memory_space=pltpu.VMEM
        )

    def stream_spec(shape):
        return pl.BlockSpec(
            (1, *shape), lambda i, r: (i // b, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    def mask_spec():
        return pl.BlockSpec(
            (n_w, t, t), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
        )

    static = dict(
        window=window,
        num_heads=num_heads,
        dims_per_head=dims_per_head,
        use_mask=use_mask,
    )

    def _forward(x, kv, wq, bq, wk, bk, wv, bv, wp, bp, bias):
        # Mosaic needs the last two block dims tile-divisible or full; lift (S, dim)
        # bias vectors to (S, 1, dim) so the per-stream block is (1, 1, dim).
        bq_, bk_, bv_, bp_ = (a[:, None, :] for a in (bq, bk, bv, bp))
        out = pl.pallas_call(
            functools.partial(_attention_kernel, **static),
            grid=(n, n_rows),
            in_specs=[
                feat_spec(), feat_spec(),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((inner, c)), stream_spec((1, c)),
                stream_spec((t, t)),
                mask_spec(),
            ],
            out_specs=feat_spec(),
            out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
            interpret=interpret,
        )(
            x.reshape(n, h, w, c), kv.reshape(n, h, w, c),
            wq, bq_, wk, bk_, wv, bv_, wp, bp_, bias, mask_arr,
        )
        return out.reshape(s, b, h, w, c)

    def _backward(res, g):
        x, kv, wq, bq, wk, bk, wv, bv, wp, bp, bias = res
        bq_, bk_, bv_, bp_ = (a[:, None, :] for a in (bq, bk, bv, bp))
        f32 = jnp.float32
        outs = pl.pallas_call(
            functools.partial(_attention_bwd_kernel, batch=b, **static),
            grid=(n, n_rows),
            in_specs=[
                feat_spec(), feat_spec(),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((inner, c)), stream_spec((1, c)),
                stream_spec((t, t)),
                mask_spec(),
                feat_spec(),
            ],
            out_specs=(
                feat_spec(), feat_spec(),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((c, inner)), stream_spec((1, inner)),
                stream_spec((inner, c)), stream_spec((1, c)),
                stream_spec((t, t)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
                jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
                jax.ShapeDtypeStruct((s, c, inner), f32),
                jax.ShapeDtypeStruct((s, 1, inner), f32),
                jax.ShapeDtypeStruct((s, c, inner), f32),
                jax.ShapeDtypeStruct((s, 1, inner), f32),
                jax.ShapeDtypeStruct((s, c, inner), f32),
                jax.ShapeDtypeStruct((s, 1, inner), f32),
                jax.ShapeDtypeStruct((s, inner, c), f32),
                jax.ShapeDtypeStruct((s, 1, c), f32),
                jax.ShapeDtypeStruct((s, t, t), f32),
            ),
            interpret=interpret,
        )(
            x.reshape(n, h, w, c), kv.reshape(n, h, w, c),
            wq, bq_, wk, bk_, wv, bv_, wp, bp_, bias, mask_arr,
            g.reshape(n, h, w, c),
        )
        gx, gkv, gwq, gbq, gwk, gbk, gwv, gbv, gwp, gbp, gbias = outs
        return (
            gx.reshape(s, b, h, w, c),
            gkv.reshape(s, b, h, w, c),
            gwq.astype(wq.dtype), gbq[:, 0].astype(bq.dtype),
            gwk.astype(wk.dtype), gbk[:, 0].astype(bk.dtype),
            gwv.astype(wv.dtype), gbv[:, 0].astype(bv.dtype),
            gwp.astype(wp.dtype), gbp[:, 0].astype(bp.dtype),
            gbias.astype(bias.dtype),
        )

    @jax.custom_vjp
    def core(x, kv, wq, bq, wk, bk, wv, bv, wp, bp, bias):
        return _forward(x, kv, wq, bq, wk, bk, wv, bv, wp, bp, bias)

    def core_fwd(*args):
        return _forward(*args), args

    core.defvjp(core_fwd, _backward)
    return core(x, kv, wq, bq, wk, bk, wv, bv, wp, bp, bias)
