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

    def split(a):  # (nW*T, inner) -> (nW, heads, T, d)
        return a.reshape(n_w, t, num_heads, dims_per_head).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)

    scores = jax.lax.dot_general(
        qh,
        kh,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * scale  # (nW, heads, T, T)

    scores = scores + bias_ref[0][None, None, :, :].astype(jnp.float32)

    if use_mask:
        mask = mask_ref[...]  # (nW, T, T) int8/bool
        scores = jnp.where(
            mask[:, None, :, :] != 0, jnp.float32(MASK_FILL_VALUE), scores
        )

    weights = jax.nn.softmax(scores, axis=-1)

    av = jax.lax.dot_general(
        weights.astype(dtype),
        vh.astype(dtype),
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (nW, heads, T, d)

    merged = av.transpose(0, 2, 1, 3).reshape(n_w * t, inner)
    out = jax.lax.dot_general(
        merged.astype(dtype),
        wp_ref[0].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0, 0].astype(jnp.float32)  # (nW*T, C)

    strip = out.reshape(n_w, wh, ww, c).transpose(1, 0, 2, 3).reshape(1, wh, w_len, c)
    out_ref[...] = strip.astype(out_ref.dtype)


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

    xf = x.reshape(n, h, w, c)
    kvf = kv.reshape(n, h, w, c)

    # Mosaic requires the last two block dims to be tile-divisible or span the full
    # array dim; lift 2-D (S, dim) bias vectors to (S, 1, dim) so the per-stream block
    # (1, 1, dim) satisfies that.
    bq, bk, bv, bp = (a[:, None, :] for a in (bq, bk, bv, bp))

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

    kernel = functools.partial(
        _attention_kernel,
        window=window,
        num_heads=num_heads,
        dims_per_head=dims_per_head,
        use_mask=use_mask,
    )

    out = pl.pallas_call(
        kernel,
        grid=(n, n_rows),
        in_specs=[
            feat_spec(),
            feat_spec(),
            stream_spec((c, inner)),
            stream_spec((1, inner)),
            stream_spec((c, inner)),
            stream_spec((1, inner)),
            stream_spec((c, inner)),
            stream_spec((1, inner)),
            stream_spec((inner, c)),
            stream_spec((1, c)),
            stream_spec((t, t)),
            pl.BlockSpec(
                (n_w, t, t), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=feat_spec(),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(xf, kvf, wq, bq, wk, bk, wv, bv, wp, bp, bias, mask_arr)

    return out.reshape(s, b, h, w, c)
