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
packed layout. Forward-only (inference path); training uses the NHWC kernels.

Odd window counts: nW is padded with one fully-masked dummy window column (zeros),
cropped again after unpacking.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import tpu_compiler_params
from .window import MASK_FILL_VALUE

LN_EPS = 1e-5
TOK = 64  # tokens per window slot (49 real + 15 masked pad)
LANES = 2 * TOK  # two windows per lane register


def _dp_pad(d: int) -> int:
    """Per-head dim padded to the 8-sublane boundary."""
    return ((d + 7) // 8) * 8


def pack_rows_per_tile(n_rows: int, n_pairs_w: int, c: int, hd: int,
                       budget_bytes: int = 2 << 20) -> int:
    """Window-pair rows per grid step under a VMEM strip budget (fp32 accounting,
    counting the MLP hidden resident alongside the strip)."""
    best = 1
    for r in range(1, n_rows + 1):
        if n_rows % r == 0 and r * n_pairs_w * (c + hd) * LANES * 4 <= budget_bytes:
            best = r
    return best


# --------------------------------------------------------------------------- kernel


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
    bias_ref,     # (1, 128, 128) block-diagonal rel-pos bias
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
):
    _, tile, c, lanes = x_ref.shape
    x = x_ref[0].astype(jnp.float32)          # (TILE, C, 128)
    kv = kv_ref[0].astype(jnp.float32)

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

    bias = bias_ref[0].astype(jnp.float32)    # (128, 128)
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

    av_heads = []
    for h in range(num_heads):
        sl = slice(h * dp, (h + 1) * dp)      # 8-aligned sublane slice
        q = q_all[:, sl, :]                   # (TILE, dp, 128)
        k = k_all[:, sl, :]
        v = v_all[:, sl, :]
        s = bmm(q, k, ((1,), (1,))) * scale + bias[None]   # (TILE, 128, 128)
        s = jnp.where(mask != 0, jnp.float32(MASK_FILL_VALUE), s)
        p = jax.nn.softmax(s, axis=-1)
        av_heads.append(bmm(v, p, ((2,), (2,))))           # (TILE, dp, 128)
    av_all = jnp.concatenate(av_heads, axis=1)             # (TILE, heads*dp, 128)

    acc = bmm(bcast(wp_ref), av_all, ((2,), (1,)))         # (TILE, C, 128)
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
    m = bmm(bcast(w2_ref), hdn, ((2,), (1,))) + b2_ref[0].astype(jnp.float32)

    out_ref[...] = (y + m)[None].astype(out_ref.dtype)


def _packed_fwd_kernel(*refs, **kw):
    (x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, out) = refs
    _packed_block_fwd_body(x_ref, kv_ref, ln1s, ln1b, ln1kvs, ln1kvb, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                           out, **kw)


def _packed_fwd_kernel_self(*refs, **kw):
    (x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wp, bp,
     bias, mask, ln2s, ln2b, w1, b1, w2, b2, out) = refs
    _packed_block_fwd_body(x_ref, x_ref, ln1s, ln1b, ln1s, ln1b, wq, bq, wk, bk,
                           wv, bv, wp, bp, bias, mask, ln2s, ln2b, w1, b1, w2, b2,
                           out, **kw)


# ----------------------------------------------------------------- pack / unpack


def pack_windows_cmajor(
    x: jnp.ndarray, window: Tuple[int, int]
) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """(S, B, C, H, W) -> (S*B, nH, nPairsW, C, 128) with 2 windows per lane register.

    Token order within each 64-lane slot is the row-major (wh, ww) order the bias/mask
    machinery uses; tokens 49..63 are zero pad (masked in attention).
    """
    s, b, c, h, w = x.shape
    wh, ww = window
    t = wh * ww
    nh, nw = h // wh, w // ww
    if nw % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, ww)))  # dummy window col
        nw += 1
    np_w = nw // 2
    x = x.reshape(s, b, c, nh, wh, np_w, 2, ww)
    # -> (s, b, nh, np_w, c, pair, wh, ww)
    x = x.transpose(0, 1, 3, 5, 2, 6, 4, 7)
    x = x.reshape(s, b, nh, np_w, c, 2, t)
    x = jnp.pad(x, ((0, 0),) * 5 + ((0, 0), (0, TOK - t)))
    x = x.reshape(s, b, nh, np_w, c, LANES)
    return x, (nh, np_w, nw)


def unpack_windows_cmajor(
    xp: jnp.ndarray, window: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of :func:`pack_windows_cmajor` -> (S, B, C, H, W) cropped to hw."""
    s, b, nh, np_w, c, _ = xp.shape
    wh, ww = window
    t = wh * ww
    h, w = hw
    xp = xp.reshape(s, b, nh, np_w, c, 2, TOK)[..., :t]
    xp = xp.reshape(s, b, nh, np_w, c, 2, wh, ww)
    # inverse of (0,1,3,5,2,6,4,7)
    xp = xp.transpose(0, 1, 4, 2, 6, 3, 5, 7)
    xp = xp.reshape(s, b, c, nh * wh, np_w * 2 * ww)
    return xp[..., :w]


@functools.lru_cache(maxsize=None)
def _packed_mask(
    hw: Tuple[int, int], window: Tuple[int, int], shift: bool
) -> Tuple[np.ndarray, int]:
    """(nPairs or 1, 128, 128) int8 mask: cross-window blocks, token padding, the
    shift-window regions, and the dummy window column for odd nW."""
    from .window import shift_attention_mask

    h, w = hw
    wh, ww = window
    t = wh * ww
    nh, nw = h // wh, w // ww
    odd = nw % 2
    nw_p = nw + odd

    # fully masked except each window's own (T, T) block; pad tokens masked within it
    base = np.ones((LANES, LANES), np.int8)
    for o in (0, TOK):
        blk = np.zeros((TOK, TOK), np.int8)
        blk[:, t:] = 1  # pad-token keys
        blk[t:, :] = 1  # pad-token queries
        base[o : o + TOK, o : o + TOK] = blk

    if not shift and not odd:
        return base[None], 1

    shift_m = shift_attention_mask((h, w), window) if shift else None
    n_pairs = nh * (nw_p // 2)
    full = np.empty((n_pairs, LANES, LANES), np.int8)
    p = 0
    for r in range(nh):
        for j in range(nw_p // 2):
            m = base.copy()
            for slot, col in ((0, 2 * j), (1, 2 * j + 1)):
                o = slot * TOK
                if col >= nw:  # dummy window
                    m[o : o + TOK, o : o + TOK] = 1
                elif shift_m is not None:
                    widx = r * nw + col
                    m[o : o + t, o : o + t] |= shift_m[widx].astype(np.int8)
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


# ------------------------------------------------------------------- entry point


def pallas_packed_block(
    x: jnp.ndarray,
    *,
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
) -> jnp.ndarray:
    """One fused pre-norm Swin block on C-major stacked streams.

    x: (S, B, C, H, W) with H, W divisible by the window. Forward-only (no VJP):
    the packed path is the inference fast path; training uses the NHWC kernels.
    Returns (S, B, C, H, W).
    """
    s, b, c, h, w = x.shape
    wh, ww = window
    d = dims_per_head
    dp = _dp_pad(d)
    hd = w1.shape[-1]

    if shift:
        sh, sw = wh // 2, ww // 2
        x = jnp.roll(x, shift=(-sh, -sw), axis=(-2, -1))
    kv = jnp.flip(x, axis=0) if cross else None

    xp, (nh, np_w, _) = pack_windows_cmajor(x, window)
    kvp = pack_windows_cmajor(kv, window)[0] if cross else None

    r_t = pack_rows_per_tile(nh, np_w, c, hd)
    n_tiles = nh // r_t
    tile = r_t * np_w
    n = s * b

    def to_strips(a):  # (S, B, nH, nPw, C, 128) -> (n*n_tiles, TILE, C, 128)
        return a.reshape(n * n_tiles, tile, c, LANES)

    mask_np, mask_n = _packed_mask((h, w), window, shift)
    bias_p = _packed_bias(bias)

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

    feat = pl.BlockSpec(
        (1, tile, c, LANES), lambda i, r: (i * n_tiles + r, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def stream_spec(shape, other=False):
        if other and s == 2:
            index = lambda i, r: (1 - i // b, *([0] * len(shape)))
        else:
            index = lambda i, r: (i // b, *([0] * len(shape)))
        return pl.BlockSpec((1, *shape), index, memory_space=pltpu.VMEM)

    if mask_n == 1:
        mask_spec = pl.BlockSpec(
            (1, LANES, LANES), lambda i, r: (0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        mask_spec = pl.BlockSpec(
            (tile, LANES, LANES), lambda i, r: (r, 0, 0), memory_space=pltpu.VMEM
        )

    inner_p = num_heads * dp
    feat_inputs = [feat, feat] if cross else [feat]
    ln1kv_inputs = (
        [stream_spec((c, 1), other=cross), stream_spec((c, 1), other=cross)]
        if cross else []
    )
    in_specs = [
        *feat_inputs,
        stream_spec((c, 1)), stream_spec((c, 1)),
        *ln1kv_inputs,
        stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
        stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
        stream_spec((inner_p, c)), stream_spec((inner_p, 1)),
        stream_spec((c, inner_p)), stream_spec((c, 1)),
        stream_spec((LANES, LANES)),
        mask_spec,
        stream_spec((c, 1)), stream_spec((c, 1)),
        stream_spec((hd, c)), stream_spec((hd, 1)),
        stream_spec((c, hd)), stream_spec((c, 1)),
    ]

    kernel = _packed_fwd_kernel if cross else _packed_fwd_kernel_self
    ln_args = (
        (col(ln1_scale), col(ln1_bias), col(ln1_scale), col(ln1_bias))
        if cross
        else (col(ln1_scale), col(ln1_bias))
    )
    feats = (to_strips(xp), to_strips(kvp)) if cross else (to_strips(xp),)

    out = pl.pallas_call(
        functools.partial(
            kernel,
            num_heads=num_heads,
            dp=dp,
            scale=d**-0.5,
            activation=activation,
        ),
        grid=(n, n_tiles),
        in_specs=in_specs,
        out_specs=feat,
        out_shape=jax.ShapeDtypeStruct((n * n_tiles, tile, c, LANES), x.dtype),
        compiler_params=tpu_compiler_params(),
        interpret=interpret,
    )(
        *feats,
        *ln_args,
        t_w(attn["wq"]), t_b(attn["bq"]),
        t_w(attn["wk"]), t_b(attn["bk"]),
        t_w(attn["wv"]), t_b(attn["bv"]),
        t_wp(attn["wp"]), col(attn["bp"]),
        bias_p, jnp.asarray(mask_np),
        col(ln2_scale), col(ln2_bias),
        jnp.swapaxes(w1, -1, -2), col(b1),
        jnp.swapaxes(w2, -1, -2), col(b2),
    )

    out = out.reshape(s, b, nh, np_w, c, LANES)
    out = unpack_windows_cmajor(out, window, (h, w))
    if shift:
        out = jnp.roll(out, shift=(wh // 2, ww // 2), axis=(-2, -1))
    return out
