"""Dual-stream building blocks (flax, NHWC, stream-stacked parameters).

The reference duplicates every per-stream module as two independent PyTorch submodules
(``window_attention_x`` / ``window_attention_y``, ``mlp_x_*`` / ``mlp_y_*``, two
LayerNorms — ``/root/reference/a002_AutoPathWinAtt.py:33-56``,
``a003_AutoPathMLP.py:21-44``, ``a004_AddAndLayerNormWithOtherModule.py:16-18``).

Here both modality streams live on a leading stacked axis S (normally 2) of a single
array ``(S, B, H, W, C)``, and every per-stream layer holds its weights stacked on the
same leading axis. One batched einsum then computes both streams on the MXU at once —
identical semantics (independent weights per stream), half the module tree, and the
cross-attention qkv swap of the reference (``a002_AutoPathWinAtt.py:67-73``) becomes a
flip of the stream axis.

Numerics parity notes:
- LayerNorm: trailing-channel, eps 1e-5, biased variance (torch semantics), computed in
  fp32 regardless of the compute dtype.
- scores are *set* to -1e10 under the shift mask (not additively masked).
- the relative-position bias table is 2-D and shared across heads (a001:72-82).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window import (
    apply_shift_mask,
    cyclic_shift,
    gather_relative_position_bias,
    shift_attention_mask,
    window_partition,
    window_unpartition,
)

# torch nn.init.kaiming_normal_ (a=0, fan_in, leaky_relu) == variance_scaling(2, fan_in, normal)
# reference a016_train.py:382-390
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

# For stream-stacked kernels of shape (S, in, out): the leading stream axis is a
# batch of independent per-stream Linear layers, NOT part of the receptive field.
# Without batch_axis=0 flax would compute fan_in = S*in, making init std sqrt(S)
# too small vs torch's per-stream kaiming_normal_ (std sqrt(2/in)) — which changes
# from-scratch training dynamics at lr=1e-2 on a 33M-param model.
stacked_kaiming_normal = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal", batch_axis=0
)


def matmul_precision(dtype) -> jax.lax.Precision | None:
    """fp32 compute asks the MXU for full-precision passes (parity with the fp32
    reference); bf16 compute uses the fast default path."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "elu":
        return jax.nn.elu  # torch nn.ELU(alpha=1) parity (A000_CONFIG.py:64)
    if name == "gelu":
        return jax.nn.gelu
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation: {name}")


class StackedDense(nn.Module):
    """Per-stream dense layer: kernel (S, in, out), applied as one batched einsum.

    Replaces the reference's per-stream ``nn.Linear`` / 1x1 ``nn.Conv2d`` pairs.
    Called with ``x=None`` it only declares and returns ``(kernel, bias)`` — used by
    the fused Pallas attention path, which consumes the raw stacked weights.
    """

    streams: int
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    in_features: Optional[int] = None  # required for param-access mode (x=None)
    cmajor: bool = False  # channels at axis 2 of (S, B, C, ...spatial) inputs

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray] = None):
        in_dim = self.in_features if x is None else x.shape[2 if self.cmajor else -1]
        kernel = self.param(
            "kernel",
            stacked_kaiming_normal,
            (self.streams, in_dim, self.features),
            jnp.float32,
        )
        if x is None:
            bias = (
                self.param(
                    "bias", nn.initializers.zeros, (self.streams, self.features), jnp.float32
                )
                if self.use_bias
                else jnp.zeros((self.streams, self.features), jnp.float32)
            )
            return kernel, bias
        y = jnp.einsum(
            "sbi...,sio->sbo..." if self.cmajor else "s...i,sio->s...o",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
            precision=matmul_precision(self.dtype),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.streams, self.features), jnp.float32
            )
            if self.cmajor:
                bias = bias.reshape(
                    (self.streams, 1, self.features) + (1,) * (x.ndim - 3)
                )
            else:
                bias = bias.reshape(
                    (self.streams,) + (1,) * (x.ndim - 2) + (self.features,)
                )
            y = y + bias.astype(self.dtype)
        return y


class StackedLayerNorm(nn.Module):
    """Per-stream LayerNorm over the trailing channel axis (torch semantics, fp32).

    Called with ``x=None`` (and ``features`` set) it only declares and returns
    ``(scale, bias)`` — used by the fused Pallas block path.
    """

    streams: int
    epsilon: float = 1e-5
    features: Optional[int] = None
    cmajor: bool = False  # channels at axis 2 of (S, B, C, ...spatial) inputs

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray]) -> jnp.ndarray:
        axis = 2 if self.cmajor else -1
        c = self.features if x is None else x.shape[axis]
        scale = self.param("scale", nn.initializers.ones, (self.streams, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.streams, c), jnp.float32)
        if x is None:
            return scale, bias
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axis, keepdims=True)
        var = xf.var(axis=axis, keepdims=True)  # biased, like torch LayerNorm
        xn = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.cmajor:
            shape = (self.streams, 1, c) + (1,) * (x.ndim - 3)
        else:
            shape = (self.streams,) + (1,) * (x.ndim - 2) + (c,)
        out = xn * scale.reshape(shape) + bias.reshape(shape)
        return out.astype(orig_dtype)


class DualWindowAttention(nn.Module):
    """Swin W-MSA / SW-MSA on both streams at once (reference a001_WindowAttention.py).

    Input/output: (S, B, H, W, C) NHWC. H and W must divide the window size (the static
    shape plan guarantees this). ``cross=True`` swaps k/v sources across streams
    (a002_AutoPathWinAtt.py:67-73): stream s queries with its own features and attends
    into the other stream's keys/values, using stream s's weights.
    """

    streams: int
    dims: int
    num_heads: int
    dims_per_head: int
    window_size: Tuple[int, int]
    shift: bool
    cross: bool
    use_qkv_bias: bool = True
    attention_drop_ratio: float = 0.0
    proj_drop_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "jnp"  # "jnp" | "pallas" | "pallas_interpret" (fused TPU kernel)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_params: bool = False,
    ) -> jnp.ndarray:
        s, b, h, w, c = x.shape
        wh, ww = self.window_size
        t = wh * ww
        inner = self.num_heads * self.dims_per_head

        if return_params:
            # declare the identical param tree and hand the raw stacked weights to the
            # fused Pallas block kernel (models/layers.py::BasicBlock pallas_block path)
            return self._declare_params(c)

        if self.impl.startswith("pallas"):
            return self._pallas_forward(x, deterministic=deterministic)

        if self.shift:
            x = cyclic_shift(x, self.window_size, reverse=False)

        kv_src = jnp.flip(x, axis=0) if self.cross else x

        xw = window_partition(x, self.window_size)  # (S, Bw, T, C)
        kvw = window_partition(kv_src, self.window_size) if self.cross else xw

        q = StackedDense(self.streams, inner, self.use_qkv_bias, self.dtype, name="q")(xw)
        k = StackedDense(self.streams, inner, self.use_qkv_bias, self.dtype, name="k")(kvw)
        v = StackedDense(self.streams, inner, self.use_qkv_bias, self.dtype, name="v")(kvw)

        bw = q.shape[1]

        def split_heads(a):
            return a.reshape(s, bw, t, self.num_heads, self.dims_per_head).transpose(
                0, 1, 3, 2, 4
            )  # (S, Bw, H, T, D)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        # scores in fp32 for a numerically stable softmax even under bf16 compute
        scores = jnp.einsum(
            "sbhtd,sbhud->sbhtu",
            q,
            k,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(self.dtype),
        ) * (self.dims_per_head**-0.5)

        # 2-D table shared across heads, randn init (a001:72-82); one table per stream
        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.normal(stddev=1.0),
            (self.streams, 2 * wh - 1, 2 * ww - 1),
            jnp.float32,
        )
        bias = gather_relative_position_bias(table, self.window_size)  # (S, T, T)
        scores = scores + bias[:, None, None, :, :]

        if self.shift:
            mask = shift_attention_mask((h, w), self.window_size)
            scores = apply_shift_mask(scores, mask)

        weights = jax.nn.softmax(scores, axis=-1)
        weights = nn.Dropout(self.attention_drop_ratio)(weights, deterministic=deterministic)

        out = jnp.einsum(
            "sbhtu,sbhud->sbhtd",
            weights.astype(self.dtype),
            v,
            preferred_element_type=self.dtype,
            precision=matmul_precision(self.dtype),
        )
        out = out.transpose(0, 1, 3, 2, 4).reshape(s, bw, t, inner)
        out = StackedDense(self.streams, self.dims, True, self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop_ratio)(out, deterministic=deterministic)

        out = window_unpartition(out, self.window_size, (h, w))  # (S, B, H, W, C)

        if self.shift:
            out = cyclic_shift(out, self.window_size, reverse=True)
        return out

    def _declare_params(self, c: int):
        """Declare the identical param tree to the jnp path; return raw weights."""
        inner = self.num_heads * self.dims_per_head
        wh, ww = self.window_size
        wq, bq = StackedDense(
            self.streams, inner, self.use_qkv_bias, self.dtype, in_features=c, name="q"
        )()
        wk, bk = StackedDense(
            self.streams, inner, self.use_qkv_bias, self.dtype, in_features=c, name="k"
        )()
        wv, bv = StackedDense(
            self.streams, inner, self.use_qkv_bias, self.dtype, in_features=c, name="v"
        )()
        wp, bp = StackedDense(
            self.streams, c, True, self.dtype, in_features=inner, name="proj"
        )()
        table = self.param(
            "rel_pos_bias_table",
            nn.initializers.normal(stddev=1.0),
            (self.streams, 2 * wh - 1, 2 * ww - 1),
            jnp.float32,
        )
        return dict(
            wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv, wp=wp, bp=bp, table=table
        )

    def _pallas_forward(
        self, x: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Fused-kernel path (ops/pallas_attention.py), differentiable (custom VJP)."""
        from ..ops.pallas_attention import pallas_window_attention

        s, b, h, w, c = x.shape

        p = self._declare_params(c)
        wq, bq, wk, bk = p["wq"], p["bq"], p["wk"], p["bk"]
        wv, bv, wp, bp = p["wv"], p["bv"], p["wp"], p["bp"]
        bias = gather_relative_position_bias(p["table"], self.window_size)  # (S, T, T)

        # attention-weights dropout runs in-kernel (hash masks, ops/hash_dropout.py);
        # proj dropout applies to the kernel output (the kernel ends at proj+bias,
        # reference a001_WindowAttention.py:58-66)
        drop_kwargs = {}
        if self.attention_drop_ratio and not deterministic:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 1 << 24, dtype=jnp.int32
            ).astype(jnp.float32)
            drop_kwargs = dict(
                attn_drop_rate=float(self.attention_drop_ratio), drop_seed=seed
            )

        # shift and the cross qkv swap are handled inside the kernel (roll-free
        # shifted partition; kv via a stream-flipped BlockSpec on the same strips)
        out = pallas_window_attention(
            x.astype(self.dtype),
            wq, bq, wk, bk, wv, bv, wp, bp, bias,
            window=self.window_size,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            shift=self.shift,
            cross=self.cross,
            interpret=self.impl == "pallas_interpret",
            **drop_kwargs,
        )
        return nn.Dropout(self.proj_drop_ratio)(out, deterministic=deterministic)


class DualMLP(nn.Module):
    """Per-stream 2-layer MLP (reference a003_AutoPathMLP.py: 1x1 convs on NCHW)."""

    streams: int
    dims: int
    hidden_dims: int
    activation: str = "elu"
    drop_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        return_params: bool = False,
    ) -> jnp.ndarray:
        if return_params:
            w1, b1 = StackedDense(
                self.streams, self.hidden_dims, True, self.dtype,
                in_features=self.dims, name="fc1",
            )()
            w2, b2 = StackedDense(
                self.streams, self.dims, True, self.dtype,
                in_features=self.hidden_dims, name="fc2",
            )()
            return dict(w1=w1, b1=b1, w2=w2, b2=b2)
        act = activation_fn(self.activation)
        x = StackedDense(self.streams, self.hidden_dims, True, self.dtype, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.drop_ratio)(x, deterministic=deterministic)
        x = StackedDense(self.streams, self.dims, True, self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_ratio)(x, deterministic=deterministic)
        return x


def pack_beneficial(c: int, w: int) -> bool:
    """Whether the lane-packed C-major path wins for a stage.

    Bandwidth rule: compare the (8, 128) HBM tile padding of NHWC (C on lanes) vs
    C-major (W on lanes). With the win64 packed kernels the kernel itself also wins
    big at small per-head dims (batched full-lane projections + fused LN/MLP vs the
    NHWC per-head loop whose d<16-lane outputs underfill the MXU), so mild C-major
    trunk padding (W >= 64, <= 2x) is accepted for C < 128 — measured +10.5% e2e at
    512^2 from packing the C=96 stage (docs/BENCHMARKS.md).

    C in [128, 256) (the 33M model's C=192 stages) is packed too: measured wins on
    BOTH hot paths (224^2 train 127.6 -> 121.7 ms/step at the 14^2 map, 512^2
    bs=128 inference 119.5 -> 124.3 pairs/s at the 32^2 map) — the packed strips
    keep tokens dense on lanes and run the fused block kernel, while NHWC pays
    1.33x lane padding plus per-call kernel overhead on tiny maps. C >= 256
    (C=384, exact 3x128 lanes, 224^2 instance is jnp-gated anyway) is unmeasured
    and stays NHWC. PACK_C_LIMIT (env) is the A/B override: 128 restores the old
    rule, 512 would force-pack C=384."""
    import math
    import os

    c_limit = int(os.environ.get("PACK_C_LIMIT", "256"))
    if c >= 128:
        return c < c_limit
    if os.environ.get("PACK_SMALL_ALL") == "1":  # A/B override: pack every C<128
        return True
    # W >= 28 is measured, not derived from the bandwidth ratio: packing C=96@28^2
    # (4.57x C-major trunk lane waste vs NHWC's 1.33x!) still wins big on-chip
    # (224^2 train 119.5 -> 107.3 ms/step) because the fused block kernel beats
    # the NHWC per-head kernels at every measured geometry and the trunk tensors
    # between quartets are a small fraction of the stage's traffic. Below W=28
    # (non-headline resolutions only) fall back to the bandwidth comparison.
    nhwc_waste = math.ceil(c / 128) * 128 / c
    nchw_waste = math.ceil(w / 128) * 128 / w
    return nhwc_waste > nchw_waste or w >= 28


class BasicBlock(nn.Module):
    """Pre-norm transformer block: LN->WinAtt->+res, LN->MLP->+res.

    Reference a005_BasicBlock.py:72-82,127-145 / a004_AddAndLayerNormWithOtherModule.py.
    """

    streams: int
    dims: int
    num_heads: int
    dims_per_head: int
    window_size: Tuple[int, int]
    shift: bool
    cross: bool
    mlp_hidden_dims: int
    activation: str = "elu"
    use_qkv_bias: bool = True
    attention_drop_ratio: float = 0.0
    proj_drop_ratio: float = 0.0
    mlp_drop_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "jnp"
    packed: bool = False  # lane-packed C-major kernel; input is (S, B, C, H, W)
    # stage fusion: input/output are packed strips (S, B, nh, nPw, C, 128) for the
    # (stage_hw, window, shift) geometry — the quartet packs once, repartitions
    # between blocks, unpacks once (ops/pallas_pack.py::repartition_packed)
    packed_io: bool = False
    stage_hw: Optional[Tuple[int, int]] = None
    # fused re-partition: the packed_io input arrives in the `repart_from` shift
    # geometry and the kernel re-partitions it to `shift` in its input load
    # (ops/pallas_pack.py::repart_in_kernel_ok gates eligibility)
    repart_from: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.packed:
            return self._packed_block_forward(x, deterministic=deterministic)
        if self.impl.startswith("pallas_block"):
            return self._fused_block_forward(x, deterministic=deterministic)
        shortcut = x
        x = StackedLayerNorm(self.streams, name="norm1")(x)
        x = DualWindowAttention(
            streams=self.streams,
            dims=self.dims,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            window_size=self.window_size,
            shift=self.shift,
            cross=self.cross,
            use_qkv_bias=self.use_qkv_bias,
            attention_drop_ratio=self.attention_drop_ratio,
            proj_drop_ratio=self.proj_drop_ratio,
            dtype=self.dtype,
            impl=self.impl,
            name="attn",
        )(x, deterministic=deterministic)
        x = shortcut + x

        shortcut = x
        x = StackedLayerNorm(self.streams, name="norm2")(x)
        x = DualMLP(
            streams=self.streams,
            dims=self.dims,
            hidden_dims=self.mlp_hidden_dims,
            activation=self.activation,
            drop_ratio=self.mlp_drop_ratio,
            dtype=self.dtype,
            name="mlp",
        )(x, deterministic=deterministic)
        return shortcut + x

    def _packed_block_forward(
        self, x: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Lane-packed C-major fused block (ops/pallas_pack.py) for small-C stages.

        Input/output (S, B, C, H, W); differentiable (custom VJP).
        Declares the identical param tree to the composed NHWC path."""
        from ..ops.pallas_pack import pallas_packed_block, pallas_packed_block_strips

        # in-kernel hash dropout (ops/hash_dropout.py): one seed per block instance
        # per step from the flax 'dropout' rng, masks derived per (site, position)
        rates = (
            float(self.attention_drop_ratio),
            float(self.proj_drop_ratio),
            float(self.mlp_drop_ratio),
        )
        drop_kwargs = {}
        if any(rates) and not deterministic:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 1 << 24, dtype=jnp.int32
            ).astype(jnp.float32)
            drop_kwargs = dict(drop_rates=rates, drop_seed=seed)

        c = x.shape[4] if self.packed_io else x.shape[2]
        shape_probe = jnp.zeros((self.streams, 1, 1, 1, c), x.dtype)
        ln1_scale, ln1_bias = StackedLayerNorm(
            self.streams, features=c, name="norm1"
        )(None)
        attn_params = DualWindowAttention(
            streams=self.streams,
            dims=self.dims,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            window_size=self.window_size,
            shift=self.shift,
            cross=self.cross,
            use_qkv_bias=self.use_qkv_bias,
            dtype=self.dtype,
            name="attn",
        )(shape_probe, return_params=True)
        ln2_scale, ln2_bias = StackedLayerNorm(
            self.streams, features=c, name="norm2"
        )(None)
        mlp_params = DualMLP(
            streams=self.streams,
            dims=self.dims,
            hidden_dims=self.mlp_hidden_dims,
            activation=self.activation,
            dtype=self.dtype,
            name="mlp",
        )(None, return_params=True)

        bias = gather_relative_position_bias(attn_params["table"], self.window_size)

        if self.packed_io:
            from ..ops.pallas_pack_spmd import (
                pallas_packed_block_strips_spmd,
                spatial_spmd_active,
            )

            # spatial sharding (parallel/spatial.py): the GSPMD-partitionable
            # wrapper runs the identical kernel per row shard with sharded masks
            block_fn = (
                pallas_packed_block_strips_spmd
                if spatial_spmd_active()
                else pallas_packed_block_strips
            )
            return block_fn(
                x.astype(self.dtype),
                hw=self.stage_hw,
                cross=self.cross,
                shift=self.shift,
                repart_from=self.repart_from,
                ln1_scale=ln1_scale,
                ln1_bias=ln1_bias,
                attn=attn_params,
                bias=bias,
                ln2_scale=ln2_scale,
                ln2_bias=ln2_bias,
                w1=mlp_params["w1"],
                b1=mlp_params["b1"],
                w2=mlp_params["w2"],
                b2=mlp_params["b2"],
                window=self.window_size,
                num_heads=self.num_heads,
                dims_per_head=self.dims_per_head,
                activation=self.activation,
                interpret=self.impl.endswith("interpret"),
                **drop_kwargs,
            )

        return pallas_packed_block(
            x.astype(self.dtype),
            cross=self.cross,
            shift=self.shift,
            ln1_scale=ln1_scale,
            ln1_bias=ln1_bias,
            attn=attn_params,
            bias=bias,
            ln2_scale=ln2_scale,
            ln2_bias=ln2_bias,
            w1=mlp_params["w1"],
            b1=mlp_params["b1"],
            w2=mlp_params["w2"],
            b2=mlp_params["b2"],
            window=self.window_size,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            activation=self.activation,
            interpret=self.impl.endswith("interpret"),
            **drop_kwargs,
        )

    def _fused_block_forward(
        self, x: jnp.ndarray, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """Whole-block fused Pallas kernel (ops/pallas_block.py): LN -> attention ->
        +res -> LN -> MLP -> +res in one pass, differentiable (custom VJP). Declares
        the identical param tree to the composed path."""
        from ..ops.pallas_block import pallas_fused_block

        # in-kernel hash dropout (ops/hash_dropout.py), same wiring as the packed path
        rates = (
            float(self.attention_drop_ratio),
            float(self.proj_drop_ratio),
            float(self.mlp_drop_ratio),
        )
        drop_kwargs = {}
        if any(rates) and not deterministic:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 1 << 24, dtype=jnp.int32
            ).astype(jnp.float32)
            drop_kwargs = dict(drop_rates=rates, drop_seed=seed)

        c = x.shape[-1]
        ln1_scale, ln1_bias = StackedLayerNorm(
            self.streams, features=c, name="norm1"
        )(None)
        attn_params = DualWindowAttention(
            streams=self.streams,
            dims=self.dims,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            window_size=self.window_size,
            shift=self.shift,
            cross=self.cross,
            use_qkv_bias=self.use_qkv_bias,
            dtype=self.dtype,
            name="attn",
        )(x, return_params=True)
        ln2_scale, ln2_bias = StackedLayerNorm(
            self.streams, features=c, name="norm2"
        )(None)
        mlp_params = DualMLP(
            streams=self.streams,
            dims=self.dims,
            hidden_dims=self.mlp_hidden_dims,
            activation=self.activation,
            dtype=self.dtype,
            name="mlp",
        )(None, return_params=True)

        bias = gather_relative_position_bias(attn_params["table"], self.window_size)

        return pallas_fused_block(
            x.astype(self.dtype),
            cross=self.cross,
            shift=self.shift,
            ln1_scale=ln1_scale,
            ln1_bias=ln1_bias,
            attn=attn_params,
            bias=bias,
            mask=None,  # roll-free shift: the kernel derives the edge mask itself
            ln2_scale=ln2_scale,
            ln2_bias=ln2_bias,
            w1=mlp_params["w1"],
            b1=mlp_params["b1"],
            w2=mlp_params["w2"],
            b2=mlp_params["b2"],
            window=self.window_size,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            activation=self.activation,
            interpret=self.impl == "pallas_block_interpret",
            **drop_kwargs,
        )


class SelfAndCrossBlockPair(nn.Module):
    """The per-stage unit: self pair (normal+shift) then cross pair (normal+shift).

    4 BasicBlocks = 8 WindowAttention applications per stage across both streams.
    Reference a012_SelfAndCrossBlockPair.py:40-68 and a009_NormalAndShiftWinsBlockPair.py.
    """

    streams: int
    dims: int
    num_heads: int
    dims_per_head: int
    window_size: Tuple[int, int]
    mlp_hidden_dims: int
    activation: str = "elu"
    use_qkv_bias: bool = True
    attention_drop_ratio: float = 0.0
    proj_drop_ratio: float = 0.0
    mlp_drop_ratio: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "jnp"
    # input/output already C-major (S, B, C, H, W): the model runs the whole small-C
    # trunk (pads/merges/skips included) C-major, so no per-stage transposes here
    cmajor_io: bool = False
    # input/output are packed NORMAL-geometry strips (S, B, nH, nPw, C, 128) over
    # ``strips_hw`` — the packed-boundary trunk (ops/packed_boundary.py) keeps
    # activations in strip layout across stages, so this pair never packs/unpacks;
    # it re-partitions back to normal geometry after the final shifted block.
    strips_io: bool = False
    strips_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        impl = self.impl
        packed = False
        if self.strips_io:
            if not impl.startswith("pallas_pack"):
                raise ValueError("strips_io requires the pallas_pack impl")
            from ..ops.pallas_pack import (
                repart_in_kernel_profitable,
                repartition_packed_auto,
            )

            from ..ops.pallas_pack_spmd import spatial_spmd_active

            hw = self.strips_hw
            win = self.window_size
            # in-kernel repartition fuses a halo read into one shard's tiles —
            # never under spatial sharding (the standalone kernel's partitioned
            # lowering owns the cross-shard halo)
            fuse_rep = repart_in_kernel_profitable(hw, win) and not spatial_spmd_active()
            interp = impl.endswith("_interpret")
            repartition_packed = functools.partial(
                repartition_packed_auto, interpret=interp
            )
            strip = dict(
                packed=True,
                packed_io=True,
                stage_hw=hw,
                streams=self.streams,
                dims=self.dims,
                num_heads=self.num_heads,
                dims_per_head=self.dims_per_head,
                window_size=win,
                mlp_hidden_dims=self.mlp_hidden_dims,
                activation=self.activation,
                use_qkv_bias=self.use_qkv_bias,
                attention_drop_ratio=self.attention_drop_ratio,
                proj_drop_ratio=self.proj_drop_ratio,
                mlp_drop_ratio=self.mlp_drop_ratio,
                dtype=self.dtype,
                impl=impl,
            )
            x = BasicBlock(shift=False, cross=False, name="self_normal", **strip)(
                x, deterministic=deterministic
            )
            if fuse_rep:
                # the three inter-block re-partitions run inside the next block's
                # input load (ops/pallas_pack.py repart_from) — no standalone conv
                x = BasicBlock(
                    shift=True, cross=False, repart_from=False,
                    name="self_shift", **strip,
                )(x, deterministic=deterministic)
                x = BasicBlock(
                    shift=False, cross=True, repart_from=True,
                    name="cross_normal", **strip,
                )(x, deterministic=deterministic)
                x = BasicBlock(
                    shift=True, cross=True, repart_from=False,
                    name="cross_shift", **strip,
                )(x, deterministic=deterministic)
            else:
                x = repartition_packed(x, win, hw, False, True)
                x = BasicBlock(shift=True, cross=False, name="self_shift", **strip)(
                    x, deterministic=deterministic
                )
                x = repartition_packed(x, win, hw, True, False)
                x = BasicBlock(shift=False, cross=True, name="cross_normal", **strip)(
                    x, deterministic=deterministic
                )
                x = repartition_packed(x, win, hw, False, True)
                x = BasicBlock(shift=True, cross=True, name="cross_shift", **strip)(
                    x, deterministic=deterministic
                )
            return repartition_packed(x, win, hw, True, False)
        if self.cmajor_io:
            if not impl.startswith("pallas_pack"):
                raise ValueError("cmajor_io requires the pallas_pack impl")
            # the model already routed this stage C-major; guard that both decision
            # sites (unet.stage_cmajor and this predicate) still agree
            assert pack_beneficial(x.shape[2], x.shape[-1]), (
                "cmajor_io stage fails pack_beneficial — unet.py and layers.py "
                "packing predicates have diverged"
            )
            packed = True
        elif impl.startswith("pallas_pack"):
            # lane-packed C-major path for small-C stages; deep stages fall back to
            # the fused NHWC attention kernel (where NHWC is already tile-exact)
            s_, b_, h_, w_, c_ = x.shape
            packed = pack_beneficial(c_, w_)
            if not packed:
                from ..ops.pallas_pack_spmd import spatial_spmd_active

                if spatial_spmd_active():
                    # spatial sharding: the NHWC kernels have no partitioned
                    # lowering — the jnp composition is GSPMD-exact and these
                    # deep tiny maps are a small slice of the work
                    impl = "jnp"
                else:
                    impl = (
                        "pallas_interpret" if impl.endswith("interpret") else "pallas"
                    )
        common = dict(
            streams=self.streams,
            dims=self.dims,
            num_heads=self.num_heads,
            dims_per_head=self.dims_per_head,
            window_size=self.window_size,
            mlp_hidden_dims=self.mlp_hidden_dims,
            activation=self.activation,
            use_qkv_bias=self.use_qkv_bias,
            attention_drop_ratio=self.attention_drop_ratio,
            proj_drop_ratio=self.proj_drop_ratio,
            mlp_drop_ratio=self.mlp_drop_ratio,
            dtype=self.dtype,
            impl=impl,
            packed=packed,
        )
        if packed and not self.cmajor_io:
            # the whole 4-block stage runs C-major: one NHWC->NCHW transpose in, one
            # out — the padded-NHWC round-trips per block are what lane packing kills
            x = jnp.moveaxis(x, -1, 2)  # (S, B, C, H, W)
        if packed:
            # stage fusion: pack once, run all 4 blocks on the packed strips with
            # lane-matmul re-partitions between the normal/shifted geometries, and
            # unpack once — instead of 4 transpose-chain pack/unpack round trips
            # (the round-1 "~35% of the 512^2 profile" plateau, docs/ROADMAP.md)
            from ..ops.pallas_pack import (
                pack_windows_cmajor,
                repart_in_kernel_profitable,
                repartition_packed_auto,
                unpack_windows_cmajor,
            )

            repartition_packed = functools.partial(
                repartition_packed_auto, interpret=impl.endswith("_interpret")
            )

            hw = (x.shape[3], x.shape[4])
            win = self.window_size
            fuse_rep = repart_in_kernel_profitable(hw, win) and not spatial_spmd_active()
            strip = dict(packed_io=True, stage_hw=hw, **common)
            x, _ = pack_windows_cmajor(x.astype(self.dtype), win, shift=False)
            x = BasicBlock(shift=False, cross=False, name="self_normal", **strip)(
                x, deterministic=deterministic
            )
            if fuse_rep:
                x = BasicBlock(
                    shift=True, cross=False, repart_from=False,
                    name="self_shift", **strip,
                )(x, deterministic=deterministic)
                x = BasicBlock(
                    shift=False, cross=True, repart_from=True,
                    name="cross_normal", **strip,
                )(x, deterministic=deterministic)
                x = BasicBlock(
                    shift=True, cross=True, repart_from=False,
                    name="cross_shift", **strip,
                )(x, deterministic=deterministic)
            else:
                x = repartition_packed(x, win, hw, False, True)
                x = BasicBlock(shift=True, cross=False, name="self_shift", **strip)(
                    x, deterministic=deterministic
                )
                x = repartition_packed(x, win, hw, True, False)
                x = BasicBlock(shift=False, cross=True, name="cross_normal", **strip)(
                    x, deterministic=deterministic
                )
                x = repartition_packed(x, win, hw, False, True)
                x = BasicBlock(shift=True, cross=True, name="cross_shift", **strip)(
                    x, deterministic=deterministic
                )
            x = unpack_windows_cmajor(x, win, hw, shift=True)
        else:
            # self-attention pair: normal then shifted windows
            x = BasicBlock(shift=False, cross=False, name="self_normal", **common)(
                x, deterministic=deterministic
            )
            x = BasicBlock(shift=True, cross=False, name="self_shift", **common)(
                x, deterministic=deterministic
            )
            # cross-attention pair: normal then shifted windows
            x = BasicBlock(shift=False, cross=True, name="cross_normal", **common)(
                x, deterministic=deterministic
            )
            x = BasicBlock(shift=True, cross=True, name="cross_shift", **common)(
                x, deterministic=deterministic
            )
        if packed and not self.cmajor_io:
            x = jnp.moveaxis(x, 2, -1)  # back to (S, B, H, W, C)
        return x


class PatchMergeLayer(nn.Module):
    """Encoder downsample: space-to-depth -> 1x1 linear -> LN -> act.

    Reference a011_PatchOperation.py:236-239 (encoder func order).
    """

    streams: int
    out_dims: int
    merging_size: Tuple[int, int]
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32
    cmajor: bool = False  # (S, B, C, H, W) in/out; identical params either layout

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.patch import space_to_depth, space_to_depth_cmajor

        s2d = space_to_depth_cmajor if self.cmajor else space_to_depth
        x = s2d(x, self.merging_size)
        x = StackedDense(
            self.streams, self.out_dims, True, self.dtype, cmajor=self.cmajor,
            name="linear",
        )(x)
        x = StackedLayerNorm(self.streams, cmajor=self.cmajor, name="norm")(x)
        return activation_fn(self.activation)(x)


class PatchUnmergeLayer(nn.Module):
    """Decoder upsample ("anti patch merging"): 1x1 linear to out*ph*pw -> LN ->
    depth-to-space -> act. Checkerboard-free by construction (no transposed conv).

    Reference a011_PatchOperation.py:241 (decoder func order: linear, LN, unmerge, act).
    """

    streams: int
    out_dims: int
    merging_size: Tuple[int, int]
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32
    cmajor: bool = False  # (S, B, C, H, W) in/out; identical params either layout

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.patch import depth_to_space, depth_to_space_cmajor

        ph, pw = self.merging_size
        x = StackedDense(
            self.streams, self.out_dims * ph * pw, True, self.dtype,
            cmajor=self.cmajor, name="linear",
        )(x)
        x = StackedLayerNorm(self.streams, cmajor=self.cmajor, name="norm")(x)
        d2s = depth_to_space_cmajor if self.cmajor else depth_to_space
        x = d2s(x, self.merging_size)
        return activation_fn(self.activation)(x)


def _strips_layer_norm(x, scale, bias, epsilon=1e-5):
    """Torch-semantics LayerNorm over the channel (sublane, axis -2) dim of packed
    strips (..., C, 128), fp32 like StackedLayerNorm; scale/bias (S, C)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-2, keepdims=True)
    var = xf.var(axis=-2, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + epsilon)
    shp = (scale.shape[0],) + (1,) * (x.ndim - 3) + (scale.shape[1], 1)
    return (xn * scale.reshape(shp) + bias.reshape(shp)).astype(orig)


class PackedPatchMergeLayer(nn.Module):
    """:class:`PatchMergeLayer` on packed strips (ops/packed_boundary.py): the
    reflect pads + space-to-depth + repack of the classic boundary run as one
    selector convolution in strip layout; dense/LN/act follow as sublane ops.

    Parameter tree ("linear", "norm") is IDENTICAL to PatchMergeLayer — the
    reference-order (q-major) dense rows contract the selector output's q-major
    lane blocks directly. Values are bit-equal to the classic chain on real
    tokens (pad lanes hold garbage, as everywhere in the packed trunk).

    Reference a011_PatchOperation.py:236-239 / a006_PaddingOperation.py.
    """

    streams: int
    in_dims: int
    out_dims: int
    window_size: Tuple[int, int]
    hw_src: Tuple[int, int]
    pad_merge: Tuple[int, int]
    pad_win: Tuple[int, int]
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        from ..ops.packed_boundary import merge_packed

        c = self.in_dims
        kernel, bias = StackedDense(
            self.streams, self.out_dims, True, self.dtype,
            in_features=4 * c, name="linear",
        )(None)
        scale, nbias = StackedLayerNorm(
            self.streams, features=self.out_dims, name="norm"
        )(None)
        y = merge_packed(
            xp.astype(self.dtype), self.window_size, self.hw_src,
            self.pad_merge, self.pad_win,
        )  # (S, B, Rt, Pt, C, 4*128): q-major lane blocks
        kernel = kernel.astype(self.dtype)
        out = None
        for q in range(4):
            part = jnp.einsum(
                "sbrpcl,scd->sbrpdl",
                y[..., q * 128 : (q + 1) * 128],
                kernel[:, q * c : (q + 1) * c, :],
                preferred_element_type=self.dtype,
                precision=matmul_precision(self.dtype),
            )
            out = part if out is None else out + part
        out = out + bias.astype(self.dtype)[:, None, None, None, :, None]
        out = _strips_layer_norm(out, scale, nbias)
        return activation_fn(self.activation)(out)


class PackedPatchUnmergeLayer(nn.Module):
    """:class:`PatchUnmergeLayer` on packed strips: dense C -> 4*out (reference
    q-major column order, unpermuted) + LN as sublane ops, then the undo-crops +
    depth-to-space + repack run as one selector convolution in strip layout
    (exact on every real target token — decoder crops only drop data).

    Parameter tree ("linear", "norm") identical to PatchUnmergeLayer.
    Reference a011_PatchOperation.py:241 (linear, LN, unmerge, act).
    """

    streams: int
    out_dims: int
    window_size: Tuple[int, int]
    hw_dst: Tuple[int, int]
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        from ..ops.packed_boundary import unmerge_selector_conv

        in_dims = xp.shape[-2]
        kernel, bias = StackedDense(
            self.streams, 4 * self.out_dims, True, self.dtype,
            in_features=in_dims, name="linear",
        )(None)
        scale, nbias = StackedLayerNorm(
            self.streams, features=4 * self.out_dims, name="norm"
        )(None)
        x = jnp.einsum(
            "sbrpcl,scd->sbrpdl",
            xp.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
            precision=matmul_precision(self.dtype),
        )
        x = x + bias.astype(self.dtype)[:, None, None, None, :, None]
        x = _strips_layer_norm(x, scale, nbias)
        x = unmerge_selector_conv(x, self.window_size, self.hw_dst)
        return activation_fn(self.activation)(x)


class FinalHead(nn.Module):
    """concat(x, y) -> conv3x3(reflect) -> BatchNorm -> act -> conv3x3(reflect) -> 1ch.

    Reference a013_ModelDefinition.py:98-152. Operates on single (non-stacked) NHWC
    tensors since the streams merge here.
    """

    kernel_size: int = 3
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32
    # set to the mesh axis name under shard_map so BatchNorm statistics are computed
    # over the global batch (GSPMD jit gets this automatically; shard_map needs it)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xy: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        pad = k // 2

        def reflect_conv(x, features, name):
            x = jnp.pad(
                x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect"
            )
            return nn.Conv(
                features,
                (k, k),
                padding="VALID",
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                precision=matmul_precision(self.dtype),
                name=name,
            )(x)

        x = reflect_conv(xy, 2, "conv1")
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch BatchNorm2d default momentum=0.1 -> flax 0.9
            epsilon=1e-5,
            dtype=jnp.float32,
            axis_name=self.bn_axis_name,
            name="bn",
        )(x)
        x = activation_fn(self.activation)(x)
        return reflect_conv(x, 1, "conv2")
