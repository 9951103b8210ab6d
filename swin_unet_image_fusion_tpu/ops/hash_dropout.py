"""Counter-based dropout masks for the fused Pallas kernels.

The hardware PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) is stream-based:
the bits produced depend on the shape and order of the generation calls, so a
backward pass that runs on a *finer* tile grid than the forward (which ours do —
see ``pallas_pack.py::_backward``) could never reproduce the forward's dropout
masks. The Mosaic interpreter also stubs it, which would leave the training path
untestable on CPU.

Instead, masks here are a pure function of ``(seed, site, global element
position)``: a murmur3-style integer finalizer computed with plain vector integer
ops (VPU). That makes the mask

- identical under any grid tiling (forward, re-tiled backward, interpret mode),
- reproducible in plain jnp for golden tests (`tests/test_hash_dropout.py`),
- free of cross-kernel state (no seeding order to maintain).

To keep 32-bit arithmetic collision-free, hashing is two-level: a per-window-pair
hash of the *global pair index* (fits int32 easily), then a finalize of
``pair_hash + intra-pair offset`` (intra offsets are < 2^17). Keep decisions use
the low 23 bits, giving dropout-rate resolution of 2^-23.

Dropout sites (matching the reference): softmax attention weights and the proj
output (``a001_WindowAttention.py:58-66``), the MLP hidden after activation and
the MLP output (``a003_AutoPathMLP.py:26-31``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# murmur3 finalizer constants / golden-ratio salt step, as wrapping int32.
# Plain Python ints: jnp scalars created at module level would be captured as
# closure constants by Pallas kernel functions (must be created inside the trace).
_C1 = -2048144789  # 0x85EBCA6B
_C2 = -1028477387  # 0xC2B2AE35
_GOLD = -1640531527  # 0x9E3779B9

KEEP_BITS = 23

# per-site salts (arbitrary distinct constants)
SITE_ATTN = 1
SITE_PROJ = 2
SITE_MLP_HIDDEN = 3
SITE_MLP_OUT = 4


def finalize(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32 on (wrapping) int32 values — full avalanche."""
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(_C1)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(_C2)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def keep_threshold(rate: float) -> int:
    """Static int threshold: low 23 hash bits < threshold  <=>  keep (prob 1-rate)."""
    t = int(round((1.0 - float(rate)) * (1 << KEEP_BITS)))
    return max(0, min(t, 1 << KEEP_BITS))


def pair_hash(seed: jnp.ndarray, site: int, pair_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-window-pair hash. ``seed`` int32 scalar, ``pair_idx`` int32 array of
    GLOBAL pair indices (identical however the grid is tiled)."""
    salt = (site * _GOLD) & 0xFFFFFFFF
    if salt >= 1 << 31:  # wrap to signed int32 in Python (jnp.int32 rejects overflow)
        salt -= 1 << 32
    base = finalize(seed.astype(jnp.int32) + jnp.int32(salt))
    return finalize(pair_idx.astype(jnp.int32) ^ base)


def keep_from_hash(ph: jnp.ndarray, intra: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Bool keep mask from broadcast(pair-hash + intra-pair offset).

    ``ph`` and ``intra`` must broadcast against each other; ``intra`` values must
    be unique within a pair (and < 2^17 to stay far from int32 wrap effects).
    """
    h = finalize(ph + intra.astype(jnp.int32))
    bits = h & jnp.int32((1 << KEEP_BITS) - 1)
    return bits < jnp.int32(keep_threshold(rate))


def apply_mask(x: jnp.ndarray, keep: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout: x/(1-rate) where kept, else 0."""
    inv_q = jnp.float32(1.0 / (1.0 - float(rate)))
    return jnp.where(keep, x * inv_q, jnp.float32(0.0))


def intra_offsets(shape: tuple, row_stride: int) -> jnp.ndarray:
    """(rows, cols) int32 offsets ``r*row_stride + c`` as a 2-D iota (Mosaic needs
    >=2-D iota). ``row_stride`` must be >= cols so offsets are unique."""
    rows, cols = shape
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return r * jnp.int32(row_stride) + c


def tile_keep_mask(
    seed: jnp.ndarray,
    site: int,
    pair0: jnp.ndarray,
    tile: int,
    inner_shape: tuple,
    rate: float,
    intra_base: int = 0,
) -> jnp.ndarray:
    """(TILE, rows, cols) keep mask for a tile of ``tile`` consecutive pairs
    starting at global pair index ``pair0`` (int32 scalar).

    ``intra_base`` offsets the intra-pair index space (e.g. ``head * rows * cols``
    for a per-head loop over slices of one logical site). Used identically by the
    kernel bodies (with ``pair0`` built from program ids) and by the pure-jnp test
    references (with ``pair0`` a plain scalar).
    """
    rows, cols = inner_shape
    pidx = pair0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1, 1), 0)
    ph = pair_hash(seed, site, pidx)  # (TILE, 1, 1)
    intra = intra_offsets((rows, cols), cols)[None] + jnp.int32(intra_base)
    return keep_from_hash(ph, intra, rate)
