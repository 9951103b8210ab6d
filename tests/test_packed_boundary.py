"""Packed stage-boundary ops (ops/packed_boundary.py): patch merge / anti-merge
directly on window strips, bit-equal to the classic unpack/pad/s2d/pad/pack chains
(reference a011_PatchOperation.py:72-145 + a006_PaddingOperation.py:54-56,111-131)
on every real token — including geometries with reflect pads, odd widths, and
even-rounding dummy strips, and with every pad lane filled with garbage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_unet_image_fusion_tpu.ops.packed_boundary import (
    merge_packed,
    unmerge_selector_conv,
)
from swin_unet_image_fusion_tpu.ops.pallas_pack import (
    pack_windows_cmajor,
    unpack_windows_cmajor,
)
from swin_unet_image_fusion_tpu.ops.patch import (
    crop_bottom_right_cmajor,
    depth_to_space_cmajor,
    pad_reflect_bottom_right_cmajor,
    space_to_depth_cmajor,
)
from swin_unet_image_fusion_tpu.ops.shape_plan import make_plan

WIN = (7, 7)


def _strips_with_garbage(m, rng):
    """Pack a map and overwrite every non-real lane with large noise — boundary
    ops must be exact on real tokens regardless of pad-lane contents."""
    xp, _ = pack_windows_cmajor(m, WIN, False)
    mark, _ = pack_windows_cmajor(jnp.ones_like(m), WIN, False)
    noise = jnp.asarray(rng.normal(size=xp.shape).astype(np.float32)) * 37.0
    return jnp.where(mark > 0, xp, noise)


def _to_q_sublanes(got, c):
    """(S, B, R, P, C, 4*128) q-major lane blocks -> (S, B, R, P, 4C, 128)."""
    s, b, r, p, _, _ = got.shape
    gq = got.reshape(s, b, r, p, c, 4, 128)
    return jnp.moveaxis(gq, 5, 4).reshape(s, b, r, p, 4 * c, 128)


# (input size) -> covers: reflect pads on both axes, zero-pad stages, odd widths,
# dummy strip rows/pairs, and the smallest 7x7 maps
@pytest.mark.parametrize("h0,w0", [(100, 90), (57, 120)])
def test_merge_packed_matches_classic_chain(h0, w0):
    rng = np.random.default_rng(0)
    plan = make_plan(h0, w0, 5, (2, 2), WIN)
    for k in range(1, 5):
        p = plan[k]
        hs, ws = p.in_hw
        c = 5
        m = jnp.asarray(rng.normal(size=(2, 2, c, hs, ws)).astype(np.float32))
        got = merge_packed(
            _strips_with_garbage(m, rng), WIN, (hs, ws), p.pad_merge, p.pad_win
        )
        oracle = pad_reflect_bottom_right_cmajor(m, p.pad_merge)
        oracle = space_to_depth_cmajor(oracle, (2, 2))  # (q, c) channels
        oracle = pad_reflect_bottom_right_cmajor(oracle, p.pad_win)
        got_map = unpack_windows_cmajor(_to_q_sublanes(got, c), WIN, p.att_hw, False)
        np.testing.assert_array_equal(np.asarray(got_map), np.asarray(oracle))


@pytest.mark.parametrize("h0,w0", [(100, 90), (57, 120)])
def test_unmerge_conv_matches_classic_chain(h0, w0):
    rng = np.random.default_rng(1)
    plan = make_plan(h0, w0, 5, (2, 2), WIN)
    for k in range(1, 5):
        p = plan[k]
        ah, aw = p.att_hw
        c = 5
        m4 = jnp.asarray(rng.normal(size=(2, 2, 4 * c, ah, aw)).astype(np.float32))
        got = unmerge_selector_conv(_strips_with_garbage(m4, rng), WIN, p.in_hw)
        oracle = crop_bottom_right_cmajor(m4, p.pad_win)
        oracle = depth_to_space_cmajor(oracle, (2, 2))
        oracle = crop_bottom_right_cmajor(oracle, p.pad_merge)
        got_map = unpack_windows_cmajor(got, WIN, p.in_hw, False)
        np.testing.assert_array_equal(np.asarray(got_map), np.asarray(oracle))


@pytest.mark.slow
def test_boundary_ops_differentiable():
    """Both directions are fixed linear maps: gradients round-trip onto exactly
    the real-pixel positions (all-ones cotangent on real tokens -> the number of
    target reads per source pixel: 1 for unmerge; for merge, the reflect pads
    make some border pixels feed multiple targets, so grads there are >= 1)."""
    rng = np.random.default_rng(2)
    plan = make_plan(57, 120, 5, (2, 2), WIN)
    p = plan[1]
    hs, ws = p.in_hw
    m = jnp.asarray(rng.normal(size=(2, 1, 3, hs, ws)).astype(np.float32))
    xp, _ = pack_windows_cmajor(m, WIN, False)

    def f(x):
        y = merge_packed(x, WIN, (hs, ws), p.pad_merge, p.pad_win)
        real = unpack_windows_cmajor(_to_q_sublanes(y, 3), WIN, p.att_hw, False)
        return jnp.sum(real)

    g = unpack_windows_cmajor(jax.grad(f)(xp), WIN, (hs, ws), False)
    g = np.asarray(g)
    assert (g >= 1.0 - 1e-6).all(), "some real pixel received no gradient"
    # interior pixels feed exactly one target token (and the pad_win copies of
    # the merged map can only multiply border pixels)
    interior = g[..., 2 : hs - 8, 2 : ws - 8]
    np.testing.assert_allclose(interior, 1.0)

    ah, aw = p.att_hw
    m4 = jnp.asarray(rng.normal(size=(2, 1, 12, ah, aw)).astype(np.float32))
    xp4, _ = pack_windows_cmajor(m4, WIN, False)

    def h(x):
        y = unmerge_selector_conv(x, WIN, (hs, ws))
        return jnp.sum(unpack_windows_cmajor(y, WIN, (hs, ws), False))

    g4 = unpack_windows_cmajor(jax.grad(h)(xp4), WIN, (ah, aw), False)
    g4 = np.asarray(g4)
    # every merged-map token strictly inside the crops feeds exactly one target;
    # the last merged row/col loses its q=(1, .) channels to the pad_merge crop,
    # and everything beyond the pad_win crop feeds none
    mh, mw = ah - p.pad_win[0], aw - p.pad_win[1]
    np.testing.assert_allclose(g4[..., : mh - 1, : mw - 1], 1.0)
    assert set(np.unique(g4)) <= {0.0, 1.0}
    np.testing.assert_allclose(g4[..., mh:, :], 0.0)
