"""Tiled high-res fusion: tile plan properties and consistency with full-image fusion."""

import numpy as np
import pytest

import jax

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
from swin_unet_image_fusion_tpu.parallel.mesh import data_mesh
from swin_unet_image_fusion_tpu.parallel.tiled import TiledFuser, plan_tiles, _ramp_weights

TINY = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


def test_plan_tiles_covers_everything():
    for length, tile, overlap in [(2048, 512, 64), (1000, 512, 64), (300, 512, 64)]:
        starts = plan_tiles(length, min(tile, length), overlap)
        t = min(tile, length)
        covered = np.zeros(length, bool)
        for s in starts:
            assert 0 <= s <= length - t
            covered[s : s + t] = True
        assert covered.all()
        for a, b in zip(starts, starts[1:]):
            assert b - a <= t - overlap or b == length - t


def test_ramp_weights_cover_everywhere():
    """Every pixel gets positive total weight (the fuser normalises by the sum), and
    pairwise-overlap regions sum to exactly 1."""
    starts = plan_tiles(2048, 512, 64)
    w = _ramp_weights(512, starts, 2048)
    total = np.zeros(2048, np.float32)
    for i, s in enumerate(starts):
        total[s : s + 512] += w[i]
    assert (total > 0.2).all()
    # with even spacing and overlap < tile/2, overlaps are pairwise -> exact 1
    np.testing.assert_allclose(total, 1.0, atol=1e-5)


@pytest.mark.slow
def test_tiled_matches_full_in_interior(rng):
    """Tiled fusion equals full-image fusion away from tile borders (window attention
    is local, so a 64px overlap halo covers the model's receptive context)."""
    model = SwinFusionUNet(TINY)
    ir = rng.random((1, 126, 126, 1), dtype=np.float32)
    vis = rng.random((1, 126, 126, 1), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), ir, vis)

    import jax.numpy as jnp

    full = np.asarray(
        jnp.clip(model.apply(variables, ir, vis, train=False), 0, 1)
    )[0]

    fuser = TiledFuser(model, variables, tile=98, overlap=70)
    tiled = fuser.fuse(ir[0], vis[0])
    assert tiled.shape == full.shape
    # centres agree; borders may differ through pad context. Random weights are the
    # worst case (no spatial decay of context), so the bound is loose.
    c = np.abs(tiled[30:-30, 30:-30] - full[30:-30, 30:-30])
    assert c.mean() < 3e-2
    assert np.median(c) < 1e-3


def test_tiled_chunked_equals_unchunked(rng):
    """max_batch chunking is bit-equal to the single-batch path: the same tiles run
    through the same executable shape-for-shape, only grouped differently."""
    model = SwinFusionUNet(TINY)
    ir = rng.random((126, 126, 1), dtype=np.float32)
    vis = rng.random((126, 126, 1), dtype=np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), ir[None, :56, :56], vis[None, :56, :56]
    )
    # tile=56, overlap=28 over 126 -> 4x4 = 16 tiles; chunk of 6 exercises padding
    full = TiledFuser(model, variables, tile=56, overlap=28).fuse(ir, vis)
    chunked = TiledFuser(model, variables, tile=56, overlap=28, max_batch=6).fuse(
        ir, vis
    )
    np.testing.assert_array_equal(chunked, full)


@pytest.mark.slow
def test_tiled_runs_on_mesh(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    model = SwinFusionUNet(TINY)
    ir = rng.random((1, 160, 160, 1), dtype=np.float32)
    vis = rng.random((1, 160, 160, 1), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), ir[:, :84, :84], vis[:, :84, :84])
    fuser = TiledFuser(model, variables, tile=84, overlap=28, mesh=data_mesh(4))
    out = fuser.fuse(ir[0], vis[0])
    assert out.shape == (160, 160, 1)
    assert np.isfinite(out).all()


def test_tiled_uint8_transfer_matches_float(rng):
    """uint8 in / uint8 out (the 8-bit serving path) matches the float path after
    quantisation: the device converts u8/255 -> f32, fuses identically, and only the
    final round-to-u8 differs."""
    model = SwinFusionUNet(TINY)
    ir8 = (rng.random((126, 126, 1)) * 255).astype(np.uint8)
    vis8 = (rng.random((126, 126, 1)) * 255).astype(np.uint8)
    ir = ir8.astype(np.float32) / 255.0
    vis = vis8.astype(np.float32) / 255.0
    variables = model.init(
        jax.random.PRNGKey(0), ir[None, :56, :56], vis[None, :56, :56]
    )
    f32 = TiledFuser(model, variables, tile=56, overlap=28).fuse(ir, vis)
    u8 = TiledFuser(model, variables, tile=56, overlap=28, return_uint8=True).fuse(
        ir8, vis8
    )
    assert u8.dtype == np.uint8
    want = np.round(np.clip(f32, 0, 1) * 255).astype(np.uint8)
    diff = np.abs(u8.astype(int) - want.astype(int))
    # the quantising program may fuse the final *255 differently (last-ulp), which
    # can flip pixels sitting exactly on a .5 rounding knife-edge by one level
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3
