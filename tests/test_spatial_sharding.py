"""Exact spatial (H-axis) sharding: multi-chip output == single-device output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
from swin_unet_image_fusion_tpu.parallel.spatial import SpatialFuser, spatial_mesh

TINY = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual devices")
@pytest.mark.slow
def test_spatial_sharded_forward_matches_single_device(rng):
    model = SwinFusionUNet(TINY)
    ir = jnp.asarray(rng.random((1, 112, 84, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((1, 112, 84, 1), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), ir, vis)

    ref = jnp.clip(model.apply(variables, ir, vis), 0, 1)

    fuser = SpatialFuser(model, variables, mesh=spatial_mesh(4))
    out = fuser.fuse(ir, vis)
    assert out.sharding.is_equivalent_to(fuser.sharding, out.ndim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize(
    "hw",
    [
        # non-window-multiple: per-stage reflect pad + shifted-window edge masks
        # interact with the shard boundary (SURVEY.md §7 "hard parts"); H=100 also
        # shards unevenly over 8 devices (12.5/shard)
        (100, 90),
        # window-multiple stage maps: the wrap-roll (use_wrap) geometry — the
        # cyclic shift wraps around the GLOBAL image (reference a001:442-444),
        # which under H sharding becomes a cross-chip permute
        (224, 224),
    ],
)
@pytest.mark.slow
def test_spatial_sharded_edge_geometries(rng, hw):
    model = SwinFusionUNet(TINY)
    ir = jnp.asarray(rng.random((1, *hw, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((1, *hw, 1), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir, vis)

    ref = jnp.clip(model.apply(variables, ir, vis), 0, 1)

    fuser = SpatialFuser(model, variables, mesh=spatial_mesh(8))
    out = fuser.fuse(ir, vis)
    assert out.shape == (1, *hw, 1)
    # fp32 reduction-order noise only (GSPMD re-associates the LN/softmax sums)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
