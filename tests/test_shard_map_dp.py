"""Explicit shard_map+psum DP step == single-device step (loss and update)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import Config, ModelConfig, OptimConfig
from swin_unet_image_fusion_tpu.parallel.mesh import data_mesh, data_sharding, replicated_sharding
from swin_unet_image_fusion_tpu.parallel.shard_map_dp import make_shard_map_train_step
from swin_unet_image_fusion_tpu.train import create_train_state, make_train_step

TINY = Config(
    model=ModelConfig(
        in_dims_list=(1, 8),
        out_dims_list=(8, 16),
        att_num_heads=2,
        att_dims_per_head_ratio=1 / 2,
    ),
    optim=OptimConfig(batch_size=8, lr=1e-3),
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_map_dp_matches_single_device(rng):
    mesh = data_mesh(8)
    state = create_train_state(TINY, jax.random.PRNGKey(0), 10, (28, 28))
    ir = jnp.asarray(rng.random((8, 28, 28, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((8, 28, 28, 1), dtype=np.float32))

    # single device reference
    state1, terms1 = make_train_step(TINY, donate=False)(state, ir, vis)

    # shard_map explicit-psum step
    sm_step = make_shard_map_train_step(TINY, mesh)
    state_r = jax.device_put(state, replicated_sharding(mesh))
    ir_s = jax.device_put(ir, data_sharding(mesh))
    vis_s = jax.device_put(vis, data_sharding(mesh))
    state8, terms8 = sm_step(state_r, ir_s, vis_s)

    np.testing.assert_allclose(
        float(terms8["total_loss"]), float(terms1["total_loss"]), rtol=1e-5
    )
    # BN stats identical (global batch stats vs psum-averaged per-shard stats differ
    # slightly by construction: mean of shard-means equals global mean for equal
    # shard sizes; variances differ by within-shard vs global centring)
    leaves1 = jax.tree.leaves(state1.params)
    leaves8 = jax.tree.leaves(state8.params)
    scale = max(np.abs(np.asarray(a)).max() for a in leaves1)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3 * scale, rtol=2e-2
        )
