"""Fused Pallas window-attention kernel vs the jnp composition (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.models.layers import DualWindowAttention


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("cross", [False, True])
def test_pallas_matches_jnp(rng, shift, cross):
    c, heads, dph = 8, 2, 4
    h, w = 14, 21
    x = jnp.asarray(rng.standard_normal((2, 2, h, w, c)).astype(np.float32))

    kwargs = dict(
        streams=2, dims=c, num_heads=heads, dims_per_head=dph,
        window_size=(7, 7), shift=shift, cross=cross,
    )
    ref_mod = DualWindowAttention(**kwargs, impl="jnp")
    variables = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(variables, x)

    pallas_mod = DualWindowAttention(**kwargs, impl="pallas_interpret")
    out = pallas_mod.apply(variables, x)  # identical param tree by construction

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_full_model_forward(rng):
    """Whole tiny model with attention_impl=pallas_interpret == jnp model output."""
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    base = dict(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    ir = jnp.asarray(rng.random((1, 30, 26, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((1, 30, 26, 1), dtype=np.float32))

    jnp_model = SwinFusionUNet(ModelConfig(**base))
    variables = jnp_model.init(jax.random.PRNGKey(0), ir, vis)
    ref = jnp_model.apply(variables, ir, vis)

    pl_model = SwinFusionUNet(ModelConfig(**base, attention_impl="pallas_interpret"))
    out = pl_model.apply(variables, ir, vis)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-4)
