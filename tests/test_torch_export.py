"""JAX -> torch export: the reference model must load the exported state strictly and
produce identical outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.torch_export import export_torch_state_dict
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

from reference_loader import reference_model

TINY = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


def test_export_loads_strict_and_matches(rng):
    import torch

    model = SwinFusionUNet(TINY)
    ir = rng.random((1, 28, 28, 1), dtype=np.float32)
    vis = rng.random((1, 28, 28, 1), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(ir), jnp.asarray(vis))
    jax_out = np.asarray(model.apply(variables, jnp.asarray(ir), jnp.asarray(vis)))

    state = export_torch_state_dict(
        variables["params"], variables["batch_stats"], TINY
    )
    ref = reference_model(TINY, seed=3)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) if isinstance(v, np.ndarray)
         else torch.tensor(v) for k, v in state.items()},
        strict=False,
    )
    assert not missing, f"missing keys: {missing[:5]}"
    assert not unexpected, f"unexpected keys: {unexpected[:5]}"

    ref.eval()
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(ir.transpose(0, 3, 1, 2)),
            torch.from_numpy(vis.transpose(0, 3, 1, 2)),
        ).numpy()
    np.testing.assert_allclose(
        jax_out.transpose(0, 3, 1, 2), ref_out, atol=2e-4, rtol=1e-3
    )
