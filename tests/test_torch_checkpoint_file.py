"""Round-trip a reference-format .pth file through the checkpoint importer."""

import numpy as np
import pytest

import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.torch_import import load_torch_checkpoint
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

from reference_loader import reference_model

TINY = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


def test_pth_file_import(tmp_path, rng):
    """Save the reference trainer's checkpoint dict format (a016_train.py:238-250) and
    load it through load_torch_checkpoint; outputs must match the torch model."""
    import torch

    ref = reference_model(TINY, seed=1)
    ref.eval()
    path = str(tmp_path / "04.20.01.23_epoch20.pth")
    torch.save(
        {
            "model_state": ref.state_dict(),
            "optimizer_state": {},
            "scheduler_state": {},
            "current_epoch": 20,
        },
        path,
    )

    params, batch_stats, epoch = load_torch_checkpoint(path, TINY)
    assert epoch == 20

    ir = rng.random((1, 1, 28, 28), dtype=np.float32)
    vis = rng.random((1, 1, 28, 28), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    model = SwinFusionUNet(TINY)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(ir.transpose(0, 2, 3, 1)),
        jnp.asarray(vis.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out, atol=2e-4, rtol=1e-3
    )
