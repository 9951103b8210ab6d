"""Golden end-to-end parity: JAX model with imported torch weights == torch reference.

The reference model is instantiated with random weights, its state_dict converted via
``convert_torch_state_dict``, and both frameworks run the same inputs. This validates the
entire forward stack: padding plan, patch merge/unmerge, all 80 window-attention
applications (self/cross x normal/shift), additive skips, and the BatchNorm head.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.torch_import import convert_torch_state_dict
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

from reference_loader import reference_model, torch_state_numpy

TINY = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


def _run_both(cfg: ModelConfig, hw, seed=0, train_mode=False, batch=2):
    import torch

    ref = reference_model(cfg, seed=seed)
    rng = np.random.default_rng(seed)
    ir = rng.random((batch, 1, *hw), dtype=np.float32)
    vis = rng.random((batch, 1, *hw), dtype=np.float32)

    if train_mode:
        ref.train()
    else:
        ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ir), torch.from_numpy(vis)).numpy()

    params, batch_stats = convert_torch_state_dict(torch_state_numpy(ref), cfg)
    model = SwinFusionUNet(cfg)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(ir.transpose(0, 2, 3, 1)),
        jnp.asarray(vis.transpose(0, 2, 3, 1)),
        train=False,  # eval semantics; train-mode BN compared separately
    )
    return ref_out, np.asarray(out).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("hw", [(56, 56), (57, 43), (100, 90)])
def test_tiny_model_parity(hw):
    ref_out, out = _run_both(TINY, hw)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_model_parity_100x90():
    """The survey's verified arbitrary-size case on the full 33M-param model."""
    cfg = ModelConfig()
    ref_out, out = _run_both(cfg, (100, 90))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_param_count_matches_reference():
    """33,145,973 parameters — measured from the reference in SURVEY.md §0."""
    cfg = ModelConfig()
    model = SwinFusionUNet(cfg)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 14, 14, 1)),
            jnp.zeros((1, 14, 14, 1)),
        )
    )
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
    assert n == 33_145_973


def test_batchnorm_train_mode_updates_stats():
    """Train-mode apply returns updated batch_stats (torch BN momentum 0.1 parity)."""
    cfg = TINY
    model = SwinFusionUNet(cfg)
    key = jax.random.PRNGKey(0)
    ir = jax.random.uniform(key, (2, 28, 28, 1))
    variables = model.init(key, ir, ir)
    out, mutated = model.apply(
        variables, ir, ir, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["final_head"]["bn"]["mean"]
    new = mutated["batch_stats"]["final_head"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
