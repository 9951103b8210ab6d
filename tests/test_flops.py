"""Analytic FLOP counter (utils/flops.py) — the MFU/roofline denominator."""

import jax
import jax.numpy as jnp
import pytest

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
from swin_unet_image_fusion_tpu.utils.flops import mfu, model_flops_per_pair


def test_default_model_512_flops_pin():
    """Regression pin: the 33M model costs ~86 GF of matmul/conv work per 512^2 pair
    (the number behind the bench.py MFU line and the BENCHMARKS roofline table)."""
    f = model_flops_per_pair(ModelConfig(), (512, 512))
    assert 80e9 < f["total"] < 92e9, f["total"]
    # encoder stage flops are near-constant across stages (T/4 but C^2*4 per stage)
    enc = [f["per_stage"][f"enc{k}"] for k in range(5)]
    assert all(3e9 < e < 14e9 for e in enc), enc
    # decoder stages are cheaper (mlp_hidden follows in_dims — the a013:196 quirk)
    for k in range(5):
        assert f["per_stage"][f"dec{k}"] < f["per_stage"][f"enc{k}"]


def test_flops_match_xla_cost_analysis():
    """XLA's own per-program flop count brackets the analytic count: it includes
    everything we count (dots/convs) plus elementwise work we deliberately exclude,
    so xla/analytic must land in [1.0, 1.7] even at an elementwise-heavy tiny config."""
    cfg = ModelConfig(
        in_dims_list=(1, 8),
        out_dims_list=(8, 16),
        att_num_heads=2,
        att_dims_per_head_ratio=1 / 2,
        attention_impl="jnp",
    )
    model = SwinFusionUNet(cfg)
    ir = jnp.zeros((1, 28, 28, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir, ir)
    fn = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
    c = fn.lower(variables, ir, ir).compile().cost_analysis()
    ca = c[0] if isinstance(c, (list, tuple)) else c
    xla = float(ca["flops"])
    ana = model_flops_per_pair(cfg, (28, 28))["total"]
    assert 1.0 <= xla / ana <= 1.7, (xla, ana)


def test_mfu_helper():
    achieved, frac = mfu(124.3, 86.16e9)
    assert achieved == pytest.approx(10.71, rel=0.01)
    assert frac == pytest.approx(10.71 / 197.0, rel=0.01)
