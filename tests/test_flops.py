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


def test_packed_trunk_floor_structure():
    """The VPU/MXU/HBM floor model (VERDICT r4 Weak #4): covers exactly the
    packed stages, components positive, floor = max(components), and the 33M
    512^2 bs=128 configuration lands in the documented range the on-chip
    measurement is compared against (docs/BENCHMARKS.md round-5 table)."""
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.utils.flops import (
        packed_block_pass_model,
        packed_trunk_floor,
    )

    m = packed_block_pass_model(24, 8, 3, 96, cross=False, masked=False)
    assert m["vpu_s"] > 0 and m["mxu_s"] > 0 and m["hbm_s"] > 0
    assert m["floor_s"] == max(m["vpu_s"], m["mxu_s"], m["hbm_s"])
    # masks add work; cross adds a second LN/load stream
    m_mask = packed_block_pass_model(24, 8, 3, 96, cross=False, masked=True)
    m_cross = packed_block_pass_model(24, 8, 3, 96, cross=True, masked=False)
    assert m_mask["hbm_s"] > m["hbm_s"]
    assert m_cross["vpu_s"] > m["vpu_s"]

    floors = packed_trunk_floor(ModelConfig(), (512, 512), 128)
    # the 33M model packs C=24/48/96/192 at 512^2 (C=384 stays NHWC)
    assert sorted(floors) == [
        "stage0(C=24)", "stage1(C=48)", "stage2(C=96)", "stage3(C=192)"
    ]
    total = sum(v["floor_ms"] for v in floors.values())
    # the modeled floor lands within the documented ~±30% constant uncertainty
    # of the measured 612 ms packed-kernel wall of the session-12 trace
    # (~630 modeled => measured/modeled ~0.97 — the quantitative content of
    # "the kernels are at this design's floor"); drifting outside this band
    # means the model or the kernels changed materially
    assert 450.0 < total < 800.0, total
    for v in floors.values():
        assert v["pairs"] > 0
        assert v["floor_ms"] == max(v["vpu_ms"], v["mxu_ms"], v["hbm_ms"])
