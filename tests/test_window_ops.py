"""Unit tests for window partition / shift / bias / mask vs the torch reference kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from swin_unet_image_fusion_tpu.ops.shape_plan import make_plan, pad_amount
from swin_unet_image_fusion_tpu.ops.window import (
    cyclic_shift,
    gather_relative_position_bias,
    relative_position_index,
    shift_attention_mask,
    window_partition,
    window_unpartition,
)
from swin_unet_image_fusion_tpu.ops.patch import (
    crop_bottom_right,
    depth_to_space,
    pad_reflect_bottom_right,
    space_to_depth,
)

from reference_loader import load_reference


def test_window_partition_matches_reference_einops(rng):
    """Our NHWC partition == reference's NCHW einops rearrange_1 (a001:154-172)."""
    load_reference()
    import torch
    from a001_WindowAttention import WindowAttention

    b, c, h, w = 3, 5, 14, 21
    x = rng.standard_normal((b, c, h, w)).astype(np.float32)

    wa = WindowAttention(
        in_out_dims=c, num_heads=1, dims_per_head=c, window_size=(7, 7),
        use_cyclic_shift=False, use_cross_attention=False, use_qkv_bias=True,
        attention_drop_ratio=0, linear_after_att_drop_ratio=0,
    )
    wa.eval()
    wa.initialize_feature_shape_hw(torch.from_numpy(x))
    ref = wa.rearrange_1(torch.from_numpy(x)).numpy()  # (B*nw, T, C)

    ours = window_partition(jnp.asarray(x.transpose(0, 2, 3, 1)), (7, 7))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=0, atol=0)

    # and the inverse round-trips
    back = window_unpartition(ours, (7, 7), (h, w))
    np.testing.assert_array_equal(np.asarray(back), x.transpose(0, 2, 3, 1))


def test_cyclic_shift_matches_torch_roll(rng):
    import torch

    x = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    ours = cyclic_shift(jnp.asarray(x), (7, 7), reverse=False)
    ref = torch.roll(torch.from_numpy(x), shifts=(-3, -3), dims=(1, 2)).numpy()
    np.testing.assert_array_equal(np.asarray(ours), ref)

    undone = cyclic_shift(ours, (7, 7), reverse=True)
    np.testing.assert_array_equal(np.asarray(undone), x)


def test_relative_position_index_matches_reference():
    load_reference()
    from a001_WindowAttention import WindowAttention

    wa = WindowAttention(
        in_out_dims=3, num_heads=1, dims_per_head=3, window_size=(7, 7),
        use_cyclic_shift=False, use_cross_attention=False, use_qkv_bias=True,
        attention_drop_ratio=0, linear_after_att_drop_ratio=0,
    )
    ref_idx = wa.relative_position_bias_indices.numpy()  # (2, T, T)
    ours = relative_position_index((7, 7))
    np.testing.assert_array_equal(ours, ref_idx)


def test_bias_gather_matches_reference(rng):
    load_reference()
    import torch
    from a001_WindowAttention import WindowAttention

    wa = WindowAttention(
        in_out_dims=3, num_heads=1, dims_per_head=3, window_size=(7, 7),
        use_cyclic_shift=False, use_cross_attention=False, use_qkv_bias=True,
        attention_drop_ratio=0, linear_after_att_drop_ratio=0,
    )
    table = rng.standard_normal((13, 13)).astype(np.float32)
    with torch.no_grad():
        wa.relative_position_bias_table.copy_(torch.from_numpy(table))
    ref = wa.get_new_relative_position_bias().detach().numpy()
    ours = gather_relative_position_bias(jnp.asarray(table), (7, 7))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


@pytest.mark.parametrize("hw", [(14, 14), (21, 28), (7, 35)])
def test_shift_mask_matches_reference(hw):
    """Mask construction == a001:217-272 (region-id grid -> per-window inequality)."""
    load_reference()
    import torch
    from a001_WindowAttention import WindowAttention

    wa = WindowAttention(
        in_out_dims=3, num_heads=1, dims_per_head=3, window_size=(7, 7),
        use_cyclic_shift=True, use_cross_attention=False, use_qkv_bias=True,
        attention_drop_ratio=0, linear_after_att_drop_ratio=0,
    )
    wa.eval()
    wa.initialize_feature_shape_hw(torch.zeros((1, 3, hw[0], hw[1])))
    wa.initialize_mask_for_cyclic_shift()
    ref = wa.mask_for_cyclic_shift.numpy()
    ours = shift_attention_mask(hw, (7, 7))
    np.testing.assert_array_equal(ours, ref)


def test_pad_reflect_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, 10, 9)).astype(np.float32)
    ref = F.pad(torch.from_numpy(x), (0, 5, 0, 4), mode="reflect").numpy()
    ours = pad_reflect_bottom_right(jnp.asarray(x.transpose(0, 2, 3, 1)), (4, 5))
    np.testing.assert_array_equal(np.asarray(ours).transpose(0, 3, 1, 2), ref)

    cropped = crop_bottom_right(ours, (4, 5))
    np.testing.assert_array_equal(np.asarray(cropped).transpose(0, 3, 1, 2), x)


def test_space_to_depth_matches_reference_channel_order(rng):
    """Merged channel order must be (ph pw c) — a011_PatchOperation.py:87-94."""
    load_reference()
    import torch
    from a011_PatchOperation import PatchMergingAndLinearLayer
    from a010_StateRecorder import StateRecorder

    layer = PatchMergingAndLinearLayer(
        belongs_to_encoder=True, use_dual_path=False, in_dims=3, out_dims=6,
        patch_merging_size_recorder=StateRecorder(), merging_or_unmerging_size=(2, 2),
    )
    x = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)
    ref = layer.do_patch_merging_for_one_tensor(torch.from_numpy(x)).numpy()

    ours = space_to_depth(jnp.asarray(x.transpose(0, 2, 3, 1)), (2, 2))
    np.testing.assert_array_equal(np.asarray(ours).transpose(0, 3, 1, 2), ref)

    # depth_to_space inverts exactly (the reference's undo, a011:96-117)
    back = layer.undo_patch_merging_for_one_tensor(torch.from_numpy(ref)).numpy()
    np.testing.assert_array_equal(back, x)
    ours_back = depth_to_space(ours, (2, 2))
    np.testing.assert_array_equal(np.asarray(ours_back).transpose(0, 3, 1, 2), x)


@pytest.mark.parametrize("hw", [(100, 90), (224, 224), (57, 43), (512, 512)])
def test_shape_plan_round_trip(hw):
    plan = make_plan(hw[0], hw[1], 5, (2, 2), (7, 7))
    for p in plan:
        assert p.att_hw[0] % 7 == 0 and p.att_hw[1] % 7 == 0
        assert p.padded_in_hw[0] % 2 == 0 and p.padded_in_hw[1] % 2 == 0
        assert p.merged_hw == (p.padded_in_hw[0] // 2, p.padded_in_hw[1] // 2)
    # stage i+1 consumes stage i's attention resolution
    for a, b in zip(plan, plan[1:]):
        assert b.in_hw == a.att_hw


def test_pad_amount():
    assert pad_amount(14, 7) == 0
    assert pad_amount(15, 7) == 6
    assert pad_amount(20, 7) == 1
    assert pad_amount(6, 2) == 0


def test_rows_per_tile_budget():
    from swin_unet_image_fusion_tpu.ops.pallas_attention import rows_per_tile

    # stage-0-like: big rows stay at 1
    assert rows_per_tile(37, 74, 56, 24) == 1
    # deep-stage-like: whole feature map fits one tile
    assert rows_per_tile(2, 2, 56, 384) == 2
    # must divide n_rows
    r = rows_per_tile(6, 3, 56, 96)
    assert 6 % r == 0
    # always at least 1 even over budget
    assert rows_per_tile(5, 1000, 56, 4096) == 1


@pytest.mark.slow
def test_model_random_odd_sizes(rng):
    """Property-style: the tiny model round-trips arbitrary sizes (pad plan + shift
    masks at many aspect ratios), finite output in [0,1] after clamp."""
    import jax
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = ModelConfig(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    model = SwinFusionUNet(cfg)
    variables = None
    for h, w in [(17, 93), (64, 31), (50, 50), (41, 87)]:
        ir = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
        vis = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), ir, vis)
        out = model.apply(variables, ir, vis)
        assert out.shape == (1, h, w, 1)
        assert np.isfinite(np.asarray(out)).all()
