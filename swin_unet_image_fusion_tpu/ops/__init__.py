from .shape_plan import StagePlan, make_plan, pad_amount
from .window import (
    apply_shift_mask,
    cyclic_shift,
    gather_relative_position_bias,
    relative_position_index,
    shift_attention_mask,
    window_partition,
    window_unpartition,
)
from .patch import (
    crop_bottom_right,
    depth_to_space,
    pad_reflect_bottom_right,
    space_to_depth,
)

__all__ = [
    "StagePlan",
    "make_plan",
    "pad_amount",
    "apply_shift_mask",
    "cyclic_shift",
    "gather_relative_position_bias",
    "relative_position_index",
    "shift_attention_mask",
    "window_partition",
    "window_unpartition",
    "crop_bottom_right",
    "depth_to_space",
    "pad_reflect_bottom_right",
    "space_to_depth",
]
