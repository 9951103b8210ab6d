"""Static per-stage shape plan.

TPU-native replacement for the reference's stateful shape plumbing: the PyTorch
implementation threads dynamic feature shapes and pad amounts from the encoder to the
mirrored decoder stage through two shared LIFO ``StateRecorder`` stacks
(``/root/reference/a006_PaddingOperation.py:38-52,161-165``,
``/root/reference/a010_StateRecorder.py``). Under ``jax.jit`` every shape is a Python int
at trace time, so the entire stack mechanism dissolves into this pure function: given the
input (H, W) it returns the exact pad/crop spec for every stage, and the decoder simply
reads the mirrored entry — compile-time constants, no runtime state.

Pad semantics match the reference exactly: pad amount ``(t - L mod t) mod t`` on the
bottom/right only, reflect mode (``a006_PaddingOperation.py:54-56,111-131``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


def pad_amount(length: int, tile: int) -> int:
    """(tile - length % tile) % tile — reference a006_PaddingOperation.py:54-56."""
    return (tile - length % tile) % tile


@dataclass(frozen=True)
class StagePlan:
    """Shape bookkeeping for one encoder stage (mirrored by the matching decoder stage).

    Encoder stage k (reference ``a013_ModelDefinition.py:262-309``) applies:
      pad_merge -> patch-merge (H,W //= merging) -> pad_win -> attention blocks.
    The mirrored decoder stage applies the reverse:
      attention blocks -> crop pad_win -> anti-merge (H,W *= merging) -> crop pad_merge.
    """

    in_hw: Tuple[int, int]  # stage input resolution (pre-pad)
    pad_merge: Tuple[int, int]  # bottom/right pad so H,W divide merging_size
    merged_hw: Tuple[int, int]  # resolution after patch merging
    pad_win: Tuple[int, int]  # bottom/right pad so H,W divide window_size
    att_hw: Tuple[int, int]  # resolution at which the attention blocks run

    @property
    def padded_in_hw(self) -> Tuple[int, int]:
        return (self.in_hw[0] + self.pad_merge[0], self.in_hw[1] + self.pad_merge[1])


def make_plan(
    h: int,
    w: int,
    num_stages: int,
    merging_size: Tuple[int, int],
    window_size: Tuple[int, int],
) -> Tuple[StagePlan, ...]:
    """Compute the full per-stage pad/merge plan for an input of (h, w).

    Stage i+1's input resolution is stage i's attention resolution (the encoder's
    blocks output at the window-padded size, reference ``a013_ModelDefinition.py:215-220``).
    """
    plans = []
    cur_h, cur_w = h, w
    for _ in range(num_stages):
        pm = (pad_amount(cur_h, merging_size[0]), pad_amount(cur_w, merging_size[1]))
        ph, pw = cur_h + pm[0], cur_w + pm[1]
        mh, mw = ph // merging_size[0], pw // merging_size[1]
        pwin = (pad_amount(mh, window_size[0]), pad_amount(mw, window_size[1]))
        ah, aw = mh + pwin[0], mw + pwin[1]
        plans.append(
            StagePlan(
                in_hw=(cur_h, cur_w),
                pad_merge=pm,
                merged_hw=(mh, mw),
                pad_win=pwin,
                att_hw=(ah, aw),
            )
        )
        cur_h, cur_w = ah, aw
    return tuple(plans)
