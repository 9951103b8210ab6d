"""PyTorch -> JAX checkpoint conversion.

Maps the reference's ``model_state`` dict (``/root/reference/a016_train.py:238-250``
saves ``{model_state, optimizer_state, scheduler_state, current_epoch}``) onto this
framework's flax variable tree, so users of the reference can migrate trained ``.pth``
checkpoints, and so the test suite can assert end-to-end numerical parity with golden
reference weights.

Key-name correspondence (reference module tree -> stacked flax params):

  encoder_list.{k}.1  (PatchMergingAndLinearLayer)        -> enc{k}_merge
  encoder_list.{k}.3  (SelfAndCrossBlockPair)             -> enc{k}_blocks
  decoder_list.{j}.0  (SelfAndCrossBlockPair, j = n-1-k)  -> dec{k}_blocks
  decoder_list.{j}.2  (PatchMergingAndLinearLayer)        -> dec{k}_unmerge
  final_layer.{0,1,3} (conv / BatchNorm / conv)           -> final_head

Within a SelfAndCrossBlockPair (a012_SelfAndCrossBlockPair.py:40-68):
  self_att_block.normal_window_block   -> self_normal
  self_att_block.shifted_window_block  -> self_shift
  cross_att_block.normal_window_block  -> cross_normal
  cross_att_block.shifted_window_block -> cross_shift

Per-stream torch weights (``*_x`` / ``*_y`` module pairs) are stacked on the leading
stream axis; torch ``nn.Linear`` weights (out, in) transpose to (in, out); 1x1
``nn.Conv2d`` weights (out, in, 1, 1) squeeze+transpose to (in, out); 3x3 conv weights
(O, I, kh, kw) go to HWIO.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from ..config import ModelConfig

Array = np.ndarray
StateDict = Mapping[str, Array]

_BLOCK_NAME_MAP = {
    "self_normal": "self_att_block.normal_window_block",
    "self_shift": "self_att_block.shifted_window_block",
    "cross_normal": "cross_att_block.normal_window_block",
    "cross_shift": "cross_att_block.shifted_window_block",
}


def _linear(sd: StateDict, x_prefix: str, y_prefix: str) -> Dict[str, Array]:
    """Stack a per-stream nn.Linear pair -> {'kernel': (2, in, out), 'bias': (2, out)}."""
    kernel = np.stack(
        [np.asarray(sd[f"{x_prefix}.weight"]).T, np.asarray(sd[f"{y_prefix}.weight"]).T]
    )
    out = {"kernel": kernel}
    if f"{x_prefix}.bias" in sd:
        out["bias"] = np.stack(
            [np.asarray(sd[f"{x_prefix}.bias"]), np.asarray(sd[f"{y_prefix}.bias"])]
        )
    return out


def _conv1x1(sd: StateDict, x_prefix: str, y_prefix: str) -> Dict[str, Array]:
    """Stack a per-stream 1x1 nn.Conv2d pair -> stacked dense params."""

    def w(p):
        return np.asarray(sd[f"{p}.weight"])[:, :, 0, 0].T  # (out,in,1,1)->(in,out)

    out = {"kernel": np.stack([w(x_prefix), w(y_prefix)])}
    if f"{x_prefix}.bias" in sd:
        out["bias"] = np.stack(
            [np.asarray(sd[f"{x_prefix}.bias"]), np.asarray(sd[f"{y_prefix}.bias"])]
        )
    return out


def _norm(sd: StateDict, x_prefix: str, y_prefix: str) -> Dict[str, Array]:
    return {
        "scale": np.stack(
            [np.asarray(sd[f"{x_prefix}.weight"]), np.asarray(sd[f"{y_prefix}.weight"])]
        ),
        "bias": np.stack(
            [np.asarray(sd[f"{x_prefix}.bias"]), np.asarray(sd[f"{y_prefix}.bias"])]
        ),
    }


def _attention(sd: StateDict, prefix: str) -> Dict[str, Dict[str, Array]]:
    """One AutoPathWinAtt (a002) -> stacked DualWindowAttention params."""
    wx = f"{prefix}.window_attention_x"
    wy = f"{prefix}.window_attention_y"
    return {
        "q": _linear(sd, f"{wx}.q_for_heads", f"{wy}.q_for_heads"),
        "k": _linear(sd, f"{wx}.k_for_heads", f"{wy}.k_for_heads"),
        "v": _linear(sd, f"{wx}.v_for_heads", f"{wy}.v_for_heads"),
        "proj": _linear(sd, f"{wx}.linear_projection", f"{wy}.linear_projection"),
        "rel_pos_bias_table": np.stack(
            [
                np.asarray(sd[f"{wx}.relative_position_bias_table"]),
                np.asarray(sd[f"{wy}.relative_position_bias_table"]),
            ]
        ),
    }


def _basic_block(sd: StateDict, prefix: str) -> Dict:
    """One BasicBlock (a005): stage_1 (LN + attention), stage_2 (LN + MLP)."""
    return {
        "norm1": _norm(sd, f"{prefix}.stage_1.norm_layer_1", f"{prefix}.stage_1.norm_layer_2"),
        "attn": _attention(sd, f"{prefix}.auto_path_win_att"),
        "norm2": _norm(sd, f"{prefix}.stage_2.norm_layer_1", f"{prefix}.stage_2.norm_layer_2"),
        "mlp": {
            "fc1": _conv1x1(sd, f"{prefix}.auto_path_mlp.mlp_x_1", f"{prefix}.auto_path_mlp.mlp_y_1"),
            "fc2": _conv1x1(sd, f"{prefix}.auto_path_mlp.mlp_x_2", f"{prefix}.auto_path_mlp.mlp_y_2"),
        },
    }


def _block_pair(sd: StateDict, prefix: str) -> Dict:
    return {
        ours: _basic_block(sd, f"{prefix}.{theirs}")
        for ours, theirs in _BLOCK_NAME_MAP.items()
    }


def _merge_layer(sd: StateDict, prefix: str) -> Dict:
    return {
        "linear": _conv1x1(sd, f"{prefix}.mlp_layer_x", f"{prefix}.mlp_layer_y"),
        "norm": _norm(sd, f"{prefix}.layer_norm_x", f"{prefix}.layer_norm_y"),
    }


def _conv_hwio(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_torch_state_dict(
    state_dict: StateDict, cfg: ModelConfig
) -> Tuple[Dict, Dict]:
    """Convert a reference ``model_state`` dict to ``(params, batch_stats)`` trees.

    ``state_dict`` values may be torch tensors or numpy arrays (anything
    ``np.asarray`` accepts). The result plugs straight into
    ``model.apply({'params': params, 'batch_stats': batch_stats}, ...)``.
    """
    n = cfg.num_stages
    params: Dict = {}
    for k in range(n):
        params[f"enc{k}_merge"] = _merge_layer(state_dict, f"encoder_list.{k}.1")
        params[f"enc{k}_blocks"] = _block_pair(state_dict, f"encoder_list.{k}.3")
        j = n - 1 - k  # decoder_list is ordered [stage n-1 ... stage 0] (a013:182-200)
        params[f"dec{k}_blocks"] = _block_pair(state_dict, f"decoder_list.{j}.0")
        params[f"dec{k}_unmerge"] = _merge_layer(state_dict, f"decoder_list.{j}.2")

    params["final_head"] = {
        "conv1": _conv_hwio(state_dict, "final_layer.0"),
        "bn": {
            "scale": np.asarray(state_dict["final_layer.1.weight"]),
            "bias": np.asarray(state_dict["final_layer.1.bias"]),
        },
        "conv2": _conv_hwio(state_dict, "final_layer.3"),
    }
    batch_stats = {
        "final_head": {
            "bn": {
                "mean": np.asarray(state_dict["final_layer.1.running_mean"]),
                "var": np.asarray(state_dict["final_layer.1.running_var"]),
            }
        }
    }
    return params, batch_stats


def load_torch_checkpoint(path: str, cfg: ModelConfig) -> Tuple[Dict, Dict, int]:
    """Load a reference ``.pth`` file -> (params, batch_stats, finished_epoch).

    Requires torch (CPU build is enough). Inference checkpoints only carry
    ``model_state`` (a017_test.py:50-54); trainer state is re-created fresh.
    """
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    model_state = state["model_state"] if "model_state" in state else state
    numpy_state = {k: v.detach().cpu().numpy() for k, v in model_state.items()}
    params, batch_stats = convert_torch_state_dict(numpy_state, cfg)
    epoch = int(state.get("current_epoch", 0)) if isinstance(state, dict) else 0
    return params, batch_stats, epoch
