"""JAX -> PyTorch checkpoint export (inverse of ``torch_import``).

Produces a state dict keyed exactly like the reference model's ``state_dict()``
(``/root/reference/a013_ModelDefinition.py`` module tree), so checkpoints trained with
this framework can be loaded back into the original PyTorch implementation — the
migration path works in both directions. Shared-module aliases the reference's
state_dict contains (``stage_1.other_module.*`` etc. point at the same tensors as
``auto_path_win_att.*``) are emitted too, so ``load_state_dict`` is strict-compatible.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..config import ModelConfig
from .torch_import import _BLOCK_NAME_MAP

Array = np.ndarray


def _unstack_linear(dst: Dict[str, Array], params: Dict, x_prefix: str, y_prefix: str):
    kernel = np.asarray(params["kernel"])  # (2, in, out)
    dst[f"{x_prefix}.weight"] = kernel[0].T
    dst[f"{y_prefix}.weight"] = kernel[1].T
    if "bias" in params:
        bias = np.asarray(params["bias"])
        dst[f"{x_prefix}.bias"] = bias[0]
        dst[f"{y_prefix}.bias"] = bias[1]


def _unstack_conv1x1(dst, params, x_prefix, y_prefix):
    kernel = np.asarray(params["kernel"])  # (2, in, out) -> (out, in, 1, 1)
    dst[f"{x_prefix}.weight"] = kernel[0].T[:, :, None, None]
    dst[f"{y_prefix}.weight"] = kernel[1].T[:, :, None, None]
    if "bias" in params:
        bias = np.asarray(params["bias"])
        dst[f"{x_prefix}.bias"] = bias[0]
        dst[f"{y_prefix}.bias"] = bias[1]


def _unstack_norm(dst, params, x_prefix, y_prefix):
    scale = np.asarray(params["scale"])
    bias = np.asarray(params["bias"])
    dst[f"{x_prefix}.weight"] = scale[0]
    dst[f"{y_prefix}.weight"] = scale[1]
    dst[f"{x_prefix}.bias"] = bias[0]
    dst[f"{y_prefix}.bias"] = bias[1]


def _attention(dst, params, prefix):
    wx = f"{prefix}.window_attention_x"
    wy = f"{prefix}.window_attention_y"
    _unstack_linear(dst, params["q"], f"{wx}.q_for_heads", f"{wy}.q_for_heads")
    _unstack_linear(dst, params["k"], f"{wx}.k_for_heads", f"{wy}.k_for_heads")
    _unstack_linear(dst, params["v"], f"{wx}.v_for_heads", f"{wy}.v_for_heads")
    _unstack_linear(dst, params["proj"], f"{wx}.linear_projection", f"{wy}.linear_projection")
    table = np.asarray(params["rel_pos_bias_table"])
    dst[f"{wx}.relative_position_bias_table"] = table[0]
    dst[f"{wy}.relative_position_bias_table"] = table[1]


def _basic_block(dst, params, prefix):
    _unstack_norm(dst, params["norm1"], f"{prefix}.stage_1.norm_layer_1", f"{prefix}.stage_1.norm_layer_2")
    _unstack_norm(dst, params["norm2"], f"{prefix}.stage_2.norm_layer_1", f"{prefix}.stage_2.norm_layer_2")
    _attention(dst, params["attn"], f"{prefix}.auto_path_win_att")
    # the reference registers the same modules again under stage_X.other_module
    _attention(dst, params["attn"], f"{prefix}.stage_1.other_module")
    mlp = params["mlp"]
    # AutoPathMLP registers each conv twice: as mlp_{x,y}_{1,2} and inside the
    # nn.Sequential as sequence_{x,y}.{0,3} (a003_AutoPathMLP.py:21-44); emit all
    # aliases (and the stage_2.other_module shared-module paths) for strict loading.
    for mlp_prefix in (f"{prefix}.auto_path_mlp", f"{prefix}.stage_2.other_module"):
        _unstack_conv1x1(dst, mlp["fc1"], f"{mlp_prefix}.mlp_x_1", f"{mlp_prefix}.mlp_y_1")
        _unstack_conv1x1(dst, mlp["fc2"], f"{mlp_prefix}.mlp_x_2", f"{mlp_prefix}.mlp_y_2")
        _unstack_conv1x1(dst, mlp["fc1"], f"{mlp_prefix}.sequence_x.0", f"{mlp_prefix}.sequence_y.0")
        _unstack_conv1x1(dst, mlp["fc2"], f"{mlp_prefix}.sequence_x.3", f"{mlp_prefix}.sequence_y.3")


def _block_pair(dst, params, prefix):
    for ours, theirs in _BLOCK_NAME_MAP.items():
        _basic_block(dst, params[ours], f"{prefix}.{theirs}")


def _merge_layer(dst, params, prefix):
    _unstack_conv1x1(dst, params["linear"], f"{prefix}.mlp_layer_x", f"{prefix}.mlp_layer_y")
    _unstack_norm(dst, params["norm"], f"{prefix}.layer_norm_x", f"{prefix}.layer_norm_y")
    # buffer the reference registers on every PatchMergingAndLinearLayer (a011:67)
    dst[f"{prefix}.buffer_to_show_device"] = np.zeros((1,), np.float32)


def export_torch_state_dict(params: Dict, batch_stats: Dict, cfg: ModelConfig) -> Dict[str, Array]:
    """Flax variable trees -> reference-keyed numpy state dict."""
    n = cfg.num_stages
    out: Dict[str, Array] = {}
    for k in range(n):
        out_prefix = f"encoder_list.{k}"
        _merge_layer(out, params[f"enc{k}_merge"], f"{out_prefix}.1")
        _block_pair(out, params[f"enc{k}_blocks"], f"{out_prefix}.3")
        j = n - 1 - k
        _block_pair(out, params[f"dec{k}_blocks"], f"decoder_list.{j}.0")
        _merge_layer(out, params[f"dec{k}_unmerge"], f"decoder_list.{j}.2")

    head = params["final_head"]
    out["final_layer.0.weight"] = np.asarray(head["conv1"]["kernel"]).transpose(3, 2, 0, 1)
    out["final_layer.0.bias"] = np.asarray(head["conv1"]["bias"])
    out["final_layer.1.weight"] = np.asarray(head["bn"]["scale"])
    out["final_layer.1.bias"] = np.asarray(head["bn"]["bias"])
    bn_stats = batch_stats["final_head"]["bn"]
    out["final_layer.1.running_mean"] = np.asarray(bn_stats["mean"])
    out["final_layer.1.running_var"] = np.asarray(bn_stats["var"])
    out["final_layer.1.num_batches_tracked"] = np.asarray(0, np.int64)
    out["final_layer.3.weight"] = np.asarray(head["conv2"]["kernel"]).transpose(3, 2, 0, 1)
    out["final_layer.3.bias"] = np.asarray(head["conv2"]["bias"])
    return out


def save_torch_checkpoint(path: str, params, batch_stats, cfg: ModelConfig, epoch: int = 0):
    """Write a reference-format .pth (model_state + epoch; trainer state fresh)."""
    import torch

    state_dict = {
        k: torch.from_numpy(np.ascontiguousarray(v)) if isinstance(v, np.ndarray) else torch.tensor(v)
        for k, v in export_torch_state_dict(params, batch_stats, cfg).items()
    }
    torch.save(
        {
            "model_state": state_dict,
            "optimizer_state": {},
            "scheduler_state": {},
            "current_epoch": epoch,
        },
        path,
    )
