"""Import helpers for the read-only PyTorch reference at /root/reference.

The reference is imported (never copied) to produce golden values for parity tests.
kornia is not installed in this image, and several reference modules import it at
module scope, so a working substitute is injected: ``tests/kornia_ref.py`` — faithful
torch reimplementations of exactly the kornia ops the reference loss uses — is
installed under the ``kornia`` module names, which makes the reference ``MyLoss``
fully executable for end-to-end loss-parity tests.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub_kornia():
    if "kornia" in sys.modules:
        return
    sys.path.insert(0, "/root/repo/tests")
    import kornia_ref

    kornia = types.ModuleType("kornia")
    losses = types.ModuleType("kornia.losses")
    filters = types.ModuleType("kornia.filters")

    losses.ssim_loss = kornia_ref.ssim_loss
    losses.MS_SSIMLoss = kornia_ref.MS_SSIMLoss
    losses.PSNRLoss = kornia_ref.PSNRLoss
    filters.Canny = kornia_ref.Canny
    filters.Sobel = kornia_ref.Sobel
    kornia.losses = losses
    kornia.filters = filters
    sys.modules["kornia"] = kornia
    sys.modules["kornia.losses"] = losses
    sys.modules["kornia.filters"] = filters


def load_reference():
    """Make the reference importable; returns the /root/reference path."""
    _stub_kornia()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    return REFERENCE_PATH


def reference_model(model_config, seed: int = 0):
    """Instantiate the reference MyModel (torch, CPU) from our ModelConfig."""
    load_reference()
    import torch
    from torch import nn

    from a013_ModelDefinition import MyModel  # noqa: E402

    torch.manual_seed(seed)
    model = MyModel(
        window_size=tuple(model_config.window_size),
        merging_size=tuple(model_config.merging_size),
        in_dims_list=list(model_config.in_dims_list),
        out_dims_list=list(model_config.out_dims_list),
        att_num_heads=model_config.att_num_heads,
        att_dims_per_head_ratio=model_config.att_dims_per_head_ratio,
        attention_drop_ratio=model_config.attention_drop_ratio,
        linear_after_att_drop_ratio=model_config.linear_after_att_drop_ratio,
        mlp_hidden_dims_ratio=model_config.mlp_hidden_dims_ratio,
        mlp_activation_func=nn.ELU(),
        mlp_drop_ratio=model_config.mlp_drop_ratio,
        final_layer_att_dims_per_head_ratio=1,
        final_conv_layer_kernel_size=model_config.final_conv_layer_kernel_size,
        final_layer_mlp_hidden_dims_ratio=1,
    )
    return model


def torch_state_numpy(model):
    # .copy(): .numpy() returns a VIEW of the tensor's storage — without it, a later
    # in-place optimizer step would silently mutate a captured "initial" snapshot
    return {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}
