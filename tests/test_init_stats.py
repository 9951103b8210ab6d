"""From-scratch initialization statistics parity vs the torch reference.

The reference initializes every Linear/Conv2d weight with
``torch.nn.init.kaiming_normal_`` (fan_in, a=0 -> std = sqrt(2/fan_in)) and zero
biases (``/root/reference/a016_train.py:382-390``). The repo's per-stream weights are
stacked on a leading stream axis ``(S, in, out)``; the stream axis is a *batch* of
independent Linears, so fan_in must be ``in`` alone. These tests pin that (flax's
default ``variance_scaling`` would count S into fan_in, giving std sqrt(S) too small
— a real bug caught in round 1).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.layers import (
    StackedDense,
    stacked_kaiming_normal,
)


def _rel_err(a, b):
    return abs(a - b) / abs(b)


def test_stacked_kaiming_std_is_per_stream_fan_in():
    """std of each stream's (in, out) slice == sqrt(2/in), independent of S."""
    for s, in_dim, out_dim in [(2, 64, 192), (2, 384, 384), (4, 24, 72)]:
        k = stacked_kaiming_normal(jax.random.PRNGKey(0), (s, in_dim, out_dim), jnp.float32)
        expected = math.sqrt(2.0 / in_dim)
        for i in range(s):
            got = float(jnp.std(k[i]))
            # sampling error of std over N=in*out normal draws ~ expected/sqrt(2N)
            tol = 6.0 * expected / math.sqrt(2 * in_dim * out_dim)
            assert abs(got - expected) < tol, (s, in_dim, out_dim, i, got, expected)


def test_stacked_kaiming_matches_torch_kaiming_normal():
    """Empirical comparison against actual torch.nn.init.kaiming_normal_ draws."""
    torch = pytest.importorskip("torch")

    in_dim, out_dim = 96, 288
    k = stacked_kaiming_normal(jax.random.PRNGKey(1), (2, in_dim, out_dim), jnp.float32)
    w = torch.empty(out_dim, in_dim)
    torch.manual_seed(0)
    torch.nn.init.kaiming_normal_(w)
    jax_std = float(jnp.std(k[0]))
    torch_std = float(w.std())
    assert _rel_err(jax_std, torch_std) < 0.05, (jax_std, torch_std)
    # both should be near-zero-mean
    assert abs(float(jnp.mean(k))) < 0.01
    assert abs(float(w.mean())) < 0.01


def test_stacked_dense_module_init_std():
    """StackedDense params initialize with kaiming kernel + zero bias, like the ref."""
    m = StackedDense(streams=2, features=192)
    x = jnp.zeros((2, 3, 49, 64), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    kernel, bias = params["kernel"], params["bias"]
    assert kernel.shape == (2, 64, 192)
    expected = math.sqrt(2.0 / 64)
    assert _rel_err(float(jnp.std(kernel[0])), expected) < 0.05
    assert _rel_err(float(jnp.std(kernel[1])), expected) < 0.05
    assert float(jnp.abs(bias).max()) == 0.0


@pytest.mark.slow
def test_full_model_init_stats():
    """Spot-check real model init: attention qkv and final conv stds at torch values."""
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = ModelConfig()
    model = SwinFusionUNet(cfg)
    ir = jnp.zeros((1, 28, 28, 1), jnp.float32)
    vis = jnp.zeros((1, 28, 28, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ir, vis)["params"]

    flat = {"/".join(p.key for p in k): v for k, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}

    checked_stacked = checked_conv = 0
    for name, leaf in flat.items():
        arr = np.asarray(leaf)
        if name.endswith("kernel") and arr.ndim == 3 and arr.shape[0] == 2:
            expected = math.sqrt(2.0 / arr.shape[1])
            for i in range(2):
                assert _rel_err(float(arr[i].std()), expected) < 0.25, (name, i)
            checked_stacked += 1
        elif name.endswith("kernel") and arr.ndim == 4:  # conv (kh, kw, in, out)
            fan_in = arr.shape[0] * arr.shape[1] * arr.shape[2]
            expected = math.sqrt(2.0 / fan_in)
            assert _rel_err(float(arr.std()), expected) < 0.25, name
            checked_conv += 1
    assert checked_stacked >= 100  # qkv/proj/mlp/merge kernels across 10 stages
    assert checked_conv >= 2  # the two final-head convs
