"""Config tree and CLI override tests."""

import pytest

from swin_unet_image_fusion_tpu.config import Config, config_from_cli


def test_defaults_match_reference():
    """Defaults must equal the reference A000_CONFIG.py values."""
    cfg = Config()
    assert cfg.model.window_size == (7, 7)
    assert cfg.model.merging_size == (2, 2)
    assert cfg.model.in_dims_list == (1, 24, 48, 96, 192)
    assert cfg.model.out_dims_list == (24, 48, 96, 192, 384)
    assert cfg.model.att_num_heads == 8
    assert cfg.optim.lr == 1e-2
    assert cfg.optim.minimum_lr == 1e-5
    assert cfg.optim.scheduler_t0 == 20
    assert cfg.optim.batch_size == 20
    assert cfg.optim.training_set_ratio == 0.99
    assert cfg.loss.ssim_scale == 0.305
    assert cfg.loss.texture_scale == 250
    assert cfg.loss.intensity_scale == 45
    assert cfg.loss.fus_ir_ssim_weight == 0.2
    assert cfg.epsilon == 1e-10


def test_cli_overrides():
    cfg = config_from_cli(
        ["optim.lr=3e-4", "model.compute_dtype=bfloat16", "optim.epochs=7",
         "data.training_dataset_folder=/tmp/x", "model.remat=true", "seed=5"]
    )
    assert cfg.optim.lr == 3e-4
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.optim.epochs == 7
    assert cfg.data.training_dataset_folder == "/tmp/x"
    assert cfg.model.remat is True
    assert cfg.seed == 5
    # frozen: the original default object is untouched
    assert Config().optim.lr == 1e-2


def test_cli_rejects_garbage():
    with pytest.raises(ValueError):
        config_from_cli(["no_equals_sign"])
    with pytest.raises(ValueError):
        config_from_cli(["a.b.c.d=1"])


def test_cli_none_for_optional_field():
    """model.attention_jnp_max_tokens=None must disable the gate (config.py docs)."""
    cfg = config_from_cli(["model.attention_jnp_max_tokens=None"])
    assert cfg.model.attention_jnp_max_tokens is None
    # and a value round-trips back from None-default-free ints
    cfg2 = config_from_cli(["model.attention_jnp_max_tokens=784"])
    assert cfg2.model.attention_jnp_max_tokens == 784


def test_cli_none_rejected_for_non_optional_field():
    with pytest.raises(ValueError):
        config_from_cli(["optim.lr=None"])


def test_cli_unknown_key_errors_with_valid_keys():
    with pytest.raises(ValueError, match="valid keys"):
        config_from_cli(["optim.learning_rate=1e-3"])
    with pytest.raises(ValueError, match="valid keys"):
        config_from_cli(["optimm.lr=1e-3"])
    with pytest.raises(ValueError, match="valid keys"):
        config_from_cli(["sseed=5"])


def test_cli_type_errors_are_loud():
    # non-literal for a float field: no silent raw-string fallback
    with pytest.raises(ValueError, match="expected float"):
        config_from_cli(["optim.lr=fast"])
    # bool garbage errors instead of silently meaning False
    with pytest.raises(ValueError, match="bool"):
        config_from_cli(["model.remat=maybe"])
    # tuples still parse
    cfg = config_from_cli(["model.window_size=(5,5)", "model.in_dims_list=[1,8]"])
    assert cfg.model.window_size == (5, 5)
    assert cfg.model.in_dims_list == (1, 8)


def test_dims_per_head_floor():
    cfg = Config().model
    assert [cfg.dims_per_head(d) for d in cfg.out_dims_list] == [3, 6, 12, 24, 48]


def test_auto_attention_impl_resolves_to_jnp_on_cpu():
    from swin_unet_image_fusion_tpu.config import ModelConfig

    cfg = ModelConfig(attention_impl="auto")
    assert cfg.resolved_attention_impl() == "jnp"  # tests force the CPU backend
    assert ModelConfig().attention_impl == "auto"  # fast path is the default
    assert ModelConfig().resolved_attention_impl() == "jnp"


def test_attention_impl_dropout_resolution():
    """Reference-legal dropout configs (a001:20-22) must not crash the fused paths:
    every Pallas impl runs dropout natively in-kernel (ops/hash_dropout.py)."""
    from swin_unet_image_fusion_tpu.config import ModelConfig

    for impl in ["pallas", "pallas_pack", "pallas_block"]:
        cfg = ModelConfig(attention_impl=impl, mlp_drop_ratio=0.1)
        assert cfg.resolved_attention_impl() == impl
    # zero ratios keep the explicit choice
    assert ModelConfig(attention_impl="pallas").resolved_attention_impl() == "pallas"


@pytest.mark.slow
def test_auto_attention_impl_model_runs():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = ModelConfig(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
        attention_impl="auto",
    )
    model = SwinFusionUNet(cfg)
    ir = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 1), np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir, ir)
    out = model.apply(variables, ir, ir)
    assert out.shape == (1, 16, 16, 1)


def test_attention_jnp_max_tokens_gate():
    """attention_jnp_max_tokens routes sub-threshold non-packed stages to the jnp
    composition: with every stage gated, a pallas-impl model is bit-identical to
    the jnp model (same param tree, same ops)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    base = dict(
        in_dims_list=(1, 128), out_dims_list=(128, 256),  # impl="pallas": no cmajor
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    gated = SwinFusionUNet(
        ModelConfig(attention_impl="pallas", attention_jnp_max_tokens=10_000, **base)
    )
    ref = SwinFusionUNet(ModelConfig(attention_impl="jnp", **base))
    ir = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 1), np.float32))
    variables = jax.jit(ref.init)(jax.random.PRNGKey(0), ir, ir)
    # identical param tree: the gated model accepts the jnp model's params
    out_g = gated.apply(variables, ir, ir)
    out_r = ref.apply(variables, ir, ir)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_r))


def test_interpret_impls_never_gated():
    """*_interpret impls are exempt from attention_jnp_max_tokens (default 49):
    CPU kernel tests must keep exercising the pallas path even at the minimum
    7x7=49-token map, or the gate would silently reroute their coverage to jnp."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    base = dict(
        in_dims_list=(1,), out_dims_list=(8,),  # single stage: one 7x7 att map
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    ir = jnp.asarray(np.random.default_rng(0).random((1, 7, 7, 1), np.float32))

    def jaxpr_of(cfg):
        model = SwinFusionUNet(cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir, ir)
        return str(jax.make_jaxpr(lambda v, a, b: model.apply(v, a, b))(
            variables, ir, ir))

    # interpret impl at a 49-token map: the kernel primitive must still be traced
    kept = jaxpr_of(ModelConfig(
        attention_impl="pallas_interpret", attention_jnp_max_tokens=49, **base))
    assert "pallas_call" in kept
    # the real impl at the same map IS gated to jnp (the measured train win)
    gated = jaxpr_of(ModelConfig(
        attention_impl="pallas", attention_jnp_max_tokens=49, **base))
    assert "pallas_call" not in gated
