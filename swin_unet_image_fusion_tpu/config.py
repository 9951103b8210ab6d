"""Frozen dataclass configuration tree.

TPU-native replacement for the reference's flat constants module
(``/root/reference/A000_CONFIG.py:6-78``): instead of a mutable module holding live
``nn.Module`` objects and Windows paths, the configuration is an immutable, hashable
dataclass tree that can be closed over by ``jax.jit`` and overridden from the CLI.

The default values reproduce the reference's training configuration exactly
(``A000_CONFIG.py:19-69``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Model shape hyper-parameters (reference ``A000_CONFIG.py:54-69``)."""

    window_size: Tuple[int, int] = (7, 7)
    merging_size: Tuple[int, int] = (2, 2)
    in_dims_list: Tuple[int, ...] = (1, 24, 48, 96, 192)
    out_dims_list: Tuple[int, ...] = (24, 48, 96, 192, 384)
    att_num_heads: int = 8
    att_dims_per_head_ratio: float = 1 / 8
    attention_drop_ratio: float = 0.0
    linear_after_att_drop_ratio: float = 0.0
    mlp_hidden_dims_ratio: int = 4
    mlp_activation: str = "elu"  # enum name instead of a live nn.ELU instance
    mlp_drop_ratio: float = 0.0
    final_conv_layer_kernel_size: int = 3
    use_qkv_bias: bool = True
    # Compute dtype for the hot path. Params are always fp32; "bfloat16" enables the
    # MXU-native mixed-precision path, "float32" is the parity mode.
    compute_dtype: str = "float32"
    # Window-attention implementation (all differentiable via custom VJPs):
    #   "auto"         — (default) "pallas_pack" on TPU backends, "jnp" elsewhere
    #   "jnp"          — XLA-fused composition (safest to compile)
    #   "pallas"       — fused attention kernel (2.1x faster e2e at 512^2 bf16)
    #   "pallas_block" — fully fused LN+attention+MLP block kernel
    #   "pallas_pack"  — lane-packed C-major block kernel at small-C stages (zero
    #                    HBM lane padding; differentiable), "pallas" at deep stages.
    #                    Fastest measured on TPU: 33.1 pairs/s @512^2 bf16 vs 26.9
    #                    ("pallas") / 13.0 ("jnp") — docs/BENCHMARKS.md
    #   "*_interpret"  — interpreter-mode variants for CPU tests
    attention_impl: str = "auto"
    # Deep-stage escape hatch: non-packed stages whose attention map has at most
    # this many tokens (H*W) run the jnp composition instead of the NHWC Pallas
    # kernel — at tiny maps XLA's fused tiny-matmul code beats the per-call kernel
    # overhead. Default 49 gates exactly the window-size-7 minimum map (the 7x7
    # deepest stage of 224^2 training: 130.1 -> 127.4 ms/step measured; 784 — both
    # deep stages — was a measured LOSS, 137.4). 512^2 maps are all >= 256 tokens,
    # so inference is unaffected. None disables the gate; "*_interpret" impls are
    # never gated (they exist to exercise the kernel path in CPU tests). Numerics
    # class is unchanged (both paths are parity-tested). See docs/ROADMAP.md.
    attention_jnp_max_tokens: Optional[int] = 49

    def resolved_attention_impl(self) -> str:
        """Resolve "auto" against the runtime backend (TPU -> the packed kernels).

        Dropout runs natively on every Pallas impl ("pallas", "pallas_pack",
        "pallas_block"): in-kernel hash masks (ops/hash_dropout.py), so every
        reference-legal config (a001_WindowAttention.py:20-22,
        a003_AutoPathMLP.py:26-31) trains on every impl setting.
        """
        impl = self.attention_impl
        if impl == "auto":
            import jax

            try:
                is_tpu = any(
                    d.platform == "tpu" or d.device_kind.lower().startswith("tpu")
                    for d in jax.devices()
                )
            except Exception:
                is_tpu = False
            impl = "pallas_pack" if is_tpu else "jnp"
        return impl
    # Rematerialise each stage's block pair on the backward pass (jax.checkpoint):
    # trades ~1/3 extra FLOPs for O(num_blocks) less activation HBM — enables bigger
    # batches / resolutions in training.
    remat: bool = False
    # Mesh axis name for cross-device BatchNorm statistics under shard_map (GSPMD jit
    # computes global stats automatically; explicit shard_map needs the axis name).
    bn_axis_name: str = ""

    @property
    def num_stages(self) -> int:
        return len(self.in_dims_list)

    def dims_per_head(self, stage_dims: int) -> int:
        import math

        return math.floor(stage_dims * self.att_dims_per_head_ratio)


@dataclass(frozen=True)
class LossConfig:
    """Loss switches & weights (reference ``A000_CONFIG.py:32-52``)."""

    choose_ms_ssim: bool = True
    fus_ir_ssim_weight: float = 0.2
    choose_canny_else_sobel: bool = False
    use_psnr: bool = False
    fus_ir_psnr_weight: float = 0.4
    ssim_scale: float = 0.305
    texture_scale: float = 250.0
    intensity_scale: float = 45.0
    psnr_scale: float = 0.0
    ssim_loss_ratio: float = 1 / 3
    texture_loss_ratio: float = 1 / 3
    intensity_loss_ratio: float = 1 / 3
    psnr_loss_ratio: float = 0.0
    ssim_window_size: int = 11  # single-scale SSIM window (a008_loss.py:27)


@dataclass(frozen=True)
class OptimConfig:
    """Optimiser / schedule (reference ``A000_CONFIG.py:19-26``, ``a016_train.py:67-72``)."""

    lr: float = 1e-2
    minimum_lr: float = 1e-5
    scheduler_t0: int = 20  # cosine warm-restart period, in epochs
    epochs: int = 20
    batch_size: int = 20
    training_set_ratio: float = 0.99
    drop_last: bool = True
    # Stability guards, OFF by default for reference parity (the lr=1e-2 recipe is
    # at a stability edge — docs/BENCHMARKS.md trained-quality part 2). See
    # optim.py::make_optimizer.
    grad_clip_norm: float = 0.0  # >0 -> optax.clip_by_global_norm
    skip_nonfinite_updates: bool = False  # -> optax.apply_if_finite


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths and augmentation (reference ``A000_CONFIG.py:15-17``, ``a015_dataset.py``)."""

    training_dataset_folder: str = "./data/train"
    test_dataset_folder: str = "./test/input"
    test_result_folder: str = "./test/output"
    crop_size: Tuple[int, int] = (224, 224)
    hflip_prob: float = 0.5
    # torchvision RandomResizedCrop defaults, reproduced for the paired augmentation
    crop_scale: Tuple[float, float] = (0.08, 1.0)
    crop_ratio: Tuple[float, float] = (3 / 4, 4 / 3)
    prefetch_depth: int = 2  # device_put double-buffering depth


@dataclass(frozen=True)
class LogConfig:
    """Logging / checkpoint cadence (reference ``A000_CONFIG.py:8-13, 28-30, 71-74``)."""

    use_saved_state: bool = False
    using_state_path: str = ""
    save_model_to_folder: str = "./checkpoints"
    save_vali_results_to_folder: str = "./vali_results"
    print_training_info_in_iters: int = 5
    vali_interval_in_iters: int = 100
    save_model_interval_in_epochs: int = 1
    tensorboard_log_dir: str = ""  # empty -> runs/<timestamp>
    tensorboard_flush_interval_secs: int = 60


@dataclass(frozen=True)
class ParallelConfig:
    """Parallelism layout. Net-new capability vs the single-device reference (SURVEY.md §2)."""

    data_axis: str = "data"
    # spatial sharding of H across chips for high-res tiled fusion ("space" axis)
    space_axis: str = "space"
    num_data: int = 0  # 0 -> use all available devices on a 1-D data mesh
    num_space: int = 1
    # DP implementation: False -> jit + GSPMD (default); True -> explicit shard_map
    # with psum gradient all-reduce (parallel/shard_map_dp.py)
    use_shard_map: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    log: LogConfig = field(default_factory=LogConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    epsilon: float = 1e-10  # A000_CONFIG.py:78
    seed: int = 0


def _check_key(obj, name: str, dotted_key: str):
    """Validate ``name`` is a field of ``obj``, erroring with the valid-key list."""
    names = {f.name for f in dataclasses.fields(obj)}
    if name not in names:
        raise ValueError(
            f"unknown config key {dotted_key!r} ({name!r} is not a field of "
            f"{type(obj).__name__}); valid keys: {', '.join(sorted(names))}"
        )


def _is_optional_field(obj, name: str) -> bool:
    """True when the dataclass field's annotation is Optional[...] (accepts None)."""
    import typing

    try:
        hints = typing.get_type_hints(type(obj))
    except Exception:
        return False
    t = hints.get(name)
    return (
        t is not None
        and typing.get_origin(t) is typing.Union
        and type(None) in typing.get_args(t)
    )


def _parse_value(value: str, current, optional: bool, dotted_key: str):
    """Parse a CLI string against the field's current value/type, loudly on mismatch."""
    import ast

    if optional and value in ("None", "none", "null"):
        return None
    if isinstance(current, bool):
        low = value.lower()
        if low in ("1", "true", "yes", "on"):
            return True
        if low in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"cannot parse {value!r} as bool for {dotted_key!r}")
    if isinstance(current, str):
        return value
    try:
        lit = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        expected = "a literal" if current is None else type(current).__name__
        raise ValueError(
            f"cannot parse {value!r} for {dotted_key!r} (expected {expected})"
        ) from None
    if current is None:
        return lit  # Optional field currently None: take the parsed literal as-is
    try:
        return type(current)(lit)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"cannot convert {value!r} to {type(current).__name__} for {dotted_key!r}: {e}"
        ) from None


def _apply_override(cfg, dotted_key: str, raw_value: str):
    """Apply one ``section.key=value`` override, returning a new frozen config."""
    parts = dotted_key.split(".")
    if len(parts) == 1:
        section, key = None, parts[0]
    elif len(parts) == 2:
        section, key = parts
    else:
        raise ValueError(f"override key too deep: {dotted_key}")

    if section is None:
        _check_key(cfg, key, dotted_key)
        current = getattr(cfg, key)
        parsed = _parse_value(raw_value, current, _is_optional_field(cfg, key), dotted_key)
        return dataclasses.replace(cfg, **{key: parsed})
    _check_key(cfg, section, dotted_key)
    sub = getattr(cfg, section)
    _check_key(sub, key, dotted_key)
    current = getattr(sub, key)
    parsed = _parse_value(raw_value, current, _is_optional_field(sub, key), dotted_key)
    new_sub = dataclasses.replace(sub, **{key: parsed})
    return dataclasses.replace(cfg, **{section: new_sub})


def config_from_cli(argv=None, base: Config | None = None) -> Config:
    """Build a Config from ``section.key=value`` CLI arguments.

    The reference has no CLI at all (config is edited in place, SURVEY.md §1); this is the
    replacement flag system: ``python -m swin_unet_image_fusion_tpu.train optim.lr=1e-3``.
    """
    import sys

    cfg = base or Config()
    args = list(sys.argv[1:] if argv is None else argv)
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"expected key=value override, got: {arg}")
        key, value = arg.split("=", 1)
        cfg = _apply_override(cfg, key, value)
    return cfg
