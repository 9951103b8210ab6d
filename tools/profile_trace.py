"""Capture a jax.profiler trace of the fusion forward (and optionally a train step).

The reference has no profiling at all (SURVEY.md §5); this wires the TPU-native
equivalent: a TensorBoard-viewable XPlane trace of the jitted hot path.

Usage:
    python tools/profile_trace.py [out_dir] [hw] [batch] [dtype] [impl]
    tensorboard --logdir <out_dir>    # "Profile" tab
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dtype = sys.argv[4] if len(sys.argv) > 4 else "bfloat16"
    impl = sys.argv[5] if len(sys.argv) > 5 else "pallas_pack"

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    cfg = ModelConfig(compute_dtype=dtype, attention_impl=impl)
    model = SwinFusionUNet(cfg)
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir[:1], vis[:1])

    fuse = jax.jit(
        lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0).sum()
    )
    float(fuse(variables, ir, vis))  # compile outside the trace

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            float(fuse(variables, ir, vis))

    print(f"trace written to {out_dir}")


def trace_train_step(out_dir="/tmp/jax_trace_train", hw=224, batch=20,
                     dtype="bfloat16", impl="pallas_pack", remat=False):
    """Capture a trace of the full jitted training step (fwd+bwd+Adam)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from swin_unet_image_fusion_tpu.config import Config, ModelConfig
    from swin_unet_image_fusion_tpu.train import create_train_state, make_train_step

    cfg = Config(model=ModelConfig(compute_dtype=dtype, attention_impl=impl, remat=remat))
    state = create_train_state(cfg, jax.random.PRNGKey(0), iters_per_epoch=100,
                               sample_hw=(hw, hw))
    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((batch, hw, hw, 1), np.float32))
    vis = jnp.asarray(rng.random((batch, hw, hw, 1), np.float32))
    step_fn = make_train_step(cfg, donate=False)
    state, terms = step_fn(state, ir, vis)
    float(terms["total_loss"])  # compile outside the trace
    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, terms = step_fn(state, ir, vis)
            float(terms["total_loss"])
    print(f"train trace written to {out_dir}")


if __name__ == "__main__":
    main()
