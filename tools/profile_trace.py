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


def summarize(trace_dir: str, top: int = 20) -> None:
    """Print a grouped per-iteration op-time table from a captured trace.

    Parses the XPlane proto directly (no TensorBoard needed) and groups XLA ops
    into kernel / layout / copy buckets — the table behind the plateau analyses
    in docs/BENCHMARKS.md. Assumes the trace wrapped 3 iterations (main()).
    """
    import collections
    import glob
    import re

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # baked-in tf

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise RuntimeError("no TPU plane in trace (CPU run?)")
    plane = planes[0]
    emeta = plane.event_metadata
    (line,) = [l for l in plane.lines if l.name == "XLA Ops"]

    def group(name):
        n = re.sub(r"\.\d+$", "", name.split(" = ")[0].lstrip("%"))
        if "_packed_block" in n:
            return "packed block kernels"
        if "_pallas_forward" in n or "_attention" in n:
            return "nhwc attention kernels"
        if n.startswith(("fusion", "loop_")):
            return "XLA fusions (layout/elementwise)"
        if n.startswith("copy"):
            return "copies"
        if n.startswith(("transpose", "bitcast", "reshape")):
            return "transpose/reshape"
        if n.startswith(("convolution", "dot")):
            return "conv/dot"
        return n.split(".")[0][:40]

    tot = collections.Counter()
    cnt = collections.Counter()
    for ev in line.events:
        g = group(emeta[ev.metadata_id].name)
        tot[g] += ev.duration_ps
        cnt[g] += 1
    total = sum(tot.values())
    iters = 3
    print(f"total {total / iters / 1e9:.1f} ms/iter ({paths[-1]})")
    for g, t in tot.most_common(top):
        print(
            f"{t / iters / 1e9:9.2f}ms {100 * t / total:5.1f}%"
            f" {cnt[g] // iters:6d}x  {g}"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summary":
        summarize(sys.argv[2] if len(sys.argv) > 2 else "/tmp/jax_trace")
    else:
        main()
