"""Pre-compile the standard programs into the persistent JAX compilation cache.

This environment's remote-compile tunnel costs minutes per program; warming the cache
(``/root/.jax_cache``) once makes every later bench / driver run start hot.

Usage: python tools/warm_cache.py [quick|full|serving]

``serving`` precompiles the documented SERVING BUCKET SET: the bs=1 bucket=64
Fuser executables for the common camera/dataset shapes below (reference
serving surface: a017_test.py:56-90 — arbitrary sizes, bs=1). With
``bucket=64`` every input maps to its ceil-to-64 shape, so e.g. 640x480,
620x450 and 600x460 all hit the ONE (512, 640) program; a size outside the
set costs one compile, after which it is persisted like the rest. The
bucket-vs-exact output divergence at realistic sizes is measured in
docs/BENCHMARKS.md (round-5 serving warm-start section).
"""

# ceil-to-64 bucket shapes (H, W) the serving mode precompiles; chosen to cover
# the reference's own test images (256^2), TNO-style 640x480 camera frames
# (and anything else ceiling to (512, 640)), XGA 1024x768, and 512^2/1024^2.
SERVING_BUCKETS = [
    (256, 256),
    (512, 512),
    (512, 640),   # 480x640, 450x620, ...
    (768, 1024),  # 768x1024 XGA landscape
    (1024, 1024),
]

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    t0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter() - t0:7.1f}s] {m}", flush=True)

    rng = np.random.default_rng(0)
    base = SwinFusionUNet(ModelConfig())
    dummy = jnp.zeros((1, 224, 224, 1))
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), dummy, dummy)
    jax.block_until_ready(variables)
    log("init compiled")

    if mode == "serving":
        # the bs=1 bucketed serving programs (Fuser(bucket=64) pads every input
        # to these shapes): one warm pass per bucket, timed cold vs warm
        model = SwinFusionUNet(
            ModelConfig(compute_dtype="bfloat16", attention_impl="auto")
        )
        f = jax.jit(
            lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0, 1).sum()
        )
        for h, w in SERVING_BUCKETS:
            ir = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
            ts = time.perf_counter()
            s = float(f(variables, ir, ir))
            cold = time.perf_counter() - ts
            ts = time.perf_counter()
            float(f(variables, ir, ir))
            warm = time.perf_counter() - ts
            log(f"serving bucket {h}x{w}: first-call {cold:.1f}s -> warm {warm*1e3:.1f}ms (sum={s:.2f})")
        return

    configs = [("bfloat16", "pallas", 512, 8)]
    if mode == "full":
        configs += [
            ("bfloat16", "jnp", 512, 8),
            ("float32", "jnp", 256, 1),
            ("bfloat16", "pallas_block", 512, 8),
        ]

    for dtype, impl, hw, bs in configs:
        model = SwinFusionUNet(ModelConfig(compute_dtype=dtype, attention_impl=impl))
        ir = jnp.asarray(rng.random((bs, hw, hw, 1), dtype=np.float32))
        f = jax.jit(
            lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0, 1).sum()
        )
        ts = time.perf_counter()
        s = float(f(variables, ir, ir))
        log(f"{dtype}/{impl}/{hw}x{hw}/bs{bs}: compiled in {time.perf_counter()-ts:.1f}s (sum={s:.2f})")


if __name__ == "__main__":
    main()
