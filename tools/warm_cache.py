"""Pre-compile the standard programs into the persistent JAX compilation cache.

This environment's remote-compile tunnel costs minutes per program; warming the cache
(``/root/.jax_cache``) once makes every later bench / driver run start hot.

Usage: python tools/warm_cache.py [quick|full]
"""

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
