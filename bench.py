"""Benchmark: fused 512x512 pairs/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the PyTorch reference on CPU fuses 0.12 pairs/s at 512x512
(8.31 s/pair, bs=1, fp32, eval). Target: >=2.4 pairs/s on v5e-8, i.e. >=0.3/chip.

The bench runs eval-mode fusion (forward + clamp) at 512x512, batch 8, on whatever
single accelerator is available, and reports per-chip throughput. Precision mode is
selectable via BENCH_DTYPE (float32 parity mode by default; bfloat16 for the fast
MXU path).
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    dtype = os.environ.get("BENCH_DTYPE", "float32")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    hw = int(os.environ.get("BENCH_HW", "512"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    cfg = ModelConfig(compute_dtype=dtype)
    model = SwinFusionUNet(cfg)

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), ir[:1], vis[:1])

    @jax.jit
    def fuse(variables, ir, vis):
        return jnp.clip(model.apply(variables, ir, vis, train=False), 0.0, 1.0)

    # warmup / compile
    fuse(variables, ir, vis).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fuse(variables, ir, vis)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt
    baseline = 0.12  # reference PyTorch-CPU 512x512 pairs/s (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"fused {hw}x{hw} pairs/sec/chip ({dtype}, bs={batch})",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
