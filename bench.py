"""Benchmark: fused 512x512 pairs/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the PyTorch reference on CPU fuses 0.12 pairs/s at 512x512
(8.31 s/pair, bs=1, fp32, eval). Target: >=2.4 pairs/s on v5e-8, i.e. >=0.3/chip.

Methodology: the timed region is a single jitted program that chains CHAIN forward
passes with a data dependency between iterations (the fused output feeds the next
input), so asynchronous dispatch cannot overlap away real work, and the result is
materialised on the host inside the timed region. This matters on relayed/virtualised
TPU runtimes where block_until_ready can return before execution completes.

Env knobs: BENCH_DTYPE (float32|bfloat16), BENCH_BATCH, BENCH_HW, BENCH_CHAIN,
BENCH_IMPL (jnp|pallas).
"""

import json
import os
import time


def main():
    import jax

    # persistent compile cache: the remote-compile tunnel costs minutes per program
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    impl = os.environ.get("BENCH_IMPL", "pallas_pack")  # lane-packed fused kernel
    batch = int(os.environ.get("BENCH_BATCH", "128"))  # batch sweep in docs/BENCHMARKS.md
    hw = int(os.environ.get("BENCH_HW", "512"))
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((batch, hw, hw, 1), dtype=np.float32))
    variables = jax.jit(SwinFusionUNet(ModelConfig()).init)(
        jax.random.PRNGKey(0), ir[:1], vis[:1]
    )

    def build(impl_name):
        model = SwinFusionUNet(ModelConfig(compute_dtype=dtype, attention_impl=impl_name))

        def chained(variables, ir, vis):
            def body(_, carry):
                a, b = carry
                fused = jnp.clip(model.apply(variables, a, b, train=False), 0.0, 1.0)
                return (b, fused)  # data dependency across iterations

            a, b = jax.lax.fori_loop(0, chain, body, (ir, vis))
            return b.sum()  # scalar -> cheap host materialisation

        return jax.jit(chained)

    # warmup / compile — fall back to the XLA composition if the fused-kernel
    # compile fails (keeps the benchmark recordable even on compiler flakiness)
    fuse = build(impl)
    try:
        float(fuse(variables, ir, vis))
    except Exception as e:
        if impl == "jnp":
            raise
        print(f"# {impl} compile failed ({type(e).__name__}); falling back to jnp", flush=True)
        impl = "jnp"
        fuse = build(impl)
        float(fuse(variables, ir, vis))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fuse(variables, ir, vis))  # float() forces real completion
        best = min(best, time.perf_counter() - t0)

    pairs_per_sec = batch * chain / best
    baseline = 0.12  # reference PyTorch-CPU 512x512 pairs/s (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"fused {hw}x{hw} pairs/sec/chip ({dtype}, {impl}, bs={batch})",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
