"""Training-step benchmark on one chip: ms/step for a given impl/shape/batch.

The reference training config is 224x224 crops at batch 20 (A000_CONFIG.py:19-26,
a015_dataset.py:61-65). Timing uses the same chained-with-data-dependency +
host-materialisation methodology as bench.py (block_until_ready alone is unreliable
on the relayed TPU runtime).

Env knobs: TRAIN_IMPL (jnp|pallas|pallas_block), TRAIN_HW, TRAIN_BATCH, TRAIN_DTYPE,
TRAIN_REMAT (0|1), TRAIN_CHAIN, TRAIN_REPEATS.

TRAIN_SHARD_MAP=1 times the explicit shard_map+psum DP step
(parallel/shard_map_dp.py) over a data mesh of all available devices instead of the
default GSPMD jit step — the Mosaic-kernels-under-shard_map hardware check
(VERDICT r3 #4): a 1-device mesh on the chip proves the compile & executes the real
(non-interpret) packed kernels inside shard_map; step-time A/B vs the jit path.
"""

import json
import os
import time


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.config import Config, ModelConfig
    from swin_unet_image_fusion_tpu.train import create_train_state, make_train_step

    impl = os.environ.get("TRAIN_IMPL", "pallas")
    hw = int(os.environ.get("TRAIN_HW", "224"))
    batch = int(os.environ.get("TRAIN_BATCH", "20"))
    dtype = os.environ.get("TRAIN_DTYPE", "bfloat16")
    remat = os.environ.get("TRAIN_REMAT", "1") == "1"
    chain = int(os.environ.get("TRAIN_CHAIN", "4"))
    repeats = int(os.environ.get("TRAIN_REPEATS", "3"))

    # TRAIN_JNP_MAX_TOKENS: unset -> ModelConfig default (49); "none" -> disable;
    # integer -> explicit threshold (the A/B knob behind the default's measurement)
    jnp_max_tok = os.environ.get("TRAIN_JNP_MAX_TOKENS")
    extra = {}
    if jnp_max_tok is not None:
        extra["attention_jnp_max_tokens"] = (
            None if jnp_max_tok.lower() == "none" else int(jnp_max_tok)
        )
    cfg = Config(
        model=ModelConfig(
            compute_dtype=dtype, attention_impl=impl, remat=remat, **extra,
        )
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0), iters_per_epoch=100,
                               sample_hw=(hw, hw))

    rng = np.random.default_rng(0)
    ir = jnp.asarray(rng.random((batch, hw, hw, 1), np.float32))
    vis = jnp.asarray(rng.random((batch, hw, hw, 1), np.float32))

    use_shard_map = os.environ.get("TRAIN_SHARD_MAP", "0") == "1"
    if use_shard_map:
        from swin_unet_image_fusion_tpu.parallel.mesh import (
            data_mesh, data_sharding, replicated_sharding,
        )
        from swin_unet_image_fusion_tpu.parallel.shard_map_dp import (
            make_shard_map_train_step,
        )

        mesh = data_mesh(len(jax.devices()))
        assert batch % mesh.size == 0, (batch, mesh.size)
        state = jax.device_put(state, replicated_sharding(mesh))
        ir = jax.device_put(ir, data_sharding(mesh))
        vis = jax.device_put(vis, data_sharding(mesh))
        step_fn = make_shard_map_train_step(cfg, mesh)
        impl = f"{impl}+shard_map({mesh.size})"
    else:
        step_fn = make_train_step(cfg, donate=False)

    def chained(state, ir, vis):
        def body(_, carry):
            st, loss = carry
            st, terms = step_fn(st, ir, vis)
            return st, terms["total_loss"]

        st, loss = jax.lax.fori_loop(
            0, chain, body, (state, jnp.float32(0.0))
        )
        return loss  # scalar -> host materialisation forces completion

    fn = jax.jit(chained)
    t0 = time.perf_counter()
    first = float(fn(state, ir, vis))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(first), f"non-finite loss: {first}"

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(state, ir, vis))
        best = min(best, time.perf_counter() - t0)

    ms_per_step = best / chain * 1e3
    pairs_per_sec = batch / (ms_per_step / 1e3)
    # roofline: fwd matmul/conv FLOPs x3 for the bwd (dL/dx + dL/dW each re-run
    # every contraction once — the standard fwd:bwd = 1:2 accounting); the SSIM/
    # Sobel loss banks and all elementwise work are excluded, same convention as
    # bench.py's inference MFU (utils/flops.py docstring)
    from swin_unet_image_fusion_tpu.utils.flops import (
        V5E_BF16_PEAK_TFLOPS, mfu, model_flops_per_pair,
    )

    step_flops = 3 * model_flops_per_pair(cfg.model, (hw, hw))["total"]
    tflops, frac = mfu(pairs_per_sec, step_flops)
    out = {
        "metric": f"train step {hw}x{hw} bs={batch} ({dtype}, {impl}, remat={remat})",
        "ms_per_step": round(ms_per_step, 1),
        "pairs_per_sec": round(pairs_per_sec, 2),
        "loss": round(first, 5),
        "compile_s": round(compile_s, 1),
        "flops_per_pair_fwdbwd": round(step_flops / 1e9, 2),  # GFLOP, matmul/conv
        "tflops": round(tflops, 2),
    }
    if dtype == "bfloat16":
        out["pct_of_bf16_peak"] = round(100.0 * frac, 2)
        out["peak_tflops"] = V5E_BF16_PEAK_TFLOPS
    print(json.dumps(out))


if __name__ == "__main__":
    main()
