"""Benchmark: fused 512x512 pairs/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...roofline fields}.

Baseline (BASELINE.md): the PyTorch reference on CPU fuses 0.12 pairs/s at 512x512
(8.31 s/pair, bs=1, fp32, eval). Target: >=2.4 pairs/s on v5e-8, i.e. >=0.3/chip.

Methodology: the timed region is a single jitted program that chains CHAIN forward
passes with a data dependency between iterations (the fused output feeds the next
input), so asynchronous dispatch cannot overlap away real work, and the result is
materialised on the host inside the timed region. This matters on relayed/virtualised
TPU runtimes where block_until_ready can return before execution completes.

Env knobs: BENCH_DTYPE (float32|bfloat16), BENCH_BATCH, BENCH_HW, BENCH_CHAIN,
BENCH_IMPL (jnp|pallas|pallas_block|pallas_pack).

BENCH_MODE selects the surface (default "throughput" is the driver's headline):
  throughput — bs=128 512^2 fused pairs/s (one JSON line, the contract above)
  serving    — the reference's own serving shape (a017_test.py:41-46,56-90):
               bs=1 arbitrary-resolution fusion at 256^2 and 640x480
               (BASELINE.json configs 1/3); one JSON line per config
  tiled      — 2K/4K TiledFuser fusion on one chip (BASELINE.json config 5):
               wall time per image + SSIM vs untiled at 1024^2 where untiled fits
"""

import json
import os
import time


def _setup_jax():
    import jax

    if os.environ.get("BENCH_CPU") == "1":
        # smoke mode: force the CPU backend (the axon plugin ignores env vars;
        # jax.config before first backend use is the only way — CLAUDE.md)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    # persistent compile cache: the remote-compile tunnel costs minutes per program
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _model_config(**overrides):
    """Default 33M ModelConfig; BENCH_TINY=1 shrinks to a CPU-smoke 2-stage model."""
    from swin_unet_image_fusion_tpu.config import ModelConfig

    kw = {}
    if os.environ.get("BENCH_TINY") == "1":
        kw = dict(
            in_dims_list=(1, 8),
            out_dims_list=(8, 16),
            att_num_heads=2,
            att_dims_per_head_ratio=1 / 2,
        )
    tok = os.environ.get("BENCH_JNP_MAX_TOKENS")  # deep-stage jnp-gate A/B knob
    if tok is not None:
        kw["attention_jnp_max_tokens"] = None if tok.lower() == "none" else int(tok)
    kw.update(overrides)
    return ModelConfig(**kw)


def _emit(metric, value, unit, vs_baseline=None, **extra):
    line = {"metric": metric, "value": round(value, 4), "unit": unit}
    if vs_baseline is not None:
        line["vs_baseline"] = round(vs_baseline, 2)
    line.update(extra)
    print(json.dumps(line), flush=True)


def _roofline_fields(pairs_per_sec, hw, dtype, cfg=None):
    """flops/pair, achieved TFLOP/s, and %-of-peak for the benchmarked model."""
    from swin_unet_image_fusion_tpu.utils.flops import (
        V5E_BF16_PEAK_TFLOPS,
        mfu,
        model_flops_per_pair,
    )

    flops = model_flops_per_pair(cfg if cfg is not None else _model_config(), hw)["total"]
    tflops, frac = mfu(pairs_per_sec, flops)
    fields = {
        "flops_per_pair": round(flops / 1e9, 2),  # GFLOP (matmul/conv only)
        "tflops": round(tflops, 2),
    }
    if dtype == "bfloat16":
        fields["pct_of_bf16_peak"] = round(100.0 * frac, 2)
        fields["peak_tflops"] = V5E_BF16_PEAK_TFLOPS
    return fields


def bench_throughput():
    """The headline: fused 512^2 pairs/s/chip at serving batch (driver contract)."""
    import jax.numpy as jnp
    import numpy as np
    import jax

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
    variables = jax.jit(SwinFusionUNet(_model_config()).init)(
        jax.random.PRNGKey(0), ir[:1], vis[:1]
    )

    def build(impl_name):
        model = SwinFusionUNet(_model_config(compute_dtype=dtype, attention_impl=impl_name))

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

    # VPU-side floor model (round-4 VERDICT Weak #4): the analytic
    # minimal-VMEM-traversal floor of the packed block-kernel families, per
    # stage, next to which the measured kernel wall (profile_trace.py) is
    # judged — measured/modeled >~1.3x names the next lever; ~1x proves the
    # "at this design's floor" claim. Constants and pass counts:
    # utils/flops.py::packed_block_pass_model.
    floor_fields = {}
    if impl.startswith("pallas_pack"):
        from swin_unet_image_fusion_tpu.utils.flops import packed_trunk_floor

        floors = packed_trunk_floor(_model_config(), (hw, hw), batch)
        floor_fields = {
            "packed_kernel_floor_ms": {
                k: round(v["floor_ms"], 1) for k, v in floors.items()
            },
            "packed_kernel_floor_total_ms": round(
                sum(v["floor_ms"] for v in floors.values()), 1
            ),
        }

    _emit(
        f"fused {hw}x{hw} pairs/sec/chip ({dtype}, {impl}, bs={batch})",
        pairs_per_sec,
        "pairs/s",
        vs_baseline=pairs_per_sec / baseline,
        **_roofline_fields(pairs_per_sec, (hw, hw), dtype),
        **floor_fields,
    )


def bench_serving():
    """bs=1 arbitrary-resolution latency — the reference's own inference surface
    (a017_test.py:41-46 bs=1 no-shuffle; :56-90 per-call arbitrary size)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    impl = os.environ.get("BENCH_IMPL", "auto")  # attention_impl=auto, VERDICT r3 #1a
    chain = int(os.environ.get("BENCH_CHAIN", "8"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # BASELINE.json config 1 (256^2 bundled fusion) and config 3 (TNO-style 640x480)
    shapes = [(256, 256), (480, 640)]
    cpu_ref_s_per_pair = {(256, 256): 1.79, (480, 640): None}  # BASELINE.md 256^2

    run_cfg = _model_config(compute_dtype=dtype, attention_impl=impl)
    model = SwinFusionUNet(run_cfg)
    init_model = SwinFusionUNet(_model_config())
    rng = np.random.default_rng(0)

    for h, w in shapes:
        ir = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
        vis = jnp.asarray(rng.random((1, h, w, 1), dtype=np.float32))
        variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), ir, vis)

        @jax.jit
        def chained(variables, ir, vis):
            def body(_, carry):
                a, b = carry
                fused = jnp.clip(model.apply(variables, a, b, train=False), 0.0, 1.0)
                return (b, fused)

            a, b = jax.lax.fori_loop(0, chain, body, (ir, vis))
            return b.sum()

        float(chained(variables, ir, vis))  # compile + warmup
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(variables, ir, vis))
            best = min(best, time.perf_counter() - t0)
        ms = best / chain * 1e3
        pairs = chain / best
        ref = cpu_ref_s_per_pair.get((h, w))
        _emit(
            f"serving bs=1 {h}x{w} latency ({dtype}, {impl})",
            ms,
            "ms/pair",
            vs_baseline=(ref * 1e3 / ms) if ref else None,
            pairs_per_sec=round(pairs, 2),
            **_roofline_fields(pairs, (h, w), dtype, cfg=run_cfg),
        )


def bench_tiled():
    """2K/4K tiled fusion on one chip (BASELINE.json config 5): TiledFuser with
    tile=512, overlap=64, fixed 32-tile chunks (one compiled program for all sizes),
    plus an SSIM-vs-untiled agreement check at 1024^2 where untiled fits."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swin_unet_image_fusion_tpu.metrics import ssim
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
    from swin_unet_image_fusion_tpu.parallel.tiled import TiledFuser

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    impl = os.environ.get("BENCH_IMPL", "auto")
    repeats = int(os.environ.get("BENCH_REPEATS", "2"))
    max_batch = int(os.environ.get("BENCH_TILE_BATCH", "32"))

    model = SwinFusionUNet(_model_config(compute_dtype=dtype, attention_impl=impl))
    init_model = SwinFusionUNet(_model_config())
    rng = np.random.default_rng(0)
    probe = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = jax.jit(init_model.init)(jax.random.PRNGKey(0), probe, probe)
    fuser = TiledFuser(model, variables, tile=512, overlap=64, max_batch=max_batch)

    # agreement: tiled vs untiled at 1024^2 (both on the chip)
    agree_hw = int(os.environ.get("BENCH_TILE_AGREE_HW", "1024"))
    ir = rng.random((agree_hw, agree_hw, 1)).astype(np.float32)
    vis = rng.random((agree_hw, agree_hw, 1)).astype(np.float32)
    untiled_fn = jax.jit(
        lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0)
    )
    untiled = np.asarray(untiled_fn(variables, ir[None], vis[None]))[0]
    tiled = fuser.fuse(ir, vis)
    agreement = float(ssim(tiled[None], untiled[None]))
    _emit(
        f"tiled-vs-untiled SSIM @{agree_hw}^2 ({dtype}, tile=512, ov=64)",
        agreement,
        "ssim",
    )

    fuser_u8 = TiledFuser(
        model, variables, tile=512, overlap=64, max_batch=max_batch, return_uint8=True
    )
    sizes = [(2048, 2048, "2K"), (2160, 3840, "4K")]
    if os.environ.get("BENCH_TILE_SIZES"):  # e.g. "640x640" — CPU smoke
        sizes = [
            (int(s.split("x")[0]), int(s.split("x")[1]), s)
            for s in os.environ["BENCH_TILE_SIZES"].split(",")
        ]
    for h, w, label in sizes:
        ir = rng.random((h, w, 1)).astype(np.float32)
        vis = rng.random((h, w, 1)).astype(np.float32)
        ir8 = (ir * 255).astype(np.uint8)
        vis8 = (vis * 255).astype(np.uint8)
        # the (32, 512, 512) chunk program is already compiled by the agreement check
        for f, a, b, tag in [
            (fuser, ir, vis, "fp32 io"),
            (fuser_u8, ir8, vis8, "uint8 io"),
        ]:
            f.fuse(a, b)  # warm the per-resolution extract/blend programs
            # device wall separated from the relay-tunnel transfers (which swing
            # seconds run-to-run and drowned the compute signal in round 4):
            # inputs pre-placed, checksum materialisation inside the timed region
            dev_a, dev_b = jax.device_put(a), jax.device_put(b)
            jax.block_until_ready((dev_a, dev_b))
            best = dev_best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(f.fuse_on_device(dev_a, dev_b).sum())
                dev_best = min(dev_best, time.perf_counter() - t0)
                t0 = time.perf_counter()
                out = f.fuse(a, b)
                best = min(best, time.perf_counter() - t0)
            assert out.shape == (h, w, 1)
            mp = h * w / 1e6
            _emit(
                f"tiled {label} ({h}x{w}) fusion wall time ({dtype}, tile=512, {tag})",
                best,
                "s/image",
                device_s=round(dev_best, 3),
                transfer_s=round(best - dev_best, 3),
                megapixels_per_sec_device=round(mp / dev_best, 2),
            )


def main():
    _setup_jax()
    mode = os.environ.get("BENCH_MODE", "throughput")
    if mode == "serving":
        bench_serving()
    elif mode == "tiled":
        bench_tiled()
    else:
        bench_throughput()


if __name__ == "__main__":
    main()
