"""Worst-case attention-score bound per block, from LN-output x weight norms.

The fast in-kernel softmax (ops/pallas_attention.py::fast_softmax) skips the
max-subtraction pass; its overflow guard clamps scores at SOFTMAX_CLAMP (80).
This tool makes the safety margin *measurable*: for every WindowAttention block
it computes an analytic upper bound on any attention score the block can
produce, valid for EVERY input image:

  LayerNorm output u (torch biased-variance semantics) satisfies
  ||u||_2 <= max|gamma| * sqrt(C) + ||beta||_2  =: L      (||x_hat||_2 = sqrt(C))
  per head h:  ||q||_2 <= sigma_max(Wq_h) * L + ||bq_h||_2 =: Q   (same for K)
  |score|     <= Q * K / sqrt(d) + max|rel_pos_bias_table|

sigma_max is the exact spectral norm of the (C, d) per-head slice. The bound is
loose (Cauchy-Schwarz twice, worst-case alignment) — trained checkpoints sit
far below it, and the bound itself sitting below the clamp proves the fast
softmax exact for every possible input, not just the ones tested.

Usage:
  python tools/score_bound.py                    # random-init 33M reference model
  python tools/score_bound.py --ckpt DIR|.pth    # a trained checkpoint
  python tools/score_bound.py --tiny             # the test-tier tiny config

Reference behaviour bounded: scores+bias of a001_WindowAttention.py:317-354.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _per_head_sigma_max(w: np.ndarray, num_heads: int) -> np.ndarray:
    """w: (C, inner). Returns (heads,) spectral norms of the per-head slices."""
    c, inner = w.shape
    d = inner // num_heads
    return np.array(
        [np.linalg.norm(w[:, h * d : (h + 1) * d], 2) for h in range(num_heads)]
    )


def block_score_bound(block_params, num_heads: int, dims_per_head: int) -> float:
    """Worst-case |score| over both streams and all heads of one BasicBlock."""
    d = dims_per_head
    worst = 0.0
    ln = block_params["norm1"]
    attn = block_params["attn"]
    table = np.asarray(attn["rel_pos_bias_table"])
    for s in range(np.asarray(ln["scale"]).shape[0]):
        gamma = np.asarray(ln["scale"])[s]
        beta = np.asarray(ln["bias"])[s]
        c = gamma.shape[0]
        big_l = float(np.abs(gamma).max()) * np.sqrt(c) + float(
            np.linalg.norm(beta)
        )
        wq, bq = np.asarray(attn["q"]["kernel"])[s], np.asarray(attn["q"]["bias"])[s]
        wk, bk = np.asarray(attn["k"]["kernel"])[s], np.asarray(attn["k"]["bias"])[s]
        sq = _per_head_sigma_max(wq, num_heads)
        sk = _per_head_sigma_max(wk, num_heads)
        bqn = np.array(
            [np.linalg.norm(bq[h * d : (h + 1) * d]) for h in range(num_heads)]
        )
        bkn = np.array(
            [np.linalg.norm(bk[h * d : (h + 1) * d]) for h in range(num_heads)]
        )
        qn = sq * big_l + bqn
        kn = sk * big_l + bkn
        bound = float((qn * kn).max()) / np.sqrt(d) + float(np.abs(table[s]).max())
        worst = max(worst, bound)
    return worst


def iter_blocks(params):
    """Yield (path, block_params) for every BasicBlock param subtree."""
    for stage_name in sorted(k for k in params if k.endswith("_blocks")):
        stage = params[stage_name]
        for blk_name in ("self_normal", "self_shift", "cross_normal", "cross_shift"):
            if blk_name in stage:
                yield f"{stage_name}/{blk_name}", stage[blk_name]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default=None, help="Orbax dir or .pth file")
    ap.add_argument("--tiny", action="store_true", help="test-tier tiny config")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from swin_unet_image_fusion_tpu.config import Config, ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
    from swin_unet_image_fusion_tpu.ops.pallas_attention import SOFTMAX_CLAMP

    if args.tiny:
        mcfg = ModelConfig(
            in_dims_list=(1, 8), out_dims_list=(8, 16), att_num_heads=2,
            att_dims_per_head_ratio=1 / 2,
        )
    else:
        mcfg = ModelConfig()
    cfg = Config(model=mcfg)

    if args.ckpt:
        from swin_unet_image_fusion_tpu.infer import Fuser

        params = Fuser.from_checkpoint(cfg, args.ckpt).variables["params"]
    else:
        model = SwinFusionUNet(mcfg)
        z = jnp.zeros((1, 28, 28, 1), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)["params"]
        print("(random kaiming init — pass --ckpt for a trained model)")

    heads = mcfg.att_num_heads
    rows = []
    for path, blk in iter_blocks(params):
        c = np.asarray(blk["norm1"]["scale"]).shape[1]
        d = mcfg.dims_per_head(c)
        rows.append((path, c, block_score_bound(blk, heads, d)))

    overflow = 88.7
    clamp = SOFTMAX_CLAMP or overflow
    print(f"{'block':<34}{'C':>5}{'score bound':>14}{'/clamp':>9}")
    worst = 0.0
    for path, c, b in rows:
        print(f"{path:<34}{c:>5}{b:>14.1f}{b / clamp:>9.2f}x")
        worst = max(worst, b)
    print(
        f"\nworst-case analytic bound: {worst:.1f} "
        f"(fast-softmax clamp {clamp:g}, f32 exp overflow {overflow})"
    )
    if worst < clamp:
        print("=> the fast softmax is EXACT for every possible input to this model.")
    else:
        print(
            "=> inputs could in principle exceed the clamp; the guard saturates "
            "(finite, mask-preserving) instead of NaN'ing there."
        )


if __name__ == "__main__":
    main()
