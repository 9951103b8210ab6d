"""Generate a realistic synthetic IR/VIS image-fusion dataset.

No real multi-modal dataset ships in this environment (zero egress), so the
trained-quality comparison (docs/BENCHMARKS.md "trained quality") uses scenes
synthesised to have the statistical structure the fusion losses care about:

- a shared scene layout (objects over terrain) so IR and VIS are geometrically
  aligned but radiometrically different — the core property of the task;
- VIS: albedo + strong high-frequency texture + directional shading + gamma,
  saved as BGR colour (the loader trains on the Y channel, a015_dataset.py);
- IR: a temperature field — hot/cold objects over a smooth background — with
  thermal diffusion (blur), low texture, mild fixed-pattern sensor noise.

Layout matches the reference's training folder convention
(``a015_dataset.py``): ``<root>/ir/*.png`` grayscale, ``<root>/vis/*.png``
colour, paired by sorted filename.

Usage: python tools/make_synth_dataset.py <out_root> [--n 96] [--hw 256 320]
"""

import argparse
import os

import cv2
import numpy as np


def _smooth_noise(rng, h, w, scale, octaves=3):
    """Multi-octave smoothed noise in [0, 1] (cheap Perlin stand-in)."""
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        sh, sw = max(2, int(h / (scale / 2**o))), max(2, int(w / (scale / 2**o)))
        layer = cv2.resize(
            rng.random((sh, sw), dtype=np.float32), (w, h),
            interpolation=cv2.INTER_CUBIC,
        )
        out += amp * layer
        total += amp
        amp *= 0.5
    out /= total
    out -= out.min()
    m = out.max()
    return out / m if m > 0 else out


def make_pair(rng, h, w, profile="textured"):
    """One aligned (ir_gray_u8, vis_bgr_u8) scene pair.

    profile="textured": dense VIS texture + IR column fixed-pattern noise —
    adversarial for the fusion objective (the Sobel term's max-gradient target is
    high everywhere, and the FPN literally teaches vertical stripes); training
    collapses to a striped texture at ANY lr, in torch and JAX alike (documented
    in docs/BENCHMARKS.md). profile="clean": texture confined to objects, smooth
    background, no FPN — the objective then has a meaningful optimum and training
    converges to real fusions. Both profiles are kept: the first pins equal
    dynamics in a hostile regime, the second demonstrates trained quality."""
    # ---- shared scene geometry
    rich = profile == "rich"  # rich: dense multi-scale structure (small objects too)
    n_obj = rng.integers(18, 32) if rich else rng.integers(4, 9)
    obj_mask = np.zeros((h, w), np.float32)
    albedo = 0.35 + 0.4 * _smooth_noise(rng, h, w, 64 if not rich else 32)
    temp = 0.25 + 0.25 * _smooth_noise(rng, h, w, 96 if not rich else 48)
    lo = 3 if rich else 8
    for _ in range(n_obj):
        mask = np.zeros((h, w), np.float32)
        cx, cy = rng.integers(0, w), rng.integers(0, h)
        if rng.random() < 0.5:
            ax, ay = rng.integers(lo, w // 4), rng.integers(lo, h // 4)
            ang = rng.uniform(0, 180)
            cv2.ellipse(mask, (cx, cy), (int(ax), int(ay)), ang, 0, 360, 1.0, -1)
        else:
            ww_, hh = rng.integers(lo + 2, w // 3), rng.integers(lo + 2, h // 3)
            ang = rng.uniform(0, 180)
            box = cv2.boxPoints(((float(cx), float(cy)), (float(ww_), float(hh)), ang))
            cv2.fillPoly(mask, [box.astype(np.int32)], 1.0)
        obj_albedo = rng.uniform(0.15, 0.9)
        # people/engines read hot, parked metal reads cold: bimodal temperatures
        obj_temp = rng.uniform(0.75, 1.0) if rng.random() < 0.6 else rng.uniform(0.0, 0.2)
        albedo = albedo * (1 - mask) + obj_albedo * mask
        temp = temp * (1 - mask) + obj_temp * mask
        obj_mask = np.maximum(obj_mask, mask)

    # ---- VIS: albedo + texture + directional shading, weak contrast on thermal info
    texture = _smooth_noise(rng, h, w, 6, octaves=2) - 0.5
    if profile in ("clean", "rich"):
        tex_amp = 0.01 + 0.08 * obj_mask                        # texture only on objects
    else:
        tex_amp = 0.10 + 0.15 * obj_mask                        # objects more textured
    gy, gx = np.gradient(cv2.GaussianBlur(albedo, (0, 0), 3))
    shading = np.clip(0.5 + 40 * (gx * 0.7 + gy * 0.3), 0.2, 0.8)
    vis_y = np.clip(albedo * shading * 1.6 + tex_amp * texture, 0, 1) ** (1 / 1.6)
    # colour: desaturated hue field so the YCrCb path has real chroma to carry
    hue = _smooth_noise(rng, h, w, 128)
    vis = np.stack(
        [
            np.clip(vis_y * (0.85 + 0.3 * hue), 0, 1),          # B
            np.clip(vis_y * (0.9 + 0.2 * (1 - hue)), 0, 1),     # G
            np.clip(vis_y * (0.8 + 0.35 * (1 - hue)), 0, 1),    # R
        ],
        axis=-1,
    )

    # ---- IR: diffused temperature, low texture, sensor nonuniformity + noise
    ir = cv2.GaussianBlur(temp, (0, 0), 1.5)
    yy = np.linspace(-1, 1, h)[:, None]
    xx = np.linspace(-1, 1, w)[None, :]
    vignette = 1.0 - 0.12 * (xx**2 + yy**2)
    if profile in ("clean", "rich"):
        ir = np.clip(ir * vignette + 0.004 * rng.standard_normal((h, w)), 0, 1)
    else:
        fixed_pattern = 0.02 * (rng.random((1, w), dtype=np.float32) - 0.5)  # column FPN
        ir = np.clip(ir * vignette + fixed_pattern + 0.01 * rng.standard_normal((h, w)), 0, 1)

    return (ir * 255).astype(np.uint8), (vis * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--hw", type=int, nargs=2, default=(256, 320))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", choices=["textured", "clean", "rich"], default="textured")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out_root, "ir"), exist_ok=True)
    os.makedirs(os.path.join(args.out_root, "vis"), exist_ok=True)
    for i in range(args.n):
        ir, vis = make_pair(rng, *args.hw, profile=args.profile)
        cv2.imwrite(os.path.join(args.out_root, "ir", f"{i:04d}.png"), ir)
        cv2.imwrite(os.path.join(args.out_root, "vis", f"{i:04d}.png"), vis)
    print(f"wrote {args.n} pairs to {args.out_root}")


if __name__ == "__main__":
    main()
