"""High-resolution (2K/4K) tiled fusion, data-parallel across the chip mesh.

BASELINE.json config 5: "High-res 2K/4K tiled fusion with anti-patch-merge upsampling,
data-parallel across v5e-8". The image pair is cut into overlapping tiles; all tiles are
fused as one batch sharded over the data mesh (each chip fuses its share); overlaps are
blended back with a separable linear (Bartlett) ramp so tile seams cancel.

Why tiles instead of sharding H inside the model: window attention is local (7x7
windows; global context comes from shifted windows + 5x downsampling, SURVEY.md §5), so
a tile with ``overlap`` >= the model's effective halo reproduces the full-image output
everywhere except a thin border that the blend ramp down-weights. This keeps every chip
running the exact single-chip executable — no cross-chip collectives in the hot loop —
and scales embarrassingly over ICI.

The whole pipeline is device-resident: the full-resolution pair crosses the host
boundary ONCE each way, and tile extraction, the chunked model forwards, and the
overlap blend all run on device. This matters doubly on relayed TPU runtimes, where
host<->device bandwidth is tens of MB/s: shipping overlapping fp32 tiles per chunk
and blending on the host (the naive layout) costs ~9x the device compute at 2K
(measured: 2.9 s/chunk np->np vs 0.30 s/chunk device-resident, docs/BENCHMARKS.md).
uint8 input/output halves the remaining transfer 4x again (fusion inputs/outputs are
8-bit images end-to-end — the reference's a017_test.py reads and writes jpg).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def plan_tiles(length: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, length) with `tile`-sized windows and >= `overlap`
    overlap between neighbours; the last tile is right-aligned."""
    if length <= tile:
        return [0]
    stride = tile - overlap
    n = math.ceil((length - tile) / stride) + 1
    # even spacing: actual overlap >= requested, no bunching at the right edge
    return [int(round(i * (length - tile) / (n - 1))) for i in range(n)]


def _ramp_weights(tile: int, starts: List[int], length: int) -> np.ndarray:
    """Per-tile 1-D blend weights: triangular ramp, constant where no neighbour."""
    w = np.ones((len(starts), tile), np.float32)
    for i, s in enumerate(starts):
        if i > 0:  # left overlap with previous tile
            ov = starts[i - 1] + tile - s
            if ov > 0:
                w[i, :ov] *= np.linspace(0.0, 1.0, ov + 2, dtype=np.float32)[1:-1]
        if i < len(starts) - 1:  # right overlap with next tile
            ov = s + tile - starts[i + 1]
            if ov > 0:
                w[i, -ov:] *= np.linspace(1.0, 0.0, ov + 2, dtype=np.float32)[1:-1]
    return w


class TiledFuser:
    """Fuse arbitrarily large pairs by batching fixed-size tiles over the mesh."""

    def __init__(
        self,
        model,
        variables,
        tile: int = 512,
        overlap: int = 64,
        mesh=None,
        data_axis: str = "data",
        max_batch: int = 0,
        return_uint8: bool = False,
    ):
        """``max_batch > 0`` runs the tile batch in fixed-size chunks of that many
        tiles (the batch is padded up to a chunk multiple). Every resolution then
        reuses ONE compiled (max_batch, tile, tile) executable instead of compiling a
        fresh program per tile count — on the remote-compile TPU runtime a program
        compile costs minutes, so serving mixed 2K/4K sizes wants a fixed batch.

        ``return_uint8=True`` quantises the fused image to uint8 on device before the
        (slow) device->host copy — the right choice when the output is written
        straight to an 8-bit image file, as the reference driver does
        (a017_test.py:100-115)."""
        self.model = model
        self.variables = variables
        self.tile = tile
        self.overlap = overlap
        self.mesh = mesh
        self.data_axis = data_axis
        self.max_batch = max_batch
        self.return_uint8 = return_uint8
        self._forward = jax.jit(
            lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0)
        )
        self._extract_cache = {}  # (h, w, in_dtype) -> jitted extract
        self._blend_cache = {}  # (h, w) -> jitted blend

    def _device_count(self) -> int:
        return self.mesh.size if self.mesh is not None else 1

    def _plan(self, h: int, w: int):
        th, tw = min(self.tile, h), min(self.tile, w)
        ys = plan_tiles(h, th, self.overlap)
        xs = plan_tiles(w, tw, self.overlap)
        n_tiles = len(ys) * len(xs)
        if self.max_batch:
            n_pad = -(-n_tiles // self.max_batch) * self.max_batch
        else:
            n_pad = n_tiles + ((-n_tiles) % self._device_count())
        return ys, xs, th, tw, n_tiles, n_pad

    def _extract_fn(self, h: int, w: int, in_dtype):
        key = (h, w, np.dtype(in_dtype).name)
        if key not in self._extract_cache:
            ys, xs, th, tw, n_tiles, n_pad = self._plan(h, w)
            is_u8 = np.dtype(in_dtype) == np.uint8

            def extract(img):
                img = img.astype(jnp.float32)
                if is_u8:
                    img = img / 255.0  # divide (not *1/255): bit-match the host conv
                tiles = [img[y0 : y0 + th, x0 : x0 + tw] for y0 in ys for x0 in xs]
                tiles.extend(tiles[-1:] * (n_pad - n_tiles))  # pad: repeat last tile
                return jnp.stack(tiles)

            self._extract_cache[key] = jax.jit(extract)
        return self._extract_cache[key]

    def _blend_fn(self, h: int, w: int):
        if (h, w) not in self._blend_cache:
            ys, xs, th, tw, n_tiles, _ = self._plan(h, w)
            wy = _ramp_weights(th, ys, h)
            wx = _ramp_weights(tw, xs, w)
            # the per-pixel weight normaliser is data-independent: a host constant
            norm = np.zeros((h, w, 1), np.float32)
            for i, y0 in enumerate(ys):
                for j, x0 in enumerate(xs):
                    norm[y0 : y0 + th, x0 : x0 + tw] += (
                        wy[i][:, None] * wx[j][None, :]
                    )[:, :, None]
            inv_norm = (1.0 / np.maximum(norm, 1e-8)).astype(np.float32)

            def blend(fused):
                acc = jnp.zeros((h, w, 1), jnp.float32)
                k = 0
                for i, y0 in enumerate(ys):
                    for j, x0 in enumerate(xs):
                        wgt = (wy[i][:, None] * wx[j][None, :])[:, :, None]
                        acc = acc.at[y0 : y0 + th, x0 : x0 + tw].add(
                            fused[k].astype(jnp.float32) * wgt
                        )
                        k += 1
                out = acc * inv_norm
                if self.return_uint8:
                    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)
                return out

            self._blend_cache[(h, w)] = jax.jit(blend)
        return self._blend_cache[(h, w)]

    def fuse(self, ir: np.ndarray, vis_y: np.ndarray) -> np.ndarray:
        """ir / vis_y: (H, W, 1), float [0,1] or uint8 [0,255]. Returns fused
        (H, W, 1) float32 (or uint8 with ``return_uint8``)."""
        return np.asarray(self.fuse_on_device(ir, vis_y))

    def fuse_on_device(self, ir, vis_y):
        """:meth:`fuse` but returns the DEVICE array — lets callers time device
        compute separately from the host<->device transfers, which on the
        relayed TPU runtime swing by seconds run-to-run and otherwise drown the
        compute signal (docs/BENCHMARKS.md round-5 tiled section). Callers
        timing this should materialise a scalar (``float(out.sum())``) inside
        the timed region; inputs may be pre-``device_put`` host arrays."""
        h, w, _ = ir.shape
        t = self.tile
        if h <= t and w <= t:
            scale = 1.0 / 255.0 if np.dtype(ir.dtype) == np.uint8 else 1.0
            out = self._forward(
                self.variables,
                np.asarray(ir, np.float32)[None] * scale,
                np.asarray(vis_y, np.float32)[None] * scale,
            )[0]
            if self.return_uint8:
                out = jnp.round(out * 255.0).astype(jnp.uint8)
            return out

        ys, xs, th, tw, n_tiles, n_pad = self._plan(h, w)
        extract = self._extract_fn(h, w, ir.dtype)
        # the full-res pair crosses the tunnel once; tiles never leave the device
        tiles_ir = extract(jax.device_put(ir))
        tiles_vis = extract(jax.device_put(vis_y))

        def run_batch(b_ir, b_vis):
            if self.mesh is not None and self.mesh.size > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(self.data_axis))
                b_ir = jax.device_put(b_ir, sh)
                b_vis = jax.device_put(b_vis, sh)
            return self._forward(self.variables, b_ir, b_vis)

        if self.max_batch:
            # fixed-size chunks: one compiled executable for every input resolution
            chunk = self.max_batch
            assert chunk % self._device_count() == 0, (chunk, self._device_count())
            fused = jnp.concatenate(
                [
                    run_batch(tiles_ir[c0 : c0 + chunk], tiles_vis[c0 : c0 + chunk])
                    for c0 in range(0, n_pad, chunk)
                ],
                axis=0,
            )[:n_tiles]
        else:
            fused = run_batch(tiles_ir, tiles_vis)[:n_tiles]

        return self._blend_fn(h, w)(fused)
