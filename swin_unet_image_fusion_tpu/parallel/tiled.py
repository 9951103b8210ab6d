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
    ):
        """``max_batch > 0`` runs the tile batch in fixed-size chunks of that many
        tiles (last chunk padded by repeating its final tile). Every resolution then
        reuses ONE compiled (max_batch, tile, tile) executable instead of compiling a
        fresh program per tile count — on the remote-compile TPU runtime a program
        compile costs minutes, so serving mixed 2K/4K sizes wants a fixed batch."""
        self.model = model
        self.variables = variables
        self.tile = tile
        self.overlap = overlap
        self.mesh = mesh
        self.data_axis = data_axis
        self.max_batch = max_batch
        self._forward = jax.jit(
            lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0)
        )

    def _device_count(self) -> int:
        return self.mesh.size if self.mesh is not None else 1

    def fuse(self, ir: np.ndarray, vis_y: np.ndarray) -> np.ndarray:
        """ir / vis_y: (H, W, 1) float [0,1]. Returns fused (H, W, 1)."""
        h, w, _ = ir.shape
        t = self.tile
        if h <= t and w <= t:
            out = self._forward(self.variables, ir[None], vis_y[None])
            return np.asarray(out[0])

        ys = plan_tiles(h, min(t, h), self.overlap)
        xs = plan_tiles(w, min(t, w), self.overlap)
        th, tw = min(t, h), min(t, w)

        tiles_ir, tiles_vis = [], []
        for y0 in ys:
            for x0 in xs:
                tiles_ir.append(ir[y0 : y0 + th, x0 : x0 + tw])
                tiles_vis.append(vis_y[y0 : y0 + th, x0 : x0 + tw])
        n_tiles = len(tiles_ir)

        def run_batch(b_ir: np.ndarray, b_vis: np.ndarray) -> np.ndarray:
            if self.mesh is not None and self.mesh.size > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                sh = NamedSharding(self.mesh, P(self.data_axis))
                b_ir = jax.device_put(b_ir, sh)
                b_vis = jax.device_put(b_vis, sh)
            return np.asarray(self._forward(self.variables, b_ir, b_vis))

        n_dev = self._device_count()
        if self.max_batch:
            # fixed-size chunks: one compiled executable for every input resolution
            chunk = self.max_batch
            assert chunk % n_dev == 0, (chunk, n_dev)
            outs = []
            for c0 in range(0, n_tiles, chunk):
                c_ir = tiles_ir[c0 : c0 + chunk]
                c_vis = tiles_vis[c0 : c0 + chunk]
                pad = chunk - len(c_ir)
                outs.append(
                    run_batch(
                        np.stack(c_ir + [c_ir[-1]] * pad),
                        np.stack(c_vis + [c_vis[-1]] * pad),
                    )[: len(c_ir)]
                )
            fused = np.concatenate(outs, axis=0)
        else:
            # pad the tile batch to a multiple of the device count for even sharding
            pad = (-n_tiles) % n_dev
            fused = run_batch(
                np.stack(tiles_ir + [tiles_ir[-1]] * pad),
                np.stack(tiles_vis + [tiles_vis[-1]] * pad),
            )[:n_tiles]

        wy = _ramp_weights(th, ys, h)
        wx = _ramp_weights(tw, xs, w)
        acc = np.zeros((h, w, 1), np.float32)
        norm = np.zeros((h, w, 1), np.float32)
        k = 0
        for i, y0 in enumerate(ys):
            for j, x0 in enumerate(xs):
                wgt = (wy[i][:, None] * wx[j][None, :])[:, :, None]
                acc[y0 : y0 + th, x0 : x0 + tw] += fused[k] * wgt
                norm[y0 : y0 + th, x0 : x0 + tw] += wgt
                k += 1
        return acc / np.maximum(norm, 1e-8)
