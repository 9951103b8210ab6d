"""IR/visible pair dataset with seed-paired augmentation and device prefetch.

Re-design of the reference dataset (``/root/reference/a015_dataset.py``):

- identical directory pairing: walk ``dataset_folder`` collecting files under ``ir/``
  and ``vis/`` subfolders, sorted (a015:38-50);
- identical colour handling: IR loaded grayscale (+channel axis), VIS as BGR->YCrCb;
  train mode keeps only the Y channel, test mode returns all 3 (a015:86-106);
- the reference synchronises the random crop/flip across the (ir, vis) pair by calling
  ``torch.manual_seed`` twice with the same seed (a015:96-103). Here the pair
  augmentation is a pure function of one per-item Generator,
  ``np.random.default_rng((seed, epoch, index))`` — sampled once, applied to both
  images. Deriving the generator from (seed, epoch, index) makes augmentation
  bit-reproducible for a fixed seed *regardless of decode-thread scheduling* (a shared
  Generator across the thread pool would be both racy and order-dependent);
- RandomResizedCrop(224) + RandomHorizontalFlip(0.5) reproduce torchvision v2 semantics
  (scale (0.08, 1), log-uniform aspect in (3/4, 4/3), 10 proposals then centre fallback,
  bilinear resize);
- unlike the reference (``num_workers=0``, a016_train.py:55), decode runs in a thread
  pool and batches are device_put ahead of time (double buffering) so the TPU never
  waits on cv2.

Layout: NHWC float32 in [0, 1].
"""

from __future__ import annotations

import math
import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from ..config import DataConfig

try:  # cv2 is in the base image; guarded so pure-array pipelines work without it
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def collect_pair_paths(dataset_folder: str) -> Tuple[List[str], List[str]]:
    """Walk for ``ir/`` and ``vis/`` leaf folders, sorted (a015_dataset.py:38-50)."""
    ir_paths: List[str] = []
    vis_paths: List[str] = []
    for root, _dirs, files in os.walk(dataset_folder):
        base = os.path.basename(root)
        if base == "ir":
            ir_paths.extend(os.path.join(root, f) for f in files)
        elif base == "vis":
            vis_paths.extend(os.path.join(root, f) for f in files)
    return sorted(ir_paths), sorted(vis_paths)


def sample_resized_crop_params(
    rng: np.random.Generator,
    height: int,
    width: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params parity: (top, left, h, w)."""
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return top, left, h, w
    # fallback: centre crop clamped to the ratio bounds
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def resized_crop(
    img: np.ndarray, top: int, left: int, h: int, w: int, out_hw: Tuple[int, int]
) -> np.ndarray:
    """Crop then bilinear-resize an HWC float image to out_hw."""
    patch = img[top : top + h, left : left + w]
    if cv2 is not None:
        out = cv2.resize(
            patch, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR
        )
        if out.ndim == 2:
            out = out[:, :, None]
        return out
    # numpy bilinear fallback (tests without cv2)
    hh, ww = out_hw
    ys = (np.arange(hh) + 0.5) * h / hh - 0.5
    xs = (np.arange(ww) + 0.5) * w / ww - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    p = patch
    out = (
        p[y0][:, x0] * (1 - wy) * (1 - wx)
        + p[y0][:, x1] * (1 - wy) * wx
        + p[y1][:, x0] * wy * (1 - wx)
        + p[y1][:, x1] * wy * wx
    )
    return out.astype(img.dtype)


class FusionPairDataset:
    """Paired IR/VIS dataset (reference ``MyDataset``, a015_dataset.py:14-122)."""

    def __init__(
        self,
        is_test: bool,
        dataset_folder: str,
        cfg: DataConfig = DataConfig(),
        seed: int = 0,
    ):
        self.is_test = is_test
        self.cfg = cfg
        self.dataset_folder = Path(dataset_folder)
        self.ir_paths, self.vis_paths = collect_pair_paths(dataset_folder)
        if not self.ir_paths:
            raise FileNotFoundError(
                f"no image pairs found: expected ir/ and vis/ subfolders under "
                f"'{dataset_folder}' (reference layout, a015_dataset.py:38-50)"
            )
        if len(self.ir_paths) != len(self.vis_paths):
            raise ValueError(
                f"ir/vis count mismatch: {len(self.ir_paths)} vs {len(self.vis_paths)}"
            )
        self.seed = seed
        self._aug_epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation stream (new draws each epoch, reproducibly)."""
        self._aug_epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.ir_paths)

    def _read_pair(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        if cv2 is None:
            raise RuntimeError("cv2 required for image decoding")
        ir_path, vis_path = self.ir_paths[index], self.vis_paths[index]
        ir = cv2.imread(ir_path, cv2.IMREAD_GRAYSCALE)
        vis = cv2.imread(vis_path, cv2.IMREAD_COLOR)
        if ir is None or vis is None:  # a015_dataset.py:77-84
            raise NameError(
                f"either ir or vis image failed to decode:\n"
                f"  ir_path = {ir_path}\n  vis_path = {vis_path}"
            )
        ir = ir[..., None].astype(np.float32) / 255.0
        vis = cv2.cvtColor(vis, cv2.COLOR_BGR2YCrCb).astype(np.float32) / 255.0
        return ir, vis

    def __getitem__(self, index: int) -> Dict[str, object]:
        ir, vis = self._read_pair(index)
        if not self.is_test:
            vis = vis[..., 0:1]  # Y channel only for training (a015:92-93)
            ir, vis = self.augment_pair(ir, vis, index)
        return {
            "ir": ir,
            "vis": vis,
            "ir_path": self.ir_paths[index],
            "vis_path": self.vis_paths[index],
        }

    def augment_pair(
        self, ir: np.ndarray, vis: np.ndarray, index: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One parameter draw applied to both images (paired augmentation).

        The generator is derived per item from (seed, epoch, index), so the draw is
        independent of which decode thread runs the item and of submission order.
        """
        cfg = self.cfg
        rng = np.random.default_rng((self.seed, self._aug_epoch, index))
        h, w = ir.shape[:2]
        top, left, ch, cw = sample_resized_crop_params(
            rng, h, w, cfg.crop_scale, cfg.crop_ratio
        )
        ir = resized_crop(ir, top, left, ch, cw, cfg.crop_size)
        vis = resized_crop(vis, top, left, ch, cw, cfg.crop_size)
        if rng.random() < cfg.hflip_prob:
            ir = ir[:, ::-1]
            vis = vis[:, ::-1]
        return np.ascontiguousarray(ir), np.ascontiguousarray(vis)


def split_train_val(
    n: int, train_ratio: float, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Random 99/1-style split (reference torch.random_split, a016_train.py:46-49)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(round(n * train_ratio))
    return perm[:n_train], perm[n_train:]


class BatchLoader:
    """Shuffling, drop-last batch iterator with threaded decode.

    Equivalent of the reference DataLoader setup (a016_train.py:50-63) minus the
    host-side serialisation: decode fans out over a thread pool.
    """

    def __init__(
        self,
        dataset: FusionPairDataset,
        indices: Sequence[int],
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_threads: int = 8,
    ):
        self.dataset = dataset
        self.indices = np.asarray(indices)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.pool = ThreadPoolExecutor(max_workers=num_threads)

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, object]]:
        order = self.indices.copy()
        if self.shuffle:
            self.rng.shuffle(order)
        limit = (len(order) // self.batch_size) * self.batch_size if self.drop_last else len(order)
        for start in range(0, limit, self.batch_size):
            chunk = order[start : start + self.batch_size]
            items = list(self.pool.map(self.dataset.__getitem__, chunk))
            yield {
                "ir": np.stack([it["ir"] for it in items]),
                "vis": np.stack([it["vis"] for it in items]),
                "ir_path": [it["ir_path"] for it in items],
                "vis_path": [it["vis_path"] for it in items],
            }


def device_prefetch(
    iterator: Iterator[Dict[str, object]],
    depth: int = 2,
    sharding=None,
) -> Iterator[Dict[str, object]]:
    """Double-buffered host->device pipeline: device_put `depth` batches ahead.

    Array leaves go to the device (optionally with a NamedSharding for DP input
    sharding); path lists stay on host. The TPU step never blocks on cv2 decode.

    Multi-host: when the sharding spans processes (a DCN-connected slice), each host
    feeds its *local* batch shard and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the JAX-native equivalent of a
    per-rank DataLoader + DistributedSampler.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    multi_host = sharding is not None and jax.process_count() > 1

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if multi_host:
            arrays = {
                k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in arrays.items()
            }
        elif sharding is not None:
            arrays = jax.device_put(arrays, sharding)
        else:
            arrays = jax.device_put(arrays)
        return {**arrays, **rest}

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
            q.put(stop)
        except BaseException as exc:  # re-raised in the consumer (fail loudly,
            q.put(exc)  # matching the reference's decode-error behavior a015:77-84)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
