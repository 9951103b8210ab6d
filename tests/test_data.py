"""Data pipeline tests: pairing walk, YCrCb handling, paired augmentation, batching."""

import numpy as np
import pytest

from swin_unet_image_fusion_tpu.config import DataConfig
from swin_unet_image_fusion_tpu.data.dataset import (
    BatchLoader,
    FusionPairDataset,
    collect_pair_paths,
    sample_resized_crop_params,
    split_train_val,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def dataset_dir(tmp_path, rng):
    """Synthetic ir/ + vis/ folder with 6 paired images of varied sizes."""
    (tmp_path / "ir").mkdir()
    (tmp_path / "vis").mkdir()
    for i in range(6):
        h, w = 240 + 8 * i, 300 + 4 * i
        gray = (rng.random((h, w)) * 255).astype(np.uint8)
        color = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "ir" / f"{i:03d}.png"), gray)
        cv2.imwrite(str(tmp_path / "vis" / f"{i:03d}.png"), color)
    return str(tmp_path)


def test_collect_pair_paths(dataset_dir):
    ir, vis = collect_pair_paths(dataset_dir)
    assert len(ir) == len(vis) == 6
    assert ir == sorted(ir) and vis == sorted(vis)


def test_train_mode_shapes_and_range(dataset_dir):
    ds = FusionPairDataset(is_test=False, dataset_folder=dataset_dir)
    item = ds[0]
    assert item["ir"].shape == (224, 224, 1)
    assert item["vis"].shape == (224, 224, 1)  # Y only in train mode (a015:92-93)
    assert 0.0 <= item["ir"].min() and item["ir"].max() <= 1.0


def test_test_mode_keeps_ycrcb(dataset_dir):
    ds = FusionPairDataset(is_test=True, dataset_folder=dataset_dir)
    item = ds[2]
    assert item["vis"].shape[-1] == 3  # YCrCb in test mode (a015:104-106)
    assert item["ir"].shape[-1] == 1
    assert item["ir"].shape[:2] == item["vis"].shape[:2]  # un-augmented full size


def test_paired_augmentation_is_synchronised(tmp_path, rng):
    """IR and VIS get the identical crop/flip: encode the same image in both folders
    and require pixel-identical augmented outputs (reference seed trick, a015:96-103)."""
    (tmp_path / "ir").mkdir()
    (tmp_path / "vis").mkdir()
    img = (rng.random((260, 320)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "ir" / "a.png"), img)
    cv2.imwrite(str(tmp_path / "vis" / "a.png"), cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))

    ds = FusionPairDataset(is_test=False, dataset_folder=str(tmp_path))
    for _ in range(5):
        item = ds[0]
        # vis went through BGR->YCrCb; Y of a gray image equals the gray value
        np.testing.assert_allclose(item["ir"], item["vis"], atol=2 / 255)


def test_crop_params_within_bounds(rng):
    for _ in range(200):
        top, left, h, w = sample_resized_crop_params(rng, 240, 300, (0.08, 1.0), (0.75, 4 / 3))
        assert 0 <= top <= 240 - h and 0 <= left <= 300 - w
        assert h > 0 and w > 0


def test_augmentation_seed_determinism_across_threads(dataset_dir):
    """Same-seed runs produce bit-identical batches with 8 decode threads, and the
    thread count does not change the data (per-item (seed, epoch, index) RNG —
    reference reproducibility intent, a015_dataset.py:96-103)."""

    def run(num_threads, seed=7):
        ds = FusionPairDataset(is_test=False, dataset_folder=dataset_dir, seed=seed)
        out = []
        for epoch in range(2):
            ds.set_epoch(epoch)
            loader = BatchLoader(
                ds, np.arange(len(ds)), batch_size=3, shuffle=True, drop_last=True,
                seed=seed, num_threads=num_threads,
            )
            out.extend(np.stack([b["ir"], b["vis"]]) for b in loader)
        return np.stack(out)

    a = run(8)
    b = run(8)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, run(1))

    # different epochs draw different crops (the stream advances)
    ds = FusionPairDataset(is_test=False, dataset_folder=dataset_dir, seed=7)
    ds.set_epoch(0)
    e0 = ds[0]["ir"]
    ds.set_epoch(1)
    e1 = ds[0]["ir"]
    assert not np.array_equal(e0, e1)


def test_device_prefetch_propagates_decode_errors(dataset_dir, tmp_path):
    """A corrupt image fails the epoch loudly (reference a015_dataset.py:77-84),
    not silently shortening it."""
    from swin_unet_image_fusion_tpu.data.dataset import device_prefetch

    corrupt = tmp_path / "bad"
    (corrupt / "ir").mkdir(parents=True)
    (corrupt / "vis").mkdir(parents=True)
    for name in ("a.png", "b.png"):
        (corrupt / "ir" / name).write_bytes(b"not an image")
        (corrupt / "vis" / name).write_bytes(b"not an image")

    ds = FusionPairDataset(is_test=False, dataset_folder=str(corrupt))
    loader = BatchLoader(ds, np.arange(len(ds)), batch_size=2, shuffle=False)
    with pytest.raises(NameError, match="failed to decode"):
        list(device_prefetch(iter(loader)))


def test_batch_loader_and_split(dataset_dir):
    ds = FusionPairDataset(is_test=False, dataset_folder=dataset_dir)
    tr, val = split_train_val(len(ds), 0.5, seed=0)
    assert len(tr) + len(val) == len(ds)
    loader = BatchLoader(ds, tr, batch_size=2, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(tr) // 2 == len(loader)
    assert batches[0]["ir"].shape == (2, 224, 224, 1)
    assert len(batches[0]["ir_path"]) == 2
