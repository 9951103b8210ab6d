"""Meters / terminal utils / multi-host index sharding."""

import numpy as np

from swin_unet_image_fusion_tpu.parallel.mesh import process_local_shard
from swin_unet_image_fusion_tpu.utils.meters import LossMeter
from swin_unet_image_fusion_tpu.utils.term import color


def test_loss_meter_means_and_clear():
    m = LossMeter()
    m.record({"total_loss": 1.0, "ssim_loss": 2.0})
    m.record({"total_loss": 3.0, "ssim_loss": 4.0})
    means = m.mean_and_clear()
    assert means == {"total_loss_mean": 2.0, "ssim_loss_mean": 3.0}
    assert len(m) == 0
    assert m.history == [means]
    assert m.mean_and_clear() == {}


def test_color_passthrough_when_not_tty():
    assert color("cyan", "hello") == "hello"  # captured stdout is not a tty


def test_process_local_shard_partitions():
    """Hosts get EQUAL-length disjoint shards (trimmed to len//pc): a ragged shard
    would make hosts run different numbers of collective steps and deadlock the
    slice at epoch end (see process_local_shard docstring / ADVICE r1)."""
    idx = np.arange(10)
    shards = [process_local_shard(idx, process_index=i, process_count=3) for i in range(3)]
    assert all(len(s) == 3 for s in shards)  # 10 // 3, identical on every host
    together = sorted(np.concatenate(shards).tolist())
    assert len(set(together)) == 9  # disjoint
    assert set(together) <= set(range(10))

    # evenly divisible: nothing is dropped
    idx = np.arange(12)
    shards = [process_local_shard(idx, process_index=i, process_count=3) for i in range(3)]
    assert sorted(np.concatenate(shards).tolist()) == list(range(12))
