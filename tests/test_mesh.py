"""Unit tests for the mesh / multi-host sharding helpers."""

import numpy as np

from swin_unet_image_fusion_tpu.parallel.mesh import process_local_shard


def test_process_local_shard_even():
    idx = list(range(12))
    shards = [process_local_shard(idx, process_index=p, process_count=4) for p in range(4)]
    assert all(len(s) == 3 for s in shards)
    assert sorted(x for s in shards for x in s) == idx


def test_process_local_shard_ragged_lengths_equal():
    """len % pc != 0: all hosts must get the SAME length (len // pc), or the hosts
    run different numbers of collective steps and deadlock the slice (ADVICE r1)."""
    for n in (9, 10, 11, 13, 101):
        for pc in (2, 3, 4, 8):
            lens = {
                len(process_local_shard(np.arange(n), process_index=p, process_count=pc))
                for p in range(pc)
            }
            assert lens == {n // pc}, (n, pc, lens)


def test_process_local_shard_disjoint():
    n, pc = 11, 3
    shards = [
        list(process_local_shard(list(range(n)), process_index=p, process_count=pc))
        for p in range(pc)
    ]
    flat = [x for s in shards for x in s]
    assert len(flat) == len(set(flat))  # no duplicates across hosts
