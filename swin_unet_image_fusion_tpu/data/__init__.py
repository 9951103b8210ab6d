from .dataset import (
    BatchLoader,
    FusionPairDataset,
    collect_pair_paths,
    device_prefetch,
    split_train_val,
)

__all__ = [
    "BatchLoader",
    "FusionPairDataset",
    "collect_pair_paths",
    "device_prefetch",
    "split_train_val",
]
