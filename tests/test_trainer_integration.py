"""End-to-end trainer integration on a synthetic dataset: train, validate, checkpoint,
resume — the reference's full workload (a016_train.py) at test scale."""

import os

import numpy as np
import pytest

from swin_unet_image_fusion_tpu.config import (
    Config,
    DataConfig,
    LogConfig,
    ModelConfig,
    OptimConfig,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def cfg(tmp_path, rng):
    (tmp_path / "train" / "ir").mkdir(parents=True)
    (tmp_path / "train" / "vis").mkdir(parents=True)
    for i in range(8):
        g = (rng.random((96, 112)) * 255).astype(np.uint8)
        c = (rng.random((96, 112, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "train" / "ir" / f"{i}.png"), g)
        cv2.imwrite(str(tmp_path / "train" / "vis" / f"{i}.png"), c)
    return Config(
        model=ModelConfig(
            in_dims_list=(1, 8),
            out_dims_list=(8, 16),
            att_num_heads=2,
            att_dims_per_head_ratio=1 / 2,
        ),
        optim=OptimConfig(batch_size=2, epochs=1, training_set_ratio=0.75, lr=1e-3),
        data=DataConfig(
            training_dataset_folder=str(tmp_path / "train"), crop_size=(28, 28)
        ),
        log=LogConfig(
            print_training_info_in_iters=2,
            vali_interval_in_iters=2,
            save_model_to_folder=str(tmp_path / "ckpts"),
            save_vali_results_to_folder=str(tmp_path / "vali"),
            tensorboard_log_dir=str(tmp_path / "tb"),
        ),
    )


@pytest.mark.slow
def test_trainer_full_epoch_with_vali_and_checkpoint(cfg, tmp_path):
    from swin_unet_image_fusion_tpu.train import Trainer

    trainer = Trainer(cfg, use_mesh=False)
    assert trainer.iters_per_epoch == 3  # 6 train imgs / bs 2
    trainer.start_train()

    # ran through the epoch; validation grid + checkpoint artifacts exist
    assert int(trainer.state.step) == 3
    vali_pngs = os.listdir(tmp_path / "vali")
    assert len(vali_pngs) >= 1
    ckpts = os.listdir(tmp_path / "ckpts")
    assert len(ckpts) == 1

    # resume restores everything and continues at epoch+1
    trainer2 = Trainer(cfg, use_mesh=False)
    trainer2.load_checkpoint(os.path.join(cfg.log.save_model_to_folder, ckpts[0]))
    assert trainer2.current_epoch == 2
    assert int(trainer2.state.step) == 3
    a = np.asarray(
        next(iter(jax_leaves(trainer.state.params)))
    )
    b = np.asarray(next(iter(jax_leaves(trainer2.state.params))))
    np.testing.assert_array_equal(a, b)

    # loss means were recorded
    assert trainer.train_meter.history


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


@pytest.mark.slow
def test_trainer_warns_on_empty_validation_split(cfg, capsys):
    """1% split + drop_last can leave zero full val batches on tiny datasets; the
    trainer must warn and skip instead of silently printing empty means."""
    import dataclasses

    from swin_unet_image_fusion_tpu.train import Trainer

    # 8 images, ratio 0.99 -> 0 val images; batch 2 + drop_last -> 0 val batches
    cfg_empty = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, training_set_ratio=0.99)
    )
    trainer = Trainer(cfg_empty, use_mesh=False)
    assert len(trainer.val_loader) == 0
    trainer.validate()
    out = capsys.readouterr().out
    assert "validation skipped" in out


@pytest.mark.slow
def test_trainer_adjusts_batch_for_mesh(cfg, tmp_path):
    """A batch size that doesn't divide the data mesh is rounded to shard evenly."""
    import dataclasses
    import jax

    if len(jax.devices()) < 8:
        return
    cfg8 = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, batch_size=6, training_set_ratio=0.75)
    )
    from swin_unet_image_fusion_tpu.train import Trainer

    trainer = Trainer(cfg8, use_mesh=True)  # 8 virtual devices
    assert trainer.batch_size % trainer.mesh.size == 0
