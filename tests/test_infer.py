"""Inference driver tests: Fuser colour path, bucketing, run_test end-to-end."""

import os

import numpy as np
import pytest

import jax

from swin_unet_image_fusion_tpu.config import Config, DataConfig, LogConfig, ModelConfig
from swin_unet_image_fusion_tpu.infer import Fuser, run_test
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

cv2 = pytest.importorskip("cv2")

TINY_MODEL = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
)


def _fuser(cfg: Config) -> Fuser:
    model = SwinFusionUNet(cfg.model)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    return Fuser(cfg, variables["params"], variables.get("batch_stats", {}))


def test_fuse_pair_ycrcb_shapes(rng):
    cfg = Config(model=TINY_MODEL)
    fuser = _fuser(cfg)
    ir = rng.random((1, 60, 52, 1), dtype=np.float32)
    vis = rng.random((1, 60, 52, 3), dtype=np.float32)
    # keep chroma near neutral so YCrCb->RGB stays in gamut (random chroma would be
    # clipped by the RGB conversion, destroying the passthrough we want to verify)
    vis[..., 1:] = 0.5 + 0.05 * (vis[..., 1:] - 0.5)
    rgb = fuser.fuse_pair_ycrcb(ir, vis)
    assert rgb.shape == (1, 60, 52, 3)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0
    # Cr/Cb passthrough: converting the output back to YCrCb recovers the input chroma
    back = cv2.cvtColor(np.asarray(rgb[0]), cv2.COLOR_RGB2YCrCb)
    np.testing.assert_allclose(back[..., 1:], vis[0, ..., 1:], atol=5e-2)


def test_bucketed_fuser_crops_back(rng):
    cfg = Config(model=TINY_MODEL)
    fuser = _fuser(cfg)
    fuser.bucket = 32
    ir = rng.random((1, 50, 45, 1), dtype=np.float32)
    vis = rng.random((1, 50, 45, 1), dtype=np.float32)
    out = fuser.fuse_y(ir, vis)
    assert out.shape == (1, 50, 45, 1)


def test_bucketed_fuser_divergence_bound(rng):
    """Pin the documented bucket-vs-exact NON-parity (Fuser docstring): the extra
    reflect-pad context is not local — the 5-stage downsampling pyramid propagates
    border context globally — so bucket=0 is the only parity mode. The divergence is
    real (outputs differ) but statistically bounded on [0,1] outputs."""
    cfg = Config(model=TINY_MODEL)
    fuser = _fuser(cfg)
    ir = rng.random((1, 50, 45, 1), dtype=np.float32)
    vis = rng.random((1, 50, 45, 1), dtype=np.float32)
    exact = fuser.fuse_y(ir, vis)
    fuser.bucket = 32
    bucketed = fuser.fuse_y(ir, vis)
    assert bucketed.shape == exact.shape
    diff = np.abs(bucketed - exact)
    assert diff.max() > 1e-6  # genuinely not parity — the docstring must stay honest
    assert diff.mean() < 0.05, diff.mean()  # but bounded in the mean on [0,1] outputs


def test_run_test_end_to_end(tmp_path, rng):
    """The reference a017_test.py workload: walk test folder, fuse, save jpgs."""
    (tmp_path / "input" / "ir").mkdir(parents=True)
    (tmp_path / "input" / "vis").mkdir(parents=True)
    for i in range(2):
        g = (rng.random((40, 48)) * 255).astype(np.uint8)
        c = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "input" / "ir" / f"pic{i}.png"), g)
        cv2.imwrite(str(tmp_path / "input" / "vis" / f"pic{i}.png"), c)

    # save a checkpoint to load
    import orbax.checkpoint as ocp

    cfg = Config(
        model=TINY_MODEL,
        data=DataConfig(
            test_dataset_folder=str(tmp_path / "input"),
            test_result_folder=str(tmp_path / "output"),
        ),
        log=LogConfig(using_state_path=str(tmp_path / "ckpt")),
    )
    model = SwinFusionUNet(cfg.model)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 28, 28, 1))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            str(tmp_path / "ckpt"),
            {
                "params": jax.device_get(variables["params"]),
                "opt_state": {},
                "batch_stats": jax.device_get(variables["batch_stats"]),
                "step": 0,
                "epoch": 1,
            },
        )

    run_test(cfg)
    outs = sorted(os.listdir(tmp_path / "output"))
    assert outs == ["pic0_MKX_SELF.jpg", "pic1_MKX_SELF.jpg"]  # a017_test.py:112 naming


def test_serving_bucket_set_covers_documented_shapes():
    """tools/warm_cache.py's SERVING_BUCKETS must be exactly where
    Fuser(bucket=64) sends the documented common sizes — otherwise the
    one-command precompile warms the wrong programs."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from warm_cache import SERVING_BUCKETS

    from swin_unet_image_fusion_tpu.ops.shape_plan import pad_amount

    def bucket_of(h, w, n=64):
        return (h + pad_amount(h, n), w + pad_amount(w, n))

    cases = {
        (256, 256): (256, 256),
        (512, 512): (512, 512),
        (480, 640): (512, 640),
        (450, 620): (512, 640),
        (460, 600): (512, 640),
        (768, 1024): (768, 1024),
        (1024, 1024): (1024, 1024),
    }
    for size, want in cases.items():
        got = bucket_of(*size)
        assert got == want, (size, got, want)
        assert want in SERVING_BUCKETS, (size, want)
