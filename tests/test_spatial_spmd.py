"""GSPMD-partitioned packed kernels (ops/pallas_pack_spmd.py): row-sharded
lowerings of the production Mosaic kernels must match the single-device kernels
exactly, and the SpatialFuser must run them sharded end-to-end.

This is the round-5 "exact multi-chip fusion with the production packed
kernels" capability (reference behaviour being distributed: the global-image
cyclic roll, /root/reference/a001_WindowAttention.py:442-444).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import swin_unet_image_fusion_tpu.ops.pallas_pack as pp
import swin_unet_image_fusion_tpu.ops.pallas_pack_spmd as spmd
from swin_unet_image_fusion_tpu.config import ModelConfig
from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet
from swin_unet_image_fusion_tpu.parallel.spatial import SpatialFuser, spatial_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

WINDOW = (7, 7)
ROW_SHARD = P(None, None, "space", None, None, None)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("space",))


def _params(rng, c, heads, d):
    inner = heads * d
    g = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.1
    return dict(
        ln1_scale=jnp.ones((2, c)), ln1_bias=jnp.zeros((2, c)),
        attn=dict(
            wq=g(2, c, inner), bq=g(2, inner), wk=g(2, c, inner), bk=g(2, inner),
            wv=g(2, c, inner), bv=g(2, inner), wp=g(2, inner, c), bp=g(2, c),
        ),
        bias=g(2, 49, 49),
        ln2_scale=jnp.ones((2, c)), ln2_bias=jnp.zeros((2, c)),
        w1=g(2, c, 4 * c), b1=g(2, 4 * c), w2=g(2, 4 * c, c), b2=g(2, c),
    )


# (56, 28): wrap-roll shifted geometry (224^2-class); (49, 49): pad-mode shifted
# geometry (512^2-class — equal grids, so the repartition stays eligible and the
# halo is edge-zeroed instead of ring-wrapped). Slow tier: the fast tier keeps
# the seam-mask regression + one ppermute-halo repartition under its budget.
@pytest.mark.slow
@pytest.mark.parametrize("hw", [(56, 28), (49, 49)])
@pytest.mark.parametrize("shift,cross", [(True, False), (False, True)])
def test_partitioned_block_matches_single_device(rng, hw, shift, cross):
    c, heads, d = 8, 2, 4
    *_, nh, nw = pp.shift_pad_geometry(hw, WINDOW, shift)
    x = jnp.asarray(rng.standard_normal((2, 1, nh, nw // 2, c, 128)), jnp.float32)
    kw = dict(
        hw=hw, window=WINDOW, num_heads=heads, dims_per_head=d,
        activation="elu", interpret=True, cross=cross, shift=shift,
        **_params(rng, c, heads, d),
    )
    ref = pp.pallas_packed_block_strips(x, **kw)
    xs = jax.device_put(x, NamedSharding(_mesh(), ROW_SHARD))
    spmd.LAST_PARTITIONS.clear()
    out = jax.jit(lambda a: spmd.pallas_packed_block_strips_spmd(a, **kw))(xs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert any(p[-1] for p in spmd.LAST_PARTITIONS), "fell back to replicated"


def test_partitioned_block_one_pair_shard_keeps_seam_mask(rng):
    """Regression: a 1-row shard of a 1-pair-wide shifted geometry has a
    (1, 1, ...) mask slice — shape-sniffing it as the shared interior mask
    silently dropped the wrap-seam masking (caught by e2e mismatch)."""
    hw = (56, 14)
    c, heads, d = 8, 2, 4
    *_, nh, nw = pp.shift_pad_geometry(hw, WINDOW, True)
    assert (nh, nw // 2) == (8, 1)
    x = jnp.asarray(rng.standard_normal((2, 1, nh, 1, c, 128)), jnp.float32)
    kw = dict(
        hw=hw, window=WINDOW, num_heads=heads, dims_per_head=d,
        activation="elu", interpret=True, cross=False, shift=True,
        **_params(rng, c, heads, d),
    )
    ref = pp.pallas_packed_block_strips(x, **kw)
    xs = jax.device_put(x, NamedSharding(_mesh(), ROW_SHARD))
    out = jax.jit(lambda a: spmd.pallas_packed_block_strips_spmd(a, **kw))(xs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize(
    "hw", [(56, 28), pytest.param((49, 49), marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("from_shift", [pytest.param(False, marks=pytest.mark.slow), True])
def test_partitioned_repartition_ppermute_halo(rng, hw, from_shift):
    """The one-strip-row halo rides an explicit ppermute: ring in wrap mode
    (the reference's global-image roll across shards), edge-zeroed in pad."""
    to_shift = not from_shift
    assert pp.repart_in_kernel_ok(hw, WINDOW, from_shift, to_shift)
    c = 8
    *_, nh, nw = pp.shift_pad_geometry(hw, WINDOW, from_shift)
    x = jnp.asarray(rng.standard_normal((2, 1, nh, nw // 2, c, 128)), jnp.float32)
    ref = pp.repartition_packed_pallas(x, WINDOW, hw, from_shift, to_shift, True)
    xs = jax.device_put(x, NamedSharding(_mesh(), ROW_SHARD))
    spmd.LAST_PARTITIONS.clear()
    out = jax.jit(
        lambda a: spmd.repartition_packed_spmd(a, WINDOW, hw, from_shift, to_shift, True)
    )(xs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert any(p[-1] for p in spmd.LAST_PARTITIONS), "fell back to replicated"


TINY_PACK = ModelConfig(
    in_dims_list=(1, 8),
    out_dims_list=(8, 16),
    att_num_heads=2,
    att_dims_per_head_ratio=1 / 2,
    attention_impl="pallas_pack_interpret",
)


def _fuse_and_compare(rng, hw, atol, require_sharded=True):
    model = SwinFusionUNet(TINY_PACK)
    ir = jnp.asarray(rng.random((1, *hw, 1), dtype=np.float32))
    vis = jnp.asarray(rng.random((1, *hw, 1), dtype=np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ir, vis)
    ref = jnp.clip(model.apply(variables, ir, vis), 0, 1)
    spmd.LAST_PARTITIONS.clear()
    fuser = SpatialFuser(model, variables, mesh=spatial_mesh(8))
    out = fuser.fuse(ir, vis)
    assert out.shape == (1, *hw, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)
    if require_sharded:
        sharded = [p for p in spmd.LAST_PARTITIONS if p[-1]]
        assert sharded, "no kernel lowering was actually row-sharded"


@pytest.mark.slow
def test_spatial_sharded_packed_forward(rng):
    # stage-0 strips (56, 14) shard 8 ways; stage 1 (28, 14) exercises the
    # replicated per-kernel fallback (nh=4 does not divide the mesh)
    _fuse_and_compare(rng, (112, 28), atol=2e-5)


@pytest.mark.parametrize("hw", [(100, 90), (224, 224)])
@pytest.mark.slow
def test_spatial_sharded_packed_edge_geometries(rng, hw):
    # the same two geometries the jnp path is held to
    # (tests/test_spatial_sharding.py): non-window-multiple maps with uneven
    # H-shards, and the wrap-roll 224^2 training geometry
    _fuse_and_compare(rng, hw, atol=5e-5)


def test_spatial_fuser_rejects_nhwc_impls(rng):
    cfg = ModelConfig(
        in_dims_list=(1, 8), out_dims_list=(8, 16), att_num_heads=2,
        att_dims_per_head_ratio=1 / 2, attention_impl="pallas",
    )
    model = SwinFusionUNet(cfg)
    with pytest.raises(ValueError, match="opaque to GSPMD"):
        SpatialFuser(model, {}, mesh=spatial_mesh(8))


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(63, 70), (84, 56), (126, 98)])
def test_spatial_sharded_awkward_geometries(rng, hw):
    """Awkward maps: odd window columns (dummy pair slots), strip-row counts
    that do or don't divide the mesh, and uneven H-shards. No stage here has a
    mesh-divisible row count, so every kernel takes the clean replicated
    fallback — the test pins down that shardy's PARTIAL sharding proposals
    (which jax's custom_partitioning layer cannot convert — it crashes before
    the callback) are fenced off by the wrappers' sharding pins, and that the
    output still equals single-device."""
    _fuse_and_compare(rng, hw, atol=5e-5, require_sharded=False)
