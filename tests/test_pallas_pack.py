"""Parity tests for the lane-packed C-major fused block kernel (ops/pallas_pack.py).

The packed kernel (interpret mode on CPU) must reproduce the jnp NHWC composition
bit-closely for every block flavour, including odd window counts (dummy-window
masking) and the full model end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_unet_image_fusion_tpu.models.layers import BasicBlock, pack_beneficial
from swin_unet_image_fusion_tpu.ops.pallas_pack import (
    pack_windows_cmajor,
    unpack_windows_cmajor,
)


def test_pack_unpack_round_trip_even():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 24, 14, 28), np.float32))
    xp, (nh, npw, nw) = pack_windows_cmajor(x, (7, 7))
    assert (nh, npw, nw) == (2, 2, 4)
    assert xp.shape == (2, 3, 2, 2, 24, 128)
    back = unpack_windows_cmajor(xp, (7, 7), (14, 28))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pack_unpack_round_trip_odd_nw():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 1, 8, 21, 21), np.float32))  # nW=3 odd
    xp, (nh, npw, nw) = pack_windows_cmajor(x, (7, 7))
    # odd counts pad to a dummy masked column AND row (even pair columns for the
    # 2-window lane packing; even rows for multi-row kernel tiles)
    assert (nh, npw, nw) == (4, 2, 4)
    back = unpack_windows_cmajor(xp, (7, 7), (21, 21))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def _block_pair(c, heads, d, shift, cross, hw, seed=0):
    """Build jnp and packed-interpret blocks sharing one param set; return outputs."""
    rng = np.random.default_rng(seed)
    s, b = 2, 2
    h, w = hw
    x = jnp.asarray(rng.random((s, b, h, w, c), np.float32))

    kw = dict(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=shift, cross=cross, mlp_hidden_dims=4 * c,
    )
    ref = BasicBlock(impl="jnp", **kw)
    params = ref.init(jax.random.PRNGKey(seed), x)
    out_ref = ref.apply(params, x)

    packed = BasicBlock(impl="pallas_pack_interpret", packed=True, **kw)
    x_cm = jnp.moveaxis(x, -1, 2)
    out_cm = packed.apply(params, x_cm)
    out_pk = jnp.moveaxis(out_cm, 2, -1)
    return np.asarray(out_ref), np.asarray(out_pk)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("cross", [False, True])
def test_packed_block_matches_jnp(shift, cross):
    # stage-0-like dims: C=24, 8 heads of d=3 (padded to 8 in the kernel)
    out_ref, out_pk = _block_pair(24, 8, 3, shift, cross, (14, 28))
    np.testing.assert_allclose(out_pk, out_ref, rtol=2e-5, atol=2e-5)


def test_packed_block_odd_nw_matches_jnp():
    out_ref, out_pk = _block_pair(24, 8, 3, True, True, (21, 21))  # nW=3 -> dummy col
    np.testing.assert_allclose(out_pk, out_ref, rtol=2e-5, atol=2e-5)


def test_packed_block_stage1_dims():
    out_ref, out_pk = _block_pair(48, 8, 6, True, False, (14, 14))
    np.testing.assert_allclose(out_pk, out_ref, rtol=2e-5, atol=2e-5)


def test_pack_beneficial_rule():
    assert pack_beneficial(24, 512)       # stage 0 at 512^2
    assert pack_beneficial(96, 128)       # stage 2 at 512^2
    assert pack_beneficial(192, 14)       # C=192 stages: measured win (both paths)
    assert pack_beneficial(192, 32)
    assert pack_beneficial(96, 28)        # measured: 119.5 -> 107.3 ms/step at 224^2
    assert not pack_beneficial(384, 32)   # C=384: exact 3x128 lanes, unmeasured
    assert not pack_beneficial(24, 16)    # tiny W: C-major would pad worse


@pytest.mark.parametrize("cross", [False, True])
def test_packed_block_grad_parity(cross):
    """Custom-VJP gradients (input + every parameter) match jnp autodiff."""
    rng = np.random.default_rng(7)
    s, b, c, heads, d = 2, 1, 24, 8, 3
    h, w = 14, 14
    x = jnp.asarray(rng.random((s, b, h, w, c), np.float32))
    gsel = jnp.asarray(rng.random((s, b, h, w, c), np.float32))

    kw = dict(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=True, cross=cross, mlp_hidden_dims=4 * c,
    )
    ref = BasicBlock(impl="jnp", **kw)
    params = ref.init(jax.random.PRNGKey(1), x)

    def loss_ref(params, x):
        return jnp.sum(ref.apply(params, x) * gsel)

    packed = BasicBlock(impl="pallas_pack_interpret", packed=True, **kw)

    def loss_pk(params, x):
        out = packed.apply(params, jnp.moveaxis(x, -1, 2))
        return jnp.sum(jnp.moveaxis(out, 2, -1) * gsel)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pk = jax.grad(loss_pk, argnums=(0, 1))(params, x)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pk = jax.tree_util.tree_leaves_with_path(g_pk)
    assert len(flat_ref) == len(flat_pk)
    for (path_r, leaf_r), (path_p, leaf_p) in zip(flat_ref, flat_pk):
        assert path_r == path_p
        np.testing.assert_allclose(
            np.asarray(leaf_p), np.asarray(leaf_r), rtol=2e-4, atol=2e-4,
            err_msg=str(path_r),
        )


@pytest.mark.slow
def test_full_model_packed_matches_jnp():
    """End-to-end: tiny 2-stage model, pallas_pack_interpret vs jnp."""
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    rng = np.random.default_rng(3)
    ir = jnp.asarray(rng.random((1, 30, 40, 1), np.float32))
    vis = jnp.asarray(rng.random((1, 30, 40, 1), np.float32))

    cfg = dict(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    ref_model = SwinFusionUNet(ModelConfig(**cfg))
    params = jax.jit(ref_model.init)(jax.random.PRNGKey(0), ir, vis)
    out_ref = ref_model.apply(params, ir, vis, train=False)

    pk_model = SwinFusionUNet(
        ModelConfig(attention_impl="pallas_pack_interpret", **cfg)
    )
    out_pk = pk_model.apply(params, ir, vis, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )


@pytest.mark.slow
def test_noncontiguous_cmajor_pattern(monkeypatch):
    """A packed stage BELOW a non-packed one (PACK_C_LIMIT knob, the deep-stage
    packing experiment): the decoder must convert back to NHWC when it re-enters
    the non-packed stage — its map is still in C-major form after the packed
    stage's unmerge. Regression test for the non-contiguous layout-tracking fix
    in models/unet.py (skips previously added (S,B,C,H,W) to (S,B,H,W,C))."""
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.layers import pack_beneficial
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    monkeypatch.setenv("PACK_C_LIMIT", "256")
    assert pack_beneficial(192, 7) and not pack_beneficial(96, 14)

    cfg = dict(
        in_dims_list=(1, 96), out_dims_list=(96, 192),  # stage0 NHWC, stage1 packed
        att_num_heads=8, att_dims_per_head_ratio=1 / 8,  # the 224^2 deep geometry
    )
    rng = np.random.default_rng(11)
    ir = jnp.asarray(rng.random((1, 28, 28, 1), np.float32))
    vis = jnp.asarray(rng.random((1, 28, 28, 1), np.float32))

    ref_model = SwinFusionUNet(ModelConfig(**cfg))
    params = jax.jit(ref_model.init)(jax.random.PRNGKey(0), ir, vis)
    out_ref = ref_model.apply(params, ir, vis, train=False)

    pk_model = SwinFusionUNet(
        ModelConfig(attention_impl="pallas_pack_interpret", **cfg)
    )
    out_pk = pk_model.apply(params, ir, vis, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_ref), rtol=3e-5, atol=3e-5
    )

    # gradients through the packed C=192 stage (dph=24 head splits, packed
    # boundary backward, skip-layout conversion cotangents)
    from jax.flatten_util import ravel_pytree

    def loss(model):
        return lambda v: (model.apply(v, ir, vis, train=False) ** 2).sum()

    flat_ref, _ = ravel_pytree(jax.grad(loss(ref_model))(params))
    flat_pk, _ = ravel_pytree(jax.grad(loss(pk_model))(params))
    scale = float(jnp.abs(flat_ref).max())
    np.testing.assert_allclose(
        np.asarray(flat_pk) / scale, np.asarray(flat_ref) / scale,
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_full_model_cmajor_trunk_grads_and_param_tree():
    """The C-major trunk (boundary pads/merges/skips run (S,B,C,H,W) under
    pallas_pack) must keep the identical param tree (checkpoint compatibility
    across impls) and match jnp gradients end-to-end at odd sizes."""
    from jax.flatten_util import ravel_pytree

    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    rng = np.random.default_rng(7)
    ir = jnp.asarray(rng.random((2, 25, 31, 1), np.float32))
    vis = jnp.asarray(rng.random((2, 25, 31, 1), np.float32))

    cfg = dict(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    ref_model = SwinFusionUNet(ModelConfig(**cfg))
    variables = jax.jit(ref_model.init)(jax.random.PRNGKey(0), ir, vis)

    pk_model = SwinFusionUNet(ModelConfig(attention_impl="pallas_pack_interpret", **cfg))
    v_pk = jax.jit(pk_model.init)(jax.random.PRNGKey(0), ir, vis)
    assert jax.tree_util.tree_structure(v_pk) == jax.tree_util.tree_structure(variables)

    aux = {k: v for k, v in variables.items() if k != "params"}

    def make_loss(model):
        def f(params, a, b):
            out = model.apply({"params": params, **aux}, a, b, train=False)
            return jnp.sum(out * out)

        return f

    g_ref = jax.jit(jax.grad(make_loss(ref_model)))(variables["params"], ir, vis)
    g_pk = jax.jit(jax.grad(make_loss(pk_model)))(variables["params"], ir, vis)
    flat_r = np.asarray(ravel_pytree(g_ref)[0])
    flat_p = np.asarray(ravel_pytree(g_pk)[0])
    rel = np.abs(flat_p - flat_r).max() / (np.abs(flat_r).max() + 1e-12)
    assert rel < 1e-4, rel


def test_packed_block_grad_parity_forced_bwd_split(monkeypatch):
    """Gradients unchanged when the backward runs on a finer tile grid (the VMEM
    guard for big forward tiles — pallas_attention.bwd_split_factor)."""
    from swin_unet_image_fusion_tpu.ops import pallas_attention

    monkeypatch.setattr(pallas_attention, "BWD_VMEM_BUDGET_BYTES", 5_000_000)

    rng = np.random.default_rng(11)
    s, b, c, heads, d = 2, 1, 24, 8, 3
    h, w = 14, 28  # 2x2 pair-columns -> tile splits
    x = jnp.asarray(rng.random((s, b, h, w, c), np.float32))
    gsel = jnp.asarray(rng.random((s, b, h, w, c), np.float32))

    kw = dict(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=True, cross=True, mlp_hidden_dims=4 * c,
    )
    ref = BasicBlock(impl="jnp", **kw)
    params = ref.init(jax.random.PRNGKey(1), x)

    def loss_ref(params, x):
        return jnp.sum(ref.apply(params, x) * gsel)

    packed = BasicBlock(impl="pallas_pack_interpret", packed=True, **kw)

    def loss_pk(params, x):
        out = packed.apply(params, jnp.moveaxis(x, -1, 2))
        return jnp.sum(jnp.moveaxis(out, 2, -1) * gsel)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_pk = jax.grad(loss_pk, argnums=(0, 1))(params, x)
    for (pr, lr), (pp, lp) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pk),
    ):
        assert pr == pp
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lr), rtol=2e-4, atol=2e-4, err_msg=str(pr)
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.slow
def test_packed_model_random_odd_sizes(seed):
    """Roll-free shifted packing must match the jnp roll+mask model at arbitrary
    (odd) resolutions, where the edge-window masks differ per size."""
    from swin_unet_image_fusion_tpu.config import ModelConfig
    from swin_unet_image_fusion_tpu.models.unet import SwinFusionUNet

    rng = np.random.default_rng(100 + seed)
    h = int(rng.integers(17, 47))
    w = int(rng.integers(17, 47))
    ir = jnp.asarray(rng.random((1, h, w, 1), np.float32))
    vis = jnp.asarray(rng.random((1, h, w, 1), np.float32))

    cfg = dict(
        in_dims_list=(1, 8), out_dims_list=(8, 16),
        att_num_heads=2, att_dims_per_head_ratio=1 / 2,
    )
    ref_model = SwinFusionUNet(ModelConfig(**cfg))
    params = jax.jit(ref_model.init)(jax.random.PRNGKey(seed), ir, vis)
    out_ref = ref_model.apply(params, ir, vis, train=False)

    pk_model = SwinFusionUNet(ModelConfig(attention_impl="pallas_pack_interpret", **cfg))
    out_pk = pk_model.apply(params, ir, vis, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_ref), rtol=5e-5, atol=5e-5,
        err_msg=f"size {h}x{w}",
    )


def test_repartition_matches_unpack_then_pack():
    """repartition_packed == pack(to) . crop . unpack(from) bit-exactly on every
    real pixel, both directions, at even/odd/edge-heavy sizes (the stage-fusion
    transform that replaces per-block pack/unpack transposes with lane matmuls)."""
    from swin_unet_image_fusion_tpu.ops.pallas_pack import repartition_packed

    rng = np.random.default_rng(0)
    for hw in [(14, 28), (21, 21), (16, 9), (100, 90)]:
        x = jnp.asarray(rng.random((2, 2, 5, *hw), dtype=np.float32))
        for f, t in [(False, True), (True, False)]:
            xp_f, _ = pack_windows_cmajor(x, (7, 7), f)
            xp_t_direct, _ = pack_windows_cmajor(x, (7, 7), t)
            xp_t = repartition_packed(xp_f, (7, 7), hw, f, t)
            assert xp_t.shape == xp_t_direct.shape
            a = unpack_windows_cmajor(xp_t, (7, 7), hw, t)
            b = unpack_windows_cmajor(xp_t_direct, (7, 7), hw, t)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repartition_is_linear_and_differentiable():
    """The re-partition is a fixed linear map: its VJP round-trips gradients onto
    exactly the real-pixel positions (sum preserved for an all-ones cotangent on
    real pixels)."""
    from swin_unet_image_fusion_tpu.ops.pallas_pack import repartition_packed

    rng = np.random.default_rng(1)
    hw = (14, 21)
    x = jnp.asarray(rng.random((2, 1, 3, *hw), dtype=np.float32))
    xp, _ = pack_windows_cmajor(x, (7, 7), False)

    def f(xp_in):
        out = repartition_packed(xp_in, (7, 7), hw, False, True)
        real = unpack_windows_cmajor(out, (7, 7), hw, True)
        return jnp.sum(real)

    g = jax.grad(f)(xp)
    g_real = unpack_windows_cmajor(g, (7, 7), hw, False)
    np.testing.assert_allclose(np.asarray(g_real), 1.0)


@pytest.mark.parametrize("wrap", [False, True])
def test_shift_modes_both_match_jnp(monkeypatch, wrap):
    """The wrap-roll shifted partition (WRAP_SHIFT, reference torch.roll semantics
    with classic region masks) and the legacy roll-free zero-padded partition both
    reproduce the jnp oracle — block outputs AND the repartition round trip."""
    from swin_unet_image_fusion_tpu.ops import pallas_pack as pp

    monkeypatch.setattr(pp, "WRAP_SHIFT", wrap)
    # force the mode at every geometry (use_wrap normally picks per-geometry)
    monkeypatch.setattr(pp, "_wrap_profitable", lambda hw, window: True)

    # shifted cross block at an odd-nW, edge-heavy size (seam masks + dummy slots)
    out_ref, out_pk = _block_pair(24, 8, 3, True, True, (21, 21), seed=3)
    np.testing.assert_allclose(out_pk, out_ref, rtol=2e-5, atol=2e-5)

    # repartition == pack(to) . crop . unpack(from) on real pixels in this mode
    rng = np.random.default_rng(4)
    for hw in [(14, 28), (21, 21), (16, 9)]:
        x = jnp.asarray(rng.random((2, 1, 5, *hw), dtype=np.float32))
        for f, t in [(False, True), (True, False)]:
            xp_f, _ = pack_windows_cmajor(x, (7, 7), f)
            xp_t_direct, _ = pack_windows_cmajor(x, (7, 7), t)
            xp_t = pp.repartition_packed(xp_f, (7, 7), hw, f, t)
            assert xp_t.shape == xp_t_direct.shape
            a = unpack_windows_cmajor(xp_t, (7, 7), hw, t)
            b = unpack_windows_cmajor(xp_t_direct, (7, 7), hw, t)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("hw", [(14, 14), (21, 21)])  # wrap mode / pad mode (+dummy row)
@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.parametrize("bwd_fuse", [True, False])  # in-kernel bwd repart / remat conv
@pytest.mark.slow
def test_in_kernel_repartition_matches_standalone(hw, cross, bwd_fuse, monkeypatch):
    """The fused input-load re-partition (repart_from) is bit-equal to the
    standalone conv (repartition_packed) forward, and real-pixel gradients match
    — on both backward routes (in-kernel fused repart, and the remat-conv
    fallback forced via REPART_BWD_FUSE)."""
    from swin_unet_image_fusion_tpu.ops import pallas_pack as pp

    monkeypatch.setattr(pp, "REPART_BWD_FUSE", bwd_fuse)

    rng = np.random.default_rng(11)
    s, b, c, heads, d = 2, 1, 24, 4, 6

    def mk(shape, sc=0.1):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * sc)

    params = dict(
        ln1_scale=jnp.asarray(rng.random((s, c), np.float32)), ln1_bias=mk((s, c)),
        attn=dict(
            wq=mk((s, c, heads * d)), bq=mk((s, heads * d)),
            wk=mk((s, c, heads * d)), bk=mk((s, heads * d)),
            wv=mk((s, c, heads * d)), bv=mk((s, heads * d)),
            wp=mk((s, heads * d, c)), bp=mk((s, c)),
        ),
        bias=mk((s, 49, 49)),
        ln2_scale=jnp.asarray(rng.random((s, c), np.float32)), ln2_bias=mk((s, c)),
        w1=mk((s, c, 4 * c)), b1=mk((s, 4 * c)), w2=mk((s, 4 * c, c)), b2=mk((s, c)),
    )
    x = jnp.asarray(rng.random((s, b, c, *hw), np.float32))
    for frm, to in [(False, True), (True, False)]:
        assert pp.repart_in_kernel_ok(hw, (7, 7), frm, to)
        src, _ = pack_windows_cmajor(x, (7, 7), shift=frm)
        kw = dict(hw=hw, cross=cross, shift=to, window=(7, 7), num_heads=heads,
                  dims_per_head=d, interpret=True)

        out_ref = pp.pallas_packed_block_strips(
            pp.repartition_packed(src, (7, 7), hw, frm, to), **kw, **params
        )
        out_fused = pp.pallas_packed_block_strips(src, repart_from=frm, **kw, **params)
        # the re-partitioned values are exact (one-hot selects) but the block body
        # compiles in a different fusion context -> f32 rounding noise only
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), atol=2e-6, rtol=1e-6
        )

        # real-pixel gradients (pad lanes / masked dummy positions are don't-care
        # in BOTH formulations: attention masks them and unpack crops them)
        cot = jnp.asarray(rng.random((s, b, c, *hw), np.float32))

        def loss(prm, sv, fused):
            out = (
                pp.pallas_packed_block_strips(sv, repart_from=frm, **kw, **prm)
                if fused
                else pp.pallas_packed_block_strips(
                    pp.repartition_packed(sv, (7, 7), hw, frm, to), **kw, **prm
                )
            )
            real = unpack_windows_cmajor(out, (7, 7), hw, shift=to)
            return jnp.sum(real * cot)

        g_ref = jax.grad(loss, argnums=(0, 1))(params, src, False)
        g_fused = jax.grad(loss, argnums=(0, 1))(params, src, True)
        for a, bb, path in zip(
            jax.tree.leaves(g_fused), jax.tree.leaves(g_ref),
            [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(g_ref)],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(bb), atol=1e-5, rtol=1e-5, err_msg=path
            )

        # hash dropout composes: the masks key off (seed, site, global pair index)
        # which repart does not change, so fused == standalone under the same seed
        if hw == (14, 14) and not cross:
            dkw = dict(kw, drop_rates=(0.2, 0.1, 0.1),
                       drop_seed=jnp.asarray(123, jnp.int32))
            d_ref = pp.pallas_packed_block_strips(
                pp.repartition_packed(src, (7, 7), hw, frm, to), **dkw, **params
            )
            d_fused = pp.pallas_packed_block_strips(
                src, repart_from=frm, **dkw, **params
            )
            np.testing.assert_allclose(
                np.asarray(d_fused), np.asarray(d_ref), atol=2e-6, rtol=1e-6
            )


def test_wrap_profitability_choice():
    """use_wrap picks wrap exactly where it shrinks the even-rounded window grid:
    every 224^2-model stage map (112/56/28/14, window multiples) wraps; every
    512^2 stage map (256/128/64/32) keeps the padded partition (the even-rounded
    grids are equal there, so wrap's rolls would be pure cost)."""
    from swin_unet_image_fusion_tpu.ops import pallas_pack as pp

    for m in (112, 56, 28, 14):
        assert pp.use_wrap((m, m), (7, 7), True), m
    for m in (256, 128, 64, 32):
        assert not pp.use_wrap((m, m), (7, 7), True), m
    assert not pp.use_wrap((112, 112), (7, 7), False)


@pytest.mark.parametrize("hw", [(32, 32), (28, 28), (66, 64), (14, 28)])
@pytest.mark.parametrize("direction", [(False, True), (True, False)])
def test_repartition_pallas_matches_conv(hw, direction):
    """The standalone Mosaic re-partition kernel is bit-equal to the conv form,
    forward AND gradient (the exact linear transpose), at pad- and wrap-mode
    geometries in both directions."""
    from swin_unet_image_fusion_tpu.ops.pallas_pack import (
        repart_in_kernel_ok,
        repartition_packed,
        repartition_packed_pallas,
        shift_pad_geometry,
    )

    frm, to = direction
    win = (7, 7)
    assert repart_in_kernel_ok(hw, win, frm, to), (hw, direction)
    *_, nh, nw = shift_pad_geometry(hw, win, frm)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 2, nh, nw // 2, 5, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(128), jnp.float32)

    ref = repartition_packed(x, win, hw, frm, to)
    got = repartition_packed_pallas(x, win, hw, frm, to, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    g_ref = jax.grad(lambda a: (repartition_packed(a, win, hw, frm, to) * w).sum())(x)
    g_got = jax.grad(
        lambda a: (repartition_packed_pallas(a, win, hw, frm, to, True) * w).sum()
    )(x)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))
