"""In-kernel hash dropout (ops/hash_dropout.py + the packed kernels).

The masks are a pure function of (seed, site, global position), so they are
testable at three levels on CPU:

- hash level: keep statistics, determinism, tiling independence, decorrelation;
- kernel level (interpret mode): determinism per seed, exact no-drop reduction,
  the inverted-dropout expectation E_seed[out] == out_nodrop at the linear sites,
  and a central-finite-difference check of the custom-VJP gradients with every
  dropout site active (this proves the backward's recomputed masks are identical
  to the forward's, including under the backward's finer tile grid);
- module level: BasicBlock(packed) trains with the flax 'dropout' rng and is
  deterministic in eval, matching the reference's train/eval semantics
  (a001_WindowAttention.py:20-22, a003_AutoPathMLP.py:26-31).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swin_unet_image_fusion_tpu.models.layers import BasicBlock, DualWindowAttention
from swin_unet_image_fusion_tpu.ops import hash_dropout as hd

# ---------------------------------------------------------------- hash level


def test_keep_fraction_matches_rate():
    seed = jnp.int32(123)
    for rate in (0.1, 0.5, 0.9):
        m = hd.tile_keep_mask(seed, hd.SITE_ATTN, jnp.int32(0), 16, (64, 256), rate)
        assert abs(float(m.mean()) - (1.0 - rate)) < 0.01


def test_mask_deterministic_and_seed_sensitive():
    a = hd.tile_keep_mask(jnp.int32(5), 1, jnp.int32(3), 4, (24, 128), 0.5)
    b = hd.tile_keep_mask(jnp.int32(5), 1, jnp.int32(3), 4, (24, 128), 0.5)
    c = hd.tile_keep_mask(jnp.int32(6), 1, jnp.int32(3), 4, (24, 128), 0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # different seed: ~50% agreement, i.e. decorrelated
    assert 0.4 < float((a == c).mean()) < 0.6


def test_mask_tiling_independent():
    """The property the whole design rests on: any tiling of the global pair
    sequence yields identical masks (the backward re-tiles finer)."""
    seed = jnp.int32(77)
    full = hd.tile_keep_mask(seed, hd.SITE_PROJ, jnp.int32(0), 12, (24, 128), 0.3)
    parts = [
        hd.tile_keep_mask(seed, hd.SITE_PROJ, jnp.int32(o), 3, (24, 128), 0.3)
        for o in (0, 3, 6, 9)
    ]
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(jnp.concatenate(parts, axis=0))
    )


def test_sites_decorrelated():
    seed = jnp.int32(9)
    masks = [
        hd.tile_keep_mask(seed, site, jnp.int32(0), 4, (96, 128), 0.5)
        for site in (hd.SITE_ATTN, hd.SITE_PROJ, hd.SITE_MLP_HIDDEN, hd.SITE_MLP_OUT)
    ]
    for i in range(len(masks)):
        for j in range(i + 1, len(masks)):
            assert 0.45 < float((masks[i] == masks[j]).mean()) < 0.55


# ---------------------------------------------------------------- kernel level


def _packed_apply(rates, seed_key, *, deterministic=False, data_seed=0,
                  cross=False, shift=False):
    """BasicBlock packed-interpret forward on a small stage-0-like geometry."""
    rng = np.random.default_rng(data_seed)
    s, b, c, heads, d = 2, 1, 24, 4, 6
    x = jnp.asarray(rng.random((s, b, c, 14, 14), np.float32))
    blk = BasicBlock(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=shift, cross=cross, mlp_hidden_dims=4 * c,
        attention_drop_ratio=rates[0], proj_drop_ratio=rates[1],
        mlp_drop_ratio=rates[2], impl="pallas_pack_interpret", packed=True,
    )
    params = blk.init(jax.random.PRNGKey(1), x)
    rngs = {"dropout": seed_key} if not deterministic else None
    out = blk.apply(params, x, deterministic=deterministic, rngs=rngs)
    return np.asarray(out), (blk, params, x)


def test_kernel_dropout_deterministic_per_seed():
    k = jax.random.PRNGKey(3)
    a, _ = _packed_apply((0.2, 0.2, 0.2), k)
    b, _ = _packed_apply((0.2, 0.2, 0.2), k)
    c, _ = _packed_apply((0.2, 0.2, 0.2), jax.random.PRNGKey(4))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


def test_kernel_eval_mode_is_dropout_free():
    a, _ = _packed_apply((0.3, 0.3, 0.3), None, deterministic=True)
    b, _ = _packed_apply((0.0, 0.0, 0.0), None, deterministic=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_kernel_mlp_site_expectation():
    """out = y + drop(m): both MLP masks enter linearly and independently, so the
    seed-average of the dropped output is an unbiased estimate of the undropped
    one. Tested as a per-element t-statistic: a missing or wrong 1/(1-rate)
    scale would bias every m-carrying element by O(rate * m) >> the standard
    error, while the correct kernel keeps |t| = |mean-base| / (std/sqrt(n))
    at O(1)."""
    base, (blk0, params, x) = _packed_apply((0.0, 0.0, 0.0), None, deterministic=True)
    # identical param tree (dropout adds no params): init once, reuse across seeds
    blk = blk0.copy(mlp_drop_ratio=0.5)
    n = 32
    samples = np.stack(
        [
            np.asarray(
                blk.apply(
                    params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(100 + i)},
                )
            )
            for i in range(n)
        ]
    )
    mean = samples.mean(axis=0)
    se = samples.std(axis=0, ddof=1) / np.sqrt(n) + 1e-6
    t = np.abs(mean - base) / se
    # unbiased: half-normal |t| has mean ~0.8; >5-sigma elements ~0
    assert t.mean() < 2.0, t.mean()
    assert (t > 5.0).mean() < 0.01, (t > 5.0).mean()


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.slow
def test_kernel_dropout_grad_finite_difference(cross):
    """Central FD vs the custom VJP with all three dropout sites active.

    Passing this proves the backward recomputes the forward's exact masks (the
    backward runs on its own finer tile grid) and applies them at the right
    points of the chain."""
    rates = (0.25, 0.25, 0.25)
    key = jax.random.PRNGKey(11)
    _, (blk, params, x) = _packed_apply(rates, key, cross=cross)

    cot_rng = np.random.default_rng(5)
    cot = jnp.asarray(cot_rng.standard_normal(x.shape).astype(np.float32))

    def loss(p, xv):
        out = blk.apply(p, xv, deterministic=False, rngs={"dropout": key})
        return jnp.mean(out * cot)

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)

    def fd_check(value, grad, perturb):
        rngd = np.random.default_rng(17)
        v = jnp.asarray(rngd.standard_normal(np.shape(value)).astype(np.float32))
        eps = 1e-2
        fp = loss(*perturb(value + eps * v))
        fm = loss(*perturb(value - eps * v))
        fd = (fp - fm) / (2 * eps)
        an = jnp.sum(grad * v)
        np.testing.assert_allclose(
            float(an), float(fd), rtol=5e-2, atol=5e-4
        )

    # input gradient
    fd_check(x, g_x, lambda xv: (params, xv))

    # a parameter from each part of the chain
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = {jax.tree_util.keystr(kp): kp for kp, _ in flat}
    from functools import reduce

    def get(p, kp):
        return reduce(lambda t, e: t[e.key], kp, p)

    def set_(p, kp, val):
        return jax.tree_util.tree_map_with_path(
            lambda kpp, a: val if kpp == kp else a, p
        )

    # one weight from each chain segment (attention in, attention out, MLP):
    # FD evals are full interpret-mode forwards, so keep the set small
    checked = 0
    for name, kp in paths.items():
        if any(t in name for t in ("'q'", "'proj'", "'fc2'")):
            if "kernel" not in name:
                continue
            val = get(params, kp)
            grad = get(g_params, kp)
            fd_check(
                val, grad,
                lambda v, kp=kp: (set_(params, kp, v), x),
            )
            checked += 1
    assert checked >= 3, f"only {checked} params checked: {list(paths)}"


# ------------------------------------------------------- fused block kernel


def _fused_block_apply(rates, key, *, deterministic=False, cross=False, shift=False):
    """BasicBlock pallas_block-interpret forward (NHWC fused block kernel)."""
    rng = np.random.default_rng(4)
    s, b, c, heads, d = 2, 1, 24, 4, 6
    x = jnp.asarray(rng.random((s, b, 14, 14, c), np.float32))
    blk = BasicBlock(
        streams=s, dims=c, num_heads=heads, dims_per_head=d,
        window_size=(7, 7), shift=shift, cross=cross, mlp_hidden_dims=4 * c,
        attention_drop_ratio=rates[0], proj_drop_ratio=rates[1],
        mlp_drop_ratio=rates[2], impl="pallas_block_interpret",
    )
    params = blk.init(jax.random.PRNGKey(1), x)
    rngs = {"dropout": key} if not deterministic else None
    out = blk.apply(params, x, deterministic=deterministic, rngs=rngs)
    return np.asarray(out), (blk, params, x)


def test_fused_block_dropout_deterministic_and_eval():
    k = jax.random.PRNGKey(13)
    a, _ = _fused_block_apply((0.2, 0.2, 0.2), k)
    b, _ = _fused_block_apply((0.2, 0.2, 0.2), k)
    c_, _ = _fused_block_apply((0.2, 0.2, 0.2), jax.random.PRNGKey(14))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c_).max() > 1e-5
    ev, _ = _fused_block_apply((0.3, 0.3, 0.3), None, deterministic=True)
    e0, _ = _fused_block_apply((0.0, 0.0, 0.0), None, deterministic=True)
    np.testing.assert_array_equal(ev, e0)


def test_fused_block_matches_jnp_composition_without_dropout():
    """With zero rates the dropout-capable kernel is exactly the old kernel path."""
    base, (blk, params, x) = _fused_block_apply((0.0, 0.0, 0.0), None,
                                                deterministic=True, shift=True)
    ref = blk.copy(impl="jnp").apply(params, x, deterministic=True)
    np.testing.assert_allclose(base, np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.slow
def test_fused_block_dropout_grad_finite_difference(cross):
    """Central FD vs the custom VJP with all three dropout sites active: the
    backward (on its finer tile grid) must regenerate the forward's exact masks
    and apply them at the right points of the chain."""
    rates = (0.25, 0.25, 0.25)
    key = jax.random.PRNGKey(19)
    _, (blk, params, x) = _fused_block_apply(rates, key, cross=cross, shift=True)

    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal(x.shape).astype(np.float32)
    )

    def loss(p, xv):
        out = blk.apply(p, xv, deterministic=False, rngs={"dropout": key})
        return jnp.mean(out * cot)

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)

    rngd = np.random.default_rng(23)
    # eps=1e-2 leaves ~6% curvature (truncation) error on this block's input
    # gradient (measured on the jnp path too); 3e-3 converges to ~1%
    eps = 3e-3

    def fd_dir(value, grad, rebuild):
        v = jnp.asarray(rngd.standard_normal(np.shape(value)).astype(np.float32))
        fp = loss(*rebuild(value + eps * v))
        fm = loss(*rebuild(value - eps * v))
        fd = float((fp - fm) / (2 * eps))
        an = float(jnp.sum(grad * v))
        np.testing.assert_allclose(an, fd, rtol=5e-2, atol=5e-4)

    fd_dir(x, g_x, lambda xv: (params, xv))

    from functools import reduce

    def set_leaf(p, kp, val):
        return jax.tree_util.tree_map_with_path(
            lambda kpp, a: val if kpp == kp else a, p
        )

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    checked = 0
    for kp, val in flat:
        name = jax.tree_util.keystr(kp)
        # one weight per chain segment: v (through the attn-dropped weights),
        # proj (through the proj drop), fc1/fc2 (around the two MLP drops)
        if any(t in name for t in ("'v'", "'proj'", "'fc1'", "'fc2'")):
            if "kernel" not in name:
                continue
            grad = reduce(lambda t, e: t[e.key], kp, g_params)
            fd_dir(val, grad, lambda vv, kp=kp: (set_leaf(params, kp, vv), x))
            checked += 1
    assert checked >= 4


# ------------------------------------------- NHWC attention kernel (deep stages)


def _nhwc_attn_apply(rate, key, *, deterministic=False, cross=False, shift=False):
    """DualWindowAttention pallas-interpret with in-kernel attention dropout."""
    rng = np.random.default_rng(2)
    s, b, c, heads, d = 2, 1, 24, 4, 6
    x = jnp.asarray(rng.random((s, b, 14, 14, c), np.float32))
    mod = DualWindowAttention(
        streams=s, dims=c, num_heads=heads, dims_per_head=d, window_size=(7, 7),
        shift=shift, cross=cross, attention_drop_ratio=rate,
        impl="pallas_interpret",
    )
    params = mod.init(jax.random.PRNGKey(1), x)
    rngs = {"dropout": key} if not deterministic else None
    out = mod.apply(params, x, deterministic=deterministic, rngs=rngs)
    return np.asarray(out), (mod, params, x)


def test_nhwc_attn_dropout_deterministic_and_eval():
    k = jax.random.PRNGKey(8)
    a, _ = _nhwc_attn_apply(0.3, k)
    b, _ = _nhwc_attn_apply(0.3, k)
    c_, _ = _nhwc_attn_apply(0.3, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c_).max() > 1e-5
    ev, _ = _nhwc_attn_apply(0.3, None, deterministic=True)
    e0, _ = _nhwc_attn_apply(0.0, None, deterministic=True)
    np.testing.assert_array_equal(ev, e0)


@pytest.mark.parametrize("cross", [False, True])
@pytest.mark.slow
def test_nhwc_attn_dropout_grad_finite_difference(cross):
    """FD vs custom VJP with attention dropout on — the backward's finer tile grid
    must regenerate the forward's masks."""
    key = jax.random.PRNGKey(21)
    _, (mod, params, x) = _nhwc_attn_apply(0.3, key, cross=cross, shift=True)
    cot = jnp.asarray(
        np.random.default_rng(6).standard_normal(x.shape).astype(np.float32)
    )

    def loss(p, xv):
        out = mod.apply(p, xv, deterministic=False, rngs={"dropout": key})
        return jnp.mean(out * cot)

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, x)

    rngd = np.random.default_rng(18)
    eps = 1e-2

    def fd_dir(value, grad, rebuild):
        v = jnp.asarray(rngd.standard_normal(np.shape(value)).astype(np.float32))
        fp = loss(*rebuild(value + eps * v))
        fm = loss(*rebuild(value - eps * v))
        fd = float((fp - fm) / (2 * eps))
        an = float(jnp.sum(grad * v))
        np.testing.assert_allclose(an, fd, rtol=5e-2, atol=5e-4)

    fd_dir(x, g_x, lambda xv: (params, xv))

    def set_leaf(p, kp, val):
        return jax.tree_util.tree_map_with_path(
            lambda kpp, a: val if kpp == kp else a, p
        )

    from functools import reduce

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    checked = 0
    for kp, val in flat:
        name = jax.tree_util.keystr(kp)
        # v (feeds AV through the dropped weights), proj (downstream), bias
        # (upstream through softmax) cover the three distinct mask positions
        if any(t in name for t in ("'v'", "'proj'", "bias_table")):
            if "bias')" in name:  # skip the per-stream linear biases
                continue
            grad = reduce(lambda t, e: t[e.key], kp, g_params)
            fd_dir(val, grad, lambda vv, kp=kp: (set_leaf(params, kp, vv), x))
            checked += 1
    assert checked >= 3


# ---------------------------------------------------------------- module level


def test_block_train_vs_eval_differ_and_shapes():
    k = jax.random.PRNGKey(0)
    train_out, _ = _packed_apply((0.1, 0.1, 0.1), k, shift=True)
    eval_out, _ = _packed_apply((0.1, 0.1, 0.1), None, deterministic=True,
                                shift=True)
    assert train_out.shape == eval_out.shape
    assert np.abs(train_out - eval_out).max() > 1e-5
