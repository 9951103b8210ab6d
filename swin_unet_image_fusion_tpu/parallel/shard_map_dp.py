"""Explicit shard_map data-parallel train step (psum gradients over ICI).

Two equivalent DP implementations exist in this framework:

- the default (``train.py``): jit with batch-sharded inputs; XLA GSPMD derives the
  gradient all-reduce automatically;
- this module: ``jax.shard_map`` with an explicit ``jax.lax.psum`` of gradients and
  loss terms over the 'data' axis — the hand-written collective layout (SURVEY.md §2's
  "DP over ICI ... gradients reduced with jax.lax.psum"). Useful when the collective
  schedule must be pinned down (or extended, e.g. gradient compression) rather than
  left to GSPMD.

Per-shard semantics note: each device computes the mean loss over its local shard;
``psum / axis_size`` then equals the global-batch mean, so gradients match the
single-device step exactly (verified in tests/test_shard_map_dp.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config
from ..losses import total_fusion_loss
from ..models.unet import SwinFusionUNet


def make_shard_map_train_step(
    cfg: Config, mesh: Mesh, axis: str = "data", return_grads: bool = False
):
    """Returns step(state, ir, vis) -> (state, terms) with explicit psum collectives.

    With ``return_grads`` the step also returns the psum-averaged global gradients
    (step -> (state, terms, grads)) — used by the DP-equality tests to compare
    gradients directly at tight tolerance, where post-Adam parameters cannot be
    (Adam normalises near-zero gradients to lr-sized noise).
    """
    import dataclasses

    # cross-device BatchNorm statistics: give the BN layer the mesh axis name so its
    # batch moments psum over the global batch (exactly like the single-device step)
    model_cfg = dataclasses.replace(cfg.model, bn_axis_name=axis)
    model = SwinFusionUNet(model_cfg)
    loss_cfg = cfg.loss

    def local_loss(params, batch_stats, ir, vis):
        fusion, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            ir,
            vis,
            train=True,
            mutable=["batch_stats"],
        )
        fusion = jnp.clip(fusion, 0.0, 1.0)
        total, terms = total_fusion_loss(loss_cfg, fusion, ir, vis)
        return total, (terms, mutated["batch_stats"])

    def per_shard(state, ir, vis):
        (_, (terms, new_stats)), grads = jax.value_and_grad(
            local_loss, has_aux=True
        )(state.params, state.batch_stats, ir, vis)

        # explicit ICI collectives: average grads/terms over the data axis
        inv = 1.0 / jax.lax.axis_size(axis)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis) * inv, grads)
        terms = jax.tree.map(lambda t: jax.lax.psum(t, axis) * inv, terms)
        # BatchNorm running stats: average the per-shard updates
        new_stats = jax.tree.map(lambda s: jax.lax.psum(s, axis) * inv, new_stats)

        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        if return_grads:
            return new_state, terms, grads
        return new_state, terms

    state_spec = P()  # replicated
    data_spec = P(axis)  # batch sharded

    step = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(state_spec, data_spec, data_spec),
        out_specs=(state_spec, state_spec, state_spec) if return_grads else (state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(step)
