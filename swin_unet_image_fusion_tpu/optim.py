"""Optimiser and LR schedule (optax) with exact reference parity.

The reference uses Adam (torch defaults) and ``CosineAnnealingWarmRestarts(T_0=20,
eta_min=1e-5)`` stepped *every iteration* with a fractional epoch
(``/root/reference/a016_train.py:67-72,109-113``). Because the reference calls
``scheduler.step`` *after* ``optimizer.step``, update ``n`` (0-based) runs with the LR
computed from fractional epoch ``max(0, n-1) / iters_per_epoch`` — an off-by-one we
reproduce so the LR curve matches sample-for-sample (SURVEY.md §7 "quirks").
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from .config import OptimConfig


def cosine_warm_restarts_schedule(
    base_lr: float, eta_min: float, t0_epochs: int, iters_per_epoch: int
):
    """optax schedule matching torch CosineAnnealingWarmRestarts w/ per-iter stepping.

    torch (T_mult=1): lr(t) = eta_min + (base-eta_min) * (1 + cos(pi * (t mod T0)/T0))/2
    where t is the fractional epoch passed to ``scheduler.step``.
    """

    def schedule(count):
        # reference stepping: update n uses t = max(0, n-1)/iters_per_epoch
        n = jnp.maximum(count - 1, 0)
        t = n / iters_per_epoch
        t_cur = jnp.mod(t, t0_epochs)
        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_cur / t0_epochs)
        ) / 2.0

    return schedule


def make_optimizer(cfg: OptimConfig, iters_per_epoch: int) -> optax.GradientTransformation:
    """Adam (torch-default betas/eps) with the reference's restart schedule.

    Two opt-in stability guards, both OFF by default for reference parity (the
    reference's lr=1e-2 recipe sits at a stability edge — docs/BENCHMARKS.md
    "trained-quality part 2"; a 20-epoch run blew up at epoch 17 without them):

    - ``grad_clip_norm > 0`` prepends ``optax.clip_by_global_norm``;
    - ``skip_nonfinite_updates`` wraps the chain in ``optax.apply_if_finite`` so a
      NaN/Inf gradient step is skipped (params/opt state untouched) instead of
      poisoning the parameters; training continues from the same state.
    """
    schedule = cosine_warm_restarts_schedule(
        cfg.lr, cfg.minimum_lr, cfg.scheduler_t0, iters_per_epoch
    )
    parts = []
    if cfg.grad_clip_norm > 0.0:
        parts.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    parts += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),  # includes the -1 sign flip
    ]
    tx = optax.chain(*parts)
    if cfg.skip_nonfinite_updates:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx
