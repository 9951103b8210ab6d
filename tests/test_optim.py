"""LR schedule parity with torch CosineAnnealingWarmRestarts stepped per-iteration."""

import numpy as np

from swin_unet_image_fusion_tpu.optim import cosine_warm_restarts_schedule


def test_lr_curve_matches_torch_reference_stepping():
    """Reproduce the reference loop (a016_train.py:109-113, 163-167): optimizer.step()
    then scheduler.step(epoch-1 + (i-1)/len). The LR used by update n must match."""
    import torch
    from torch.optim.lr_scheduler import CosineAnnealingWarmRestarts

    base_lr, eta_min, t0, ipe, epochs = 1e-2, 1e-5, 20, 7, 45

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    sch = CosineAnnealingWarmRestarts(opt, T_0=t0, eta_min=eta_min)

    torch_lrs = []
    for epoch in range(1, epochs + 1):
        for i in range(1, ipe + 1):
            torch_lrs.append(opt.param_groups[0]["lr"])  # lr in effect for this update
            sch.step(epoch - 1 + (i - 1) / ipe)

    schedule = cosine_warm_restarts_schedule(base_lr, eta_min, t0, ipe)
    ours = [float(schedule(n)) for n in range(len(torch_lrs))]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-6, atol=1e-9)


def test_lr_restarts():
    schedule = cosine_warm_restarts_schedule(1e-2, 1e-5, 20, 10)
    # near the end of a 20-epoch period the LR approaches eta_min, then restarts
    end = float(schedule(200))  # t=(200-1)/10=19.9 -> near min
    new = float(schedule(202))  # t=20.1 mod 20 = 0.1 -> near max again
    assert end < 1e-3
    assert new > 9e-3
