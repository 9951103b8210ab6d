"""Trained-quality comparison: reference torch training (CPU) vs this framework.

Answers "does training HERE produce models as good as training THERE?" — forward
and k-step dynamics parity are proven elsewhere (tests/test_model_parity.py,
tests/test_training_dynamics.py); this runs both frameworks' *actual training
drivers* for the same number of steps from the *same initial weights* on the same
realistic dataset (tools/make_synth_dataset.py), then scores both trained models
through the same inference engine + metric suite (tools/evaluate.py).

The torch side replicates ``/root/reference/a016_train.py`` faithfully: MyDataset
augmentation (RandomResizedCrop(224)+HFlip, a015_dataset.py:61-66), kaiming
``init_params`` (a016_train.py:382-390), Adam + CosineAnnealingWarmRestarts with
the fractional per-iter step (a016_train.py:109-113), ``clamp_`` before MyLoss
(a016_train.py:153), ``drop_last`` loaders. The loss runs on the kornia ground
truth in tests/kornia_ref.py (golden-tested; kornia itself is not installed).

Usage:
    python tools/trained_quality.py torch --data /tmp/synth_vif/train --out /tmp/tq \
        [--epochs 3] [--batch 4]
    python tools/trained_quality.py jax   --data /tmp/synth_vif/train --out /tmp/tq \
        [--epochs 3] [--batch 4] [--cpu]
    python tools/evaluate.py /tmp/synth_vif/test --checkpoint /tmp/tq/torch_final.pth
    python tools/evaluate.py /tmp/synth_vif/test --checkpoint /tmp/tq/jax_final_epochN
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def run_torch(args):
    from reference_loader import load_reference, reference_model

    load_reference()
    import torch
    from torch.optim.lr_scheduler import CosineAnnealingWarmRestarts

    from a008_loss import MyLoss  # noqa: E402

    from swin_unet_image_fusion_tpu.config import DataConfig, ModelConfig
    from swin_unet_image_fusion_tpu.data.dataset import (
        BatchLoader, FusionPairDataset, split_train_val,
    )

    # a016_train.py:382-390 (a016 itself imports torchvision, absent here)
    from torch import nn
    from torch.nn import init

    def init_params(m):
        if isinstance(m, (nn.Linear, nn.Conv2d)):
            init.kaiming_normal_(m.weight)
            if m.bias is not None:
                init.zeros_(m.bias)

    torch.manual_seed(args.seed)
    model = reference_model(ModelConfig(), seed=args.seed)
    model.apply(init_params)  # a016_train.py:42
    os.makedirs(args.out, exist_ok=True)
    init_path = os.path.join(args.out, "initial.pth")
    torch.save({"model_state": model.state_dict(), "current_epoch": 0}, init_path)
    print(f"initial weights -> {init_path}")

    # torchvision is not installed in this image, so the reference MyDataset cannot
    # be imported; both sides share this repo's pipeline instead (same aug semantics
    # as a015_dataset.py:61-66, parity-tested in tests/test_data.py), which also
    # removes augmentation-implementation noise from the quality comparison.
    dataset = FusionPairDataset(
        is_test=False, dataset_folder=args.data,
        cfg=DataConfig(training_dataset_folder=args.data, crop_size=(224, 224)),
        seed=args.seed,
    )
    tr_idx, _ = split_train_val(len(dataset), args.train_ratio, seed=args.seed)
    tr_dtl = BatchLoader(dataset, tr_idx, batch_size=args.batch,
                         shuffle=True, drop_last=True, seed=args.seed)

    opt = torch.optim.Adam(model.parameters(), lr=args.lr)
    sched = CosineAnnealingWarmRestarts(opt, T_0=args.t0, eta_min=args.min_lr)
    my_loss = MyLoss()
    model.train()
    n = len(tr_dtl)
    for epoch in range(1, args.epochs + 1):
        for i, batch in enumerate(tr_dtl, start=1):
            # NHWC float numpy -> NCHW torch
            ir = torch.from_numpy(batch["ir"].transpose(0, 3, 1, 2).copy())
            vis = torch.from_numpy(batch["vis"].transpose(0, 3, 1, 2).copy())
            fusion = model(ir, vis)
            fusion = torch.clamp_(fusion, 0, 1)  # a016_train.py:153
            loss, _ = my_loss.calcu_total_loss(fusion, ir, vis)
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step(epoch - 1 + (i - 1) / n)  # a016_train.py:109-113
            print(f"torch epoch {epoch} iter {i}/{n} loss {float(loss):.5f} "
                  f"lr {sched.get_last_lr()[0]:.5f}", flush=True)
    final_path = os.path.join(args.out, "torch_final.pth")
    torch.save({"model_state": model.state_dict(), "current_epoch": args.epochs}, final_path)
    print(f"trained weights -> {final_path}")


def run_jax(args):
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from swin_unet_image_fusion_tpu.config import (
        Config, DataConfig, LogConfig, ModelConfig, OptimConfig,
    )
    from swin_unet_image_fusion_tpu.train import start_main

    cfg = Config(
        seed=args.seed,
        model=ModelConfig(
            compute_dtype=args.dtype,
            attention_impl="jnp" if args.cpu else "auto",
        ),
        optim=OptimConfig(
            lr=args.lr, minimum_lr=args.min_lr, scheduler_t0=args.t0,
            batch_size=args.batch, epochs=args.epochs,
            training_set_ratio=args.train_ratio, drop_last=True,
            grad_clip_norm=args.clip,
            skip_nonfinite_updates=args.skip_nonfinite,
        ),
        data=DataConfig(training_dataset_folder=args.data, crop_size=(224, 224)),
        log=LogConfig(
            use_saved_state=True,
            using_state_path=os.path.join(args.out, "initial.pth"),
            save_model_to_folder=os.path.join(args.out, "jax_models"),
            save_vali_results_to_folder=os.path.join(args.out, "jax_vali"),
            tensorboard_log_dir=os.path.join(args.out, "jax_tb"),
            print_training_info_in_iters=1,
            vali_interval_in_iters=10**9,  # vali off: quality is scored on the test set
            save_model_interval_in_epochs=args.save_every or args.epochs,
        ),
    )
    start_main(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("side", choices=["torch", "jax"])
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--min-lr", type=float, default=1e-5)
    ap.add_argument("--t0", type=int, default=20)
    ap.add_argument("--train-ratio", type=float, default=0.875)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--cpu", action="store_true")
    # per-epoch checkpoints (0 = final only) — the reference's own blowup
    # mitigation is saving every epoch (a016_train.py:104-105, SAVE_MODEL_INTERVAL)
    ap.add_argument("--save-every", type=int, default=0)
    # opt-in stability guards (optim.py::make_optimizer; OFF = reference parity)
    ap.add_argument("--clip", type=float, default=0.0)
    ap.add_argument("--skip-nonfinite", action="store_true")
    args = ap.parse_args()
    (run_torch if args.side == "torch" else run_jax)(args)


if __name__ == "__main__":
    main()
