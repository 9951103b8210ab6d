"""Training driver: jitted train step, validation, TensorBoard, Orbax checkpoint/resume.

Feature-parity re-design of the reference trainer (``/root/reference/a016_train.py``):

- resume-capable epoch loop with inline validation every N iters (a016:91-107, 136-196)
- Adam + per-iteration cosine-warm-restart LR (exact curve parity, see ``optim.py``)
- the model output is clamped to [0, 1] *before* the loss — the gradient-zeroing
  outside the range is part of the reference's training dynamics (a016:153)
- TensorBoard scalars for all loss terms + LR each iteration (a016:119-134), but
  fetched asynchronously — the reference's per-term ``.item()`` device sync every step
  (a008_loss.py:274-275) is deliberately *not* preserved (SURVEY.md §7 quirks)
- windowed mean losses printed every ``print_training_info_in_iters`` (a016:170-180)
- validation image grids saved as PNGs (a016:252-304)
- checkpoints: Orbax ``{params, opt_state, batch_stats, epoch, step}`` with the
  reference's ``{MM.DD.HH.MM}_epoch{N}`` naming and same save cadence (a016:238-250);
  resume restores everything and continues at epoch+1 (a016:306-339)

Parallelism (net-new vs the reference): the train step is jitted over a 1-D data mesh;
inputs are batch-sharded, parameters replicated, XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from .config import Config
from .data.dataset import BatchLoader, FusionPairDataset, device_prefetch, split_train_val
from .losses import total_fusion_loss
from .models.unet import SwinFusionUNet
from .optim import cosine_warm_restarts_schedule, make_optimizer
from .parallel.mesh import (
    data_mesh,
    data_sharding,
    maybe_initialize_distributed,
    process_local_shard,
    replicated_sharding,
)
from .utils.meters import LossMeter
from .utils.term import cyan, yellow


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def get_time_str() -> str:
    return datetime.now().strftime("%m.%d.%H.%M")


def create_train_state(
    cfg: Config, rng_key, iters_per_epoch: int, sample_hw=(224, 224)
) -> TrainState:
    model = SwinFusionUNet(cfg.model)
    dummy = jnp.zeros((1, *sample_hw, 1), jnp.float32)
    # jit the init: eager init dispatches op-by-op (minutes through a TPU tunnel)
    variables = jax.jit(model.init)(rng_key, dummy, dummy)
    tx = make_optimizer(cfg.optim, iters_per_epoch)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def make_train_step(cfg: Config, donate: bool = True):
    """Build the jitted train step: forward, clamp, loss, grad, Adam update, BN stats."""

    model = SwinFusionUNet(cfg.model)
    loss_cfg = cfg.loss
    has_dropout = bool(
        cfg.model.attention_drop_ratio
        or cfg.model.linear_after_att_drop_ratio
        or cfg.model.mlp_drop_ratio
    )

    def step(state: TrainState, ir: jnp.ndarray, vis: jnp.ndarray):
        # per-step dropout rng (only when a ratio is nonzero, so the default
        # config's jaxpr / compile cache are unchanged)
        rngs = (
            {"dropout": jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)}
            if has_dropout else None
        )

        def loss_fn(params):
            fusion, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                ir,
                vis,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            fusion = jnp.clip(fusion, 0.0, 1.0)  # before the loss — a016_train.py:153
            total, terms = total_fusion_loss(loss_cfg, fusion, ir, vis)
            return total, (terms, mutated["batch_stats"])

        (_, (terms, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(batch_stats=new_stats)
        return new_state, terms

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Config):
    model = SwinFusionUNet(cfg.model)
    loss_cfg = cfg.loss

    @jax.jit
    def step(state: TrainState, ir: jnp.ndarray, vis: jnp.ndarray):
        fusion = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ir,
            vis,
            train=False,
        )
        fusion = jnp.clip(fusion, 0.0, 1.0)
        _, terms = total_fusion_loss(loss_cfg, fusion, ir, vis)
        return fusion, terms

    return step


class Trainer:
    """The complete training workload (reference ``MyTraining``)."""

    def __init__(self, cfg: Config, use_mesh: bool = True):
        self.cfg = cfg

        # multi-host (DCN) wiring: no-op on a single host, otherwise joins the slice
        # before any mesh is built so jax.devices() sees every chip
        maybe_initialize_distributed()
        n_proc = jax.process_count()

        # data-parallel mesh decided first: the global batch must shard evenly
        self.mesh = data_mesh(cfg.parallel.num_data, cfg.parallel.data_axis) if use_mesh else None
        n_dev = self.mesh.size if self.mesh is not None else 1
        batch_size = cfg.optim.batch_size
        divisor = max(n_dev, n_proc)
        if divisor > 1 and batch_size % divisor:
            adjusted = max(divisor, (batch_size // divisor) * divisor)
            print(
                yellow(
                    f"batch_size {batch_size} does not divide the {n_dev}-device data "
                    f"mesh ({n_proc} hosts); using {adjusted}"
                )
            )
            batch_size = adjusted
        self.batch_size = batch_size

        # data (reference a016_train.py:45-63)
        self.dataset = FusionPairDataset(
            is_test=False, dataset_folder=cfg.data.training_dataset_folder, cfg=cfg.data,
            seed=cfg.seed,
        )
        tr_idx, val_idx = split_train_val(
            len(self.dataset), cfg.optim.training_set_ratio, seed=cfg.seed
        )
        # multi-host: each process loads only its shard of the index lists and a
        # per-host slice of the global batch; device_prefetch reassembles the global
        # array (jax.make_array_from_process_local_data)
        local_batch = batch_size // n_proc
        if n_proc > 1:
            tr_idx = process_local_shard(tr_idx)
            val_idx = process_local_shard(val_idx)
        self.train_loader = BatchLoader(
            self.dataset, tr_idx, local_batch, shuffle=True,
            drop_last=cfg.optim.drop_last, seed=cfg.seed + jax.process_index(),
        )
        self.val_loader = BatchLoader(
            self.dataset, val_idx, local_batch, shuffle=True,
            drop_last=cfg.optim.drop_last, seed=cfg.seed + 1 + jax.process_index(),
        )
        self.iters_per_epoch = max(len(self.train_loader), 1)

        # model/optimizer state
        self.state = create_train_state(
            cfg, jax.random.PRNGKey(cfg.seed), self.iters_per_epoch, cfg.data.crop_size
        )

        # data-parallel sharding: batch sharded, state replicated (SURVEY.md §2)
        if self.mesh is not None and self.mesh.size > 1:
            self.batch_sharding = data_sharding(self.mesh, cfg.parallel.data_axis)
            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        else:
            self.batch_sharding = None

        if cfg.parallel.use_shard_map and self.mesh is not None and self.mesh.size > 1:
            from .parallel.shard_map_dp import make_shard_map_train_step

            self.train_step = make_shard_map_train_step(
                cfg, self.mesh, cfg.parallel.data_axis
            )
        else:
            self.train_step = make_train_step(cfg)
        self.eval_step = make_eval_step(cfg)

        self.schedule = cosine_warm_restarts_schedule(
            cfg.optim.lr, cfg.optim.minimum_lr, cfg.optim.scheduler_t0, self.iters_per_epoch
        )

        # loss meters (reference keeps two MyLoss instances for the recorders)
        self.train_meter = LossMeter()
        self.val_meter = LossMeter()

        # logging — host-side artifacts (TB, PNGs, checkpoints) only on process 0
        self.is_main_process = jax.process_index() == 0
        self.current_epoch = 1
        self.iter_in_epoch = 1
        self.writer = self._make_writer() if self.is_main_process else None
        self._pending_logs = []  # (step, device term dict) fetched lazily

    # ----------------------------------------------------------------- logging
    def _make_writer(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            log_dir = self.cfg.log.tensorboard_log_dir or None
            return SummaryWriter(
                log_dir=log_dir, flush_secs=self.cfg.log.tensorboard_flush_interval_secs
            )
        except Exception as e:  # pragma: no cover - TB optional
            print(yellow(f"TensorBoard unavailable ({e}); scalar logging disabled"))
            return None

    @property
    def total_iters(self) -> int:
        return (self.current_epoch - 1) * self.iters_per_epoch + self.iter_in_epoch

    def _submit_scalars(self, step: int, terms: Dict[str, float], lr: float):
        if self.writer is None:
            return
        for key, value in terms.items():
            self.writer.add_scalar(f"training/{key}", value, global_step=step)
        self.writer.add_scalar("training/lr", lr, global_step=step)

    def _drain_logs(self, force: bool = False):
        """Fetch queued device term dicts without forcing a sync every step."""
        while self._pending_logs and (force or len(self._pending_logs) > 2):
            step, terms = self._pending_logs.pop(0)
            host_terms = {k: float(v) for k, v in terms.items()}
            self.train_meter.record(host_terms)
            self._submit_scalars(step, host_terms, float(self.schedule(step)))

    # ------------------------------------------------------------------ loops
    def start_train(self):
        cfg = self.cfg
        print(
            cyan(
                f"Starting at epoch = {self.current_epoch}, "
                f"lr = {float(self.schedule(self.total_iters - 1)):.3e}, "
                f"iters per epoch = {self.iters_per_epoch}, "
                f"devices = {self.mesh.size if self.mesh else 1}"
            )
        )
        try:
            from tqdm import tqdm

            epochs = tqdm(range(self.current_epoch, cfg.optim.epochs + 1), initial=1)
        except ImportError:  # pragma: no cover
            epochs = range(self.current_epoch, cfg.optim.epochs + 1)
        for epoch in epochs:
            self.current_epoch = epoch
            self.train_one_epoch_with_vali()
            if epoch % cfg.log.save_model_interval_in_epochs == 0:
                self.save_checkpoint()
        if self.writer is not None:
            self.writer.close()

    def train_one_epoch_with_vali(self):
        cfg = self.cfg
        # advance the per-item augmentation stream: same seed -> bit-identical
        # epochs across runs, fresh crops each epoch (a015_dataset.py:96-103 intent)
        self.dataset.set_epoch(self.current_epoch)
        batches = device_prefetch(
            iter(self.train_loader), depth=cfg.data.prefetch_depth,
            sharding=self.batch_sharding,
        )
        for i, batch in enumerate(batches, start=1):
            self.iter_in_epoch = i
            step = self.total_iters
            self.state, terms = self.train_step(self.state, batch["ir"], batch["vis"])
            self._pending_logs.append((step, terms))
            self._drain_logs()

            if step == 1 or step % cfg.log.print_training_info_in_iters == 0:
                self._drain_logs(force=True)
                means = self.train_meter.mean_and_clear()
                print(
                    f"Training: epoch={self.current_epoch} iter={i} total={step} "
                    f"loss={means}"
                )
            if step % cfg.log.vali_interval_in_iters == 0:
                print(cyan("Starting validation ..."))
                self.validate()
                means = self.val_meter.mean_and_clear()
                print(cyan(f"Vali: epoch={self.current_epoch} total={step} loss={means}"))
        self._drain_logs(force=True)

    def validate(self):
        if len(self.val_loader) == 0:
            # tiny dataset + drop_last can leave the 1% split with zero full batches
            print(
                yellow(
                    "validation skipped: val split has no full batch "
                    f"({len(self.val_loader.indices)} images, batch {self.batch_size}) — "
                    "lower training_set_ratio or batch_size to validate"
                )
            )
            return
        for i, batch in enumerate(
            device_prefetch(iter(self.val_loader), sharding=self.batch_sharding), start=1
        ):
            fusion, terms = self.eval_step(self.state, batch["ir"], batch["vis"])
            self.val_meter.record({k: float(v) for k, v in terms.items()})
            if i == 1 and self.is_main_process:
                # multi-host: only the locally-addressable shard is dumped to PNG;
                # sort shards by batch offset — iteration order is not guaranteed,
                # and the ir/vis/fusion rows must share one deterministic order
                to_host = (
                    (lambda a: np.concatenate([
                        np.asarray(s.data)
                        for s in sorted(
                            a.addressable_shards, key=lambda s: s.index[0].start or 0
                        )
                    ]))
                    if jax.process_count() > 1
                    else np.asarray
                )
                self.save_vali_grid(
                    to_host(batch["ir"]), to_host(batch["vis"]), to_host(fusion)
                )

    # ------------------------------------------------------------- artifacts
    def save_vali_grid(self, ir: np.ndarray, vis: np.ndarray, fusion: np.ndarray):
        """(ir | vis | fused) image grid PNG (reference a016_train.py:252-304)."""
        if not self.is_main_process:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt
            from mpl_toolkits.axes_grid1 import ImageGrid
        except Exception:  # pragma: no cover
            return
        os.makedirs(self.cfg.log.save_vali_results_to_folder, exist_ok=True)
        bsz = ir.shape[0]
        fig = plt.figure()
        grid = ImageGrid(fig, 111, nrows_ncols=(bsz, 3), axes_pad=0, share_all=True)
        for i in range(bsz):
            for j, img in enumerate((ir[i], vis[i], fusion[i])):
                ax = grid[i * 3 + j]
                ax.imshow(img.squeeze(-1), cmap="gray")
                ax.set_axis_off()
        fig.subplots_adjust(left=0, right=1, bottom=0, top=1, hspace=0, wspace=0)
        name = (
            f"{get_time_str()}_Epoch{self.current_epoch}_"
            f"EpIters{self.iter_in_epoch}_TotalIters{self.total_iters}.png"
        )
        path = os.path.join(self.cfg.log.save_vali_results_to_folder, name)
        # dpi parity with the reference grids (a016_train.py:298)
        fig.savefig(path, bbox_inches="tight", pad_inches=0, dpi=1024)
        plt.close(fig)
        print(cyan(f"Validation results saved to '{path}'"))

    # ----------------------------------------------------------- checkpointing
    def _synced_time_str(self) -> str:
        """Timestamp agreed across hosts (a minute boundary must not split the name)."""
        if jax.process_count() == 1:
            return get_time_str()
        from jax.experimental import multihost_utils

        local = np.frombuffer(get_time_str().encode(), np.uint8)  # fixed 11 bytes
        return bytes(np.asarray(multihost_utils.broadcast_one_to_all(local))).decode()

    def save_checkpoint(self):
        # Orbax saves are multihost-collective: EVERY process must call save() (the
        # primary host writes, the rest participate in its barriers) — guarding this
        # to process 0 deadlocks the slice.
        import orbax.checkpoint as ocp

        os.makedirs(self.cfg.log.save_model_to_folder, exist_ok=True)
        name = f"{self._synced_time_str()}_epoch{self.current_epoch}"
        path = os.path.abspath(os.path.join(self.cfg.log.save_model_to_folder, name))
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                path,
                {
                    "params": jax.device_get(self.state.params),
                    "opt_state": jax.device_get(self.state.opt_state),
                    "batch_stats": jax.device_get(self.state.batch_stats),
                    "step": int(self.state.step),
                    "epoch": self.current_epoch,
                },
            )
        if self.is_main_process:
            print(yellow(f"State saved to '{path}'"))
        return path

    def load_checkpoint(self, path: str):
        """Resume: restores params/opt_state/batch_stats/step, continues at epoch+1."""
        import orbax.checkpoint as ocp

        template = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "step": 0,
            "epoch": 0,
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), template)
        self.state = self.state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            batch_stats=restored["batch_stats"],
            step=restored["step"],
        )
        if self.mesh is not None and self.mesh.size > 1:
            self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        self.current_epoch = int(restored["epoch"]) + 1  # a016_train.py:336
        print(cyan(f"State loaded from '{path}', resuming at epoch {self.current_epoch}"))

    def load_torch_checkpoint(self, path: str):
        """Import a reference .pth (model weights only, like a017_test.py:50-54)."""
        from .models.torch_import import load_torch_checkpoint

        params, batch_stats, epoch = load_torch_checkpoint(path, self.cfg.model)
        self.state = self.state.replace(params=params, batch_stats=batch_stats)
        self.current_epoch = epoch + 1
        print(cyan(f"Torch state imported from '{path}'"))


def start_main(cfg: Optional[Config] = None):
    """Entry point (reference a016_train.py:393-397)."""
    from .config import config_from_cli

    cfg = cfg or config_from_cli()
    trainer = Trainer(cfg)
    if cfg.log.use_saved_state and cfg.log.using_state_path:
        if cfg.log.using_state_path.endswith(".pth"):
            trainer.load_torch_checkpoint(cfg.log.using_state_path)
        else:
            trainer.load_checkpoint(cfg.log.using_state_path)
    trainer.start_train()


if __name__ == "__main__":
    start_main()
