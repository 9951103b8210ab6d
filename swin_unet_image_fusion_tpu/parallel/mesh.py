"""Device mesh and sharding helpers.

Parallelism is net-new capability versus the single-device reference (SURVEY.md §2:
zero distributed code, ``A000_CONFIG.py:6`` selects one device). The TPU-native design:

- **Data parallel** over ICI: a 1-D ``Mesh('data')``; the batch axis of every input is
  sharded, parameters and optimiser state are replicated, and XLA GSPMD inserts the
  gradient ``psum`` automatically when the train step is jitted with these shardings —
  the TPU-native equivalent of NCCL all-reduce, no hand-written collectives needed.
- **Spatial parallel** (high-res tiled fusion): H-axis sharding with ppermute halo
  exchange, see ``parallel/spatial.py``.

Multi-host slices would add a DCN axis via ``jax.distributed.initialize``; the mesh
helpers below are agnostic to it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(num_devices: int = 0, axis_name: str = "data", devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> int:
    """Multi-host (DCN) wiring: call once per process before building meshes.

    Joins the slice via ``jax.distributed.initialize`` when the coordinator env vars
    are set: JAX_COORDINATOR_ADDRESS, plus JAX_NUM_PROCESSES / JAX_PROCESS_ID outside
    environments JAX auto-detects (SLURM, TPU pods, k8s). Must run before the first
    backend use — querying ``jax.devices()``/``process_count()`` first would
    initialize a single-process backend. No-op on a single host / when already
    initialized. Returns the process index.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        from jax._src import distributed as _distributed

        already = getattr(_distributed.global_state, "client", None) is not None
        if not already:
            try:
                jax.distributed.initialize(
                    coordinator_address=addr,
                    num_processes=int(nproc) if nproc else None,
                    process_id=int(pid) if pid else None,
                )
            except RuntimeError as e:
                # Only tolerate double-initialization (e.g. by the launcher); a
                # genuinely failed init (bad coordinator address, timeout) must fail
                # loudly — silently degrading to independent single-process training
                # with disjoint data shards and a shared checkpoint dir corrupts runs.
                if "already initialized" not in str(e).lower():
                    raise
        if nproc is not None and jax.process_count() != int(nproc):
            raise RuntimeError(
                f"jax.distributed came up with process_count={jax.process_count()} "
                f"but JAX_NUM_PROCESSES={nproc}"
            )
    return jax.process_index()


def process_local_shard(indices, *, process_index: int | None = None, process_count: int | None = None):
    """Split a dataset index list across hosts (each host feeds its local devices).

    Every host's shard is trimmed to the common length ``len(indices) // pc``:
    strided slicing alone gives hosts lengths that differ by one when
    ``len(indices) % pc != 0``, and since each host iterates its own loader in the
    collective train/eval loops, a ragged shard would make hosts run different
    numbers of collective steps (global-array assembly + DP reduce) and deadlock the
    slice at epoch end.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    common = len(indices) // pc
    return indices[pi::pc][:common]
