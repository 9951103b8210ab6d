"""Worker for tests/test_multihost.py: one simulated host in a 2-process CPU slice.

Exercises the real multi-host wiring (ROADMAP item): ``jax.distributed.initialize``
over a localhost coordinator, per-process local batch shards assembled into global
arrays by ``device_prefetch`` (``jax.make_array_from_process_local_data``), and a
jitted data-parallel gradient whose value must equal the single-process result.

Run: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_processes,
    process_id=process_id,
)

import jax.numpy as jnp
import numpy as np

from swin_unet_image_fusion_tpu.data.dataset import device_prefetch
from swin_unet_image_fusion_tpu.parallel.mesh import (
    data_mesh,
    data_sharding,
    process_local_shard,
)

assert jax.process_count() == num_processes

mesh = data_mesh()
sharding = data_sharding(mesh)
n_global = mesh.size  # 8 devices across 2 processes

# deterministic global batch; each host feeds only its contiguous shard
rng = np.random.default_rng(0)
global_ir = rng.random((n_global, 8, 8, 1), np.float32)
global_vis = rng.random((n_global, 8, 8, 1), np.float32)
lo = process_id * (n_global // num_processes)
hi = lo + n_global // num_processes
local = {"ir": global_ir[lo:hi], "vis": global_vis[lo:hi], "ir_path": ["p"]}

batches = list(device_prefetch(iter([local]), sharding=sharding))
assert len(batches) == 1
batch = batches[0]
assert batch["ir"].shape == (n_global, 8, 8, 1), batch["ir"].shape

w = jnp.asarray(rng.random((1,), np.float32))


@jax.jit
def grad_step(w, ir, vis):
    def loss(w):
        return jnp.mean((w * ir - vis) ** 2)

    return jax.grad(loss)(w)


g = np.asarray(jax.device_get(grad_step(w, batch["ir"], batch["vis"])))

# single-process reference value on the full global batch
g_ref = 2.0 * np.mean((np.asarray(w) * global_ir - global_vis) * global_ir)
assert abs(float(g[0]) - float(g_ref)) < 1e-5, (float(g[0]), float(g_ref))

# index sharding helper: shards must partition the index set
idx = np.arange(10)
mine = process_local_shard(idx)
assert len(mine) in (5,), len(mine)

# ragged case: len(indices) % process_count != 0 — every host must still see the
# SAME shard length, or hosts run different numbers of collective steps and the
# slice deadlocks at epoch end (ADVICE round 1)
for n in (9, 11, 13):
    ragged = process_local_shard(np.arange(n))
    assert len(ragged) == n // num_processes, (n, len(ragged))

print(f"MULTIHOST_OK proc={process_id} grad={float(g[0]):.6f}")
