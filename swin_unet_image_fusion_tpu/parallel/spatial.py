"""In-model spatial (H-axis) sharding for exact multi-chip single-image fusion.

Complement to the overlap-tiled path (``tiled.py``): instead of approximating borders,
the image's H axis is sharded across the mesh and the model runs under GSPMD, which
inserts the halo exchanges itself — collective-permutes for the cyclic roll
(``torch.roll`` semantics wrap around the global image, reference
a001_WindowAttention.py:442-444), neighbour exchanges for the window re-partitions, and
all-gathers where a stage's padded resolution stops dividing evenly. This is the
idiomatic JAX realisation of SURVEY.md §5's "spatial sharding + ppermute halo exchange":
we annotate shardings, XLA derives the collectives.

Supported attention impls:

- ``jnp``: the pure-XLA composition — GSPMD shards every op natively.
- ``pallas_pack`` / ``pallas_pack_interpret``: the PRODUCTION packed kernels, made
  GSPMD-partitionable by ``ops/pallas_pack_spmd.py`` — the fused block kernel runs
  per row shard (window attention is strip-row-local; per-row masks ride along as a
  sharded operand) and the standalone re-partition kernel exchanges its one-strip-row
  halo with an explicit ``jax.lax.ppermute`` (ring permute in wrap/roll mode). Stages
  the kernels don't cover (deep NHWC maps) fall back to the jnp composition under
  :func:`~..ops.pallas_pack_spmd.spatial_partitioning`, so nothing in the forward is
  GSPMD-opaque. A stage whose strip-row count does not divide the mesh falls back to
  a replicated lowering for that kernel only (still exact, just unscaled there).
- ``pallas`` / ``pallas_block`` (NHWC kernels): REJECTED loudly — those kernels have
  no partitioned lowering, and GSPMD would silently replicate/all-gather the sharded
  activations around every kernel call, defeating the memory purpose of spatial
  sharding at exactly the huge-H sizes it exists for.

Exactness: verified equal to the single-device forward within fp32 reduction noise
for BOTH the jnp and the packed-kernel paths (tests/test_spatial_sharding.py). Use
tiled fusion when throughput matters more than bitwise borders; use this when the
result must match single-chip output exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SUPPORTED_IMPLS = ("jnp", "pallas_pack", "pallas_pack_interpret")


def spatial_mesh(num_devices: int = 0, axis_name: str = "space") -> Mesh:
    devs = list(jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def height_sharding(mesh: Mesh, axis_name: str = "space") -> NamedSharding:
    """Shard (B, H, W, C) inputs along H."""
    return NamedSharding(mesh, P(None, axis_name, None, None))


class SpatialFuser:
    """Fuse one (possibly huge) pair with H sharded across all chips."""

    def __init__(self, model, variables, mesh: Optional[Mesh] = None, axis_name: str = "space"):
        import jax.numpy as jnp

        from ..ops.pallas_pack_spmd import spatial_partitioning

        impl = model.cfg.resolved_attention_impl()
        if impl not in _SUPPORTED_IMPLS:
            raise ValueError(
                f"SpatialFuser does not support attention_impl={impl!r}: the NHWC "
                "Pallas kernels are opaque to GSPMD, so H-sharding would silently "
                "replicate/all-gather activations around every kernel call. Use "
                "attention_impl='pallas_pack' (partitioned production kernels) or "
                "'jnp' — see parallel/spatial.py module docs."
            )
        self._spmd = impl.startswith("pallas_pack")

        self.mesh = mesh or spatial_mesh()
        self.axis_size = self.mesh.shape[axis_name]
        self.sharding = height_sharding(self.mesh, axis_name)
        self.variables = jax.device_put(variables, NamedSharding(self.mesh, P()))

        mesh_for_ctx = self.mesh

        def fwd(v, a, b):
            # the context flag routes packed-kernel calls through their
            # GSPMD-partitionable wrappers during tracing (jit traces lazily, so
            # the `with` is inside the traced fn and active exactly then);
            # the mesh lets the wrappers pin clean row shardings up front
            with spatial_partitioning(mesh_for_ctx, axis_name):
                return jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0)

        self._forward = jax.jit(fwd, out_shardings=self.sharding)
        # H not divisible by the mesh: device_put rejects uneven shardings, so the
        # input is zero-padded to the next multiple and cropped back INSIDE the jit
        # before the model sees it — the model output is exactly the unsharded one
        # (GSPMD re-balances the cropped intermediate itself)
        self._forward_uneven = jax.jit(
            lambda v, a, b, orig_h: fwd(v, a[:, :orig_h], b[:, :orig_h]),
            static_argnums=3,
        )

    def fuse(self, ir, vis_y):
        """ir, vis_y: (B, H, W, 1) float [0,1] host or device arrays."""
        h = ir.shape[1]
        pad = (-h) % self.axis_size
        if pad:
            import jax.numpy as jnp

            spec = ((0, 0), (0, pad), (0, 0), (0, 0))
            ir = jax.device_put(jnp.pad(jnp.asarray(ir), spec), self.sharding)
            vis_y = jax.device_put(jnp.pad(jnp.asarray(vis_y), spec), self.sharding)
            return self._forward_uneven(self.variables, ir, vis_y, h)
        ir = jax.device_put(ir, self.sharding)
        vis_y = jax.device_put(vis_y, self.sharding)
        return self._forward(self.variables, ir, vis_y)
