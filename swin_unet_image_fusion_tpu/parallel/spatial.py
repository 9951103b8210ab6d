"""In-model spatial (H-axis) sharding for exact multi-chip single-image fusion.

Complement to the overlap-tiled path (``tiled.py``): instead of approximating borders,
the image's H axis is sharded across the mesh and the *unmodified* model runs under
GSPMD, which inserts the halo exchanges itself — collective-permutes for the cyclic
roll (``torch.roll`` semantics wrap around the global image, reference
a001_WindowAttention.py:442-444), neighbour exchanges for the window re-partitions, and
all-gathers where a stage's padded resolution stops dividing evenly. This is the
idiomatic JAX realisation of SURVEY.md §5's "spatial sharding + ppermute halo exchange":
we annotate shardings, XLA derives the collectives.

Exactness: verified equal to the single-device forward within fp32 reduction noise
(tests/test_spatial_sharding.py). Use tiled fusion when throughput matters more than
bitwise borders; use this when the result must match single-chip output exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

        self.mesh = mesh or spatial_mesh()
        self.axis_size = self.mesh.shape[axis_name]
        self.sharding = height_sharding(self.mesh, axis_name)
        self.variables = jax.device_put(variables, NamedSharding(self.mesh, P()))
        self._forward = jax.jit(
            lambda v, a, b: jnp.clip(model.apply(v, a, b, train=False), 0.0, 1.0),
            out_shardings=self.sharding,
        )
        # H not divisible by the mesh: device_put rejects uneven shardings, so the
        # input is zero-padded to the next multiple and cropped back INSIDE the jit
        # before the model sees it — the model output is exactly the unsharded one
        # (GSPMD re-balances the cropped intermediate itself)
        self._forward_uneven = jax.jit(
            lambda v, a, b, orig_h: jnp.clip(
                model.apply(v, a[:, :orig_h], b[:, :orig_h], train=False), 0.0, 1.0
            ),
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
