"""Alias namespace: mesh/sharding utilities (see macaque_tpu.core.mesh)."""

from macaque_tpu.core.mesh import (  # noqa: F401
    make_mesh, shard_over, replicate, device_put_sharded_batch,
)
