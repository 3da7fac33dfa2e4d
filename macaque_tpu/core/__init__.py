"""Core: typed config tree, device mesh/sharding setup, tracing."""

from macaque_tpu.core.config import (
    PipelineConfig,
    Step1Config,
    TrackerConfig,
    CrossViewConfig,
    CrossFrameConfig,
    FilterConfig,
    TriangulationConfig,
    MACAQUE_BODYPARTS,
    MACAQUE_CONSTRAINTS,
    MACAQUE_CONSTRAINTS_WEAK,
)
from macaque_tpu.core.mesh import make_mesh, shard_over, replicate

__all__ = [
    "PipelineConfig",
    "Step1Config",
    "TrackerConfig",
    "CrossViewConfig",
    "CrossFrameConfig",
    "FilterConfig",
    "TriangulationConfig",
    "MACAQUE_BODYPARTS",
    "MACAQUE_CONSTRAINTS",
    "MACAQUE_CONSTRAINTS_WEAK",
    "make_mesh",
    "shard_over",
    "replicate",
]
