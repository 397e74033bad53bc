"""embree_tpu — a TPU-native differentiable ray tracing framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of Intel Embree
(see SURVEY.md). Public API mirrors the roles of include/embree4/rtcore_*.h.
"""
import os as _os

import jax as _jax

# Persistent compilation cache: TPU kernel compiles go through a remote helper
# and are expensive; cache them across processes.
try:
    _cache_dir = _os.environ.get("EMBREE_TPU_CACHE",
                                 _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .core.ray import RayBatch, HitBatch, make_rays, make_miss_hits, INVALID_ID
from .geometry import (
    TriangleGeometry, QuadGeometry, PointGeometry, LineSegmentsGeometry,
    CurveGeometry, UserGeometry, InstanceGeometry, InstanceArrayGeometry,
    GridGeometry, SubdivisionGeometry,
)
from .scene import (
    Scene, CommittedScene, BuildQuality,
    intersect, occluded, intersect_brute,
)
from .interpolate import interpolate
from .buffer import (BUFFER_TYPE_INDEX, BUFFER_TYPE_VERTEX,
                     BUFFER_TYPE_VERTEX_ATTRIBUTE, Buffer, BufferError,
                     get_geometry_buffer, interpolate_slot,
                     set_geometry_buffer, set_vertex_attribute_count,
                     vertex_attribute_count)
from .builder_api import build_bvh, walk_bvh
from .tlas import (TwoLevelScene, build_two_level, intersect_two_level,
                   occluded_two_level, update_transforms)

__version__ = "0.1.0"
