"""embree_tpu — a TPU-native differentiable ray tracing framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of Intel Embree
(see SURVEY.md). Public API mirrors the roles of include/embree4/rtcore_*.h.
"""
from .core.ray import RayBatch, HitBatch, make_rays, make_miss_hits, INVALID_ID
from .scene import (
    Scene, TriangleGeometry, CommittedScene, BuildQuality,
    intersect, occluded, intersect_brute,
)

__version__ = "0.1.0"
