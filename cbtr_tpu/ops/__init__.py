"""Compute ops: ray-surface intersection kernels (XLA and Pallas paths)."""
from .intersect import (  # noqa: F401
    RayHit,
    WHAT_FOLLOW_SIDE0,
    WHAT_FOLLOW_SIDE1,
    WHAT_FOLLOW_SIDE2,
    WHAT_NONE,
    WHAT_INTERSECT,
    patch_candidates,
    intersect_rays,
)
