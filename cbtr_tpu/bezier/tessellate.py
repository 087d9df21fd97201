"""Surface tessellation: BezierPatches -> dense triangle soup.

Equivalent of BezierMesh::interpolate (reference/bezierMesh.cpp:55-66): the
unit barycentric triangle is subdivided by `divisor` and every sub-corner is
pushed through each patch's cubic interpolation.  One batched contraction of
shape [P, T, 3corners] replaces the reference's nested loops.

Triangle emission order differs from the reference (patch-major here,
sub-triangle-major there); the resulting triangle *set* is identical, which
is what the accuracy harness consumes (it welds vertices anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import geom
from .patches import BezierPatches, interpolate, interpolate_linear


@functools.partial(jax.jit, static_argnames=("divisor", "blend"))
def tessellate(patches: BezierPatches, divisor: int, blend: float = 1.0):
    """[P*divisor^2, 3, 3] triangle soup on device.

    blend < 1 mixes the cubic point with the linear (flat) point, used by the
    thick-patch splitter (reference/bezierMesh.cpp:200-204).
    """
    bary = jnp.asarray(geom.subdivision_barycentrics(divisor))  # [T,3,3]
    cp = patches.control_points[:, None, None, :, :]  # [P,1,1,10,3]
    pts = interpolate(cp, bary[None, :, :, :])  # [P,T,3,3]
    if blend != 1.0:
        lin = interpolate_linear(cp, bary[None, :, :, :])
        pts = pts * blend + lin * (1.0 - blend)
    return pts.reshape(-1, 3, 3)


def tessellate_to_numpy(patches: BezierPatches, divisor: int) -> np.ndarray:
    return np.asarray(tessellate(patches, divisor), dtype=np.float32)
