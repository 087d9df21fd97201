"""Adaptive thick-patch refinement (splitThickBezierTriangles).

Re-design of reference/bezierMesh.cpp:79-204: patches whose sampled surface
height exceeds 3% of the original triangle's perimeter are split (all three
sides), single-side splits propagate to edge-sharing neighbours, and each
face is re-emitted as 1/2/3/4 flat triangles whose new vertices blend the
cubic midpoint with the linear midpoint (factor 0.7).

The height/midpoint sampling is batched on device; the irregular emission
(variable triangle counts per face) runs host-side in NumPy, mirroring where
the reference keeps it.  The result is a *plain triangle mesh* that must be
re-preprocessed and re-built into patches (reference README.md:133).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import geom
from ..config import DEFAULT as CFG
from .patches import BezierPatches, interpolate, interpolate_linear

# emitted-triangle count per split bitmask = popcount+1, matching the
# reference's csSplitCount table {1,2,2,3,2,3,3,4} (reference/bezierMesh.cpp:82)
_INDEX_FOR_2_ON_SIDE = {1: 0, 2: 1, 4: 2}
_INDEX_FOR_1_ON_SIDE = {3: 2, 5: 1, 6: 0}


def _blended_midpoints(patches: BezierPatches) -> np.ndarray:
    """Split vertex for each patch at barycentric (.5,.5,0):
    0.7*cubic + 0.3*linear (reference/bezierMesh.cpp:200-204).  [P,3]."""
    bary = jnp.asarray([0.5, 0.5, 0.0], jnp.float32)
    cubic = interpolate(patches.control_points, bary)
    linear = interpolate_linear(patches.control_points, bary)
    f = CFG.split_bezier_interpolate_factor
    return np.asarray(cubic * f + linear * (1.0 - f), np.float32)


def _face_heights(patches: BezierPatches) -> np.ndarray:
    """Max |height| of each original face's Bezier surface over its flat
    triangle, sampled at the centroid point and at ratios .25/.5/.75 along
    each original side (reference/bezierMesh.cpp:85-96).  [F]."""
    cp = patches.control_points
    P = cp.shape[0]
    F = P // 3
    v = cp[:, 0, :].reshape(F, 3, 3)  # original triangle corners
    plane = geom.plane_from_3points(v[:, 0], v[:, 1], v[:, 2])  # [F,4]

    h = jnp.abs(geom.plane_distance(plane, cp.reshape(F, 3, 10, 3)[:, 0, 2, :]))
    ratios = jnp.asarray(CFG.sample_ratios_original_side, jnp.float32)
    bary = jnp.stack([ratios, 1.0 - ratios, jnp.zeros_like(ratios)], axis=-1)  # [S,3]
    pts = interpolate(cp[:, None, :, :], bary[None, :, :]).reshape(F, 3, -1, 3)
    d = jnp.abs(geom.plane_distance(plane[:, None, None, :], pts))  # [F,3,S]
    return np.asarray(jnp.maximum(h, jnp.max(d, axis=(1, 2))), np.float32)


def split_thick_patches(patches: BezierPatches, fellow, fellow_starts):
    """-> (new_tris [N,3,3] float32, num_split_faces int).

    fellow/fellow_starts are the *original* face neighbour tables the patches
    were built from (reference keeps them as mOriginalNeighbours).
    """
    fellow = np.asarray(fellow)
    fellow_starts = np.asarray(fellow_starts)
    F = fellow.shape[0]
    heights = _face_heights(patches)
    mids = _blended_midpoints(patches).reshape(F, 3, 3)  # per face, per side
    corners = np.asarray(patches.control_points[:, 0, :], np.float32).reshape(F, 3, 3)
    perim = (
        np.linalg.norm(corners[:, 0] - corners[:, 1], axis=-1)
        + np.linalg.norm(corners[:, 1] - corners[:, 2], axis=-1)
        + np.linalg.norm(corners[:, 2] - corners[:, 0], axis=-1)
    )

    split_sides = np.zeros(F, np.uint8)
    thick = heights / perim > CFG.bezier_height_per_perimeter_limit
    for f in np.nonzero(thick)[0]:
        split_sides[f] = 7
        for side in range(3):
            split_sides[fellow[f, side]] |= 1 << int(fellow_starts[f, side])

    out = []
    for f in range(F):
        tri = corners[f]
        split = int(split_sides[f])
        n = bin(split).count("1") + 1
        if n == 1:
            out.append(tri)
        elif n == 2:
            _append_2split(out, tri, mids[f], split)
        elif n == 3:
            _append_3split(out, tri, mids[f], split)
        else:
            _append_4split(out, tri, mids[f])
    return np.stack(out).astype(np.float32), int(thick.sum())


def _append_2split(out, tri, mids, split):
    """One side split -> 2 triangles (reference/bezierMesh.cpp:144-152)."""
    i2 = _INDEX_FOR_2_ON_SIDE[split]
    sv = mids[i2]
    a, b = (i2 + 1) % 3, (i2 + 2) % 3
    out.append(np.stack([tri[a], tri[b], sv]))
    out.append(np.stack([tri[b], tri[i2], sv]))


def _append_3split(out, tri, mids, split):
    """Two sides split -> 3 triangles, shorter-diagonal choice
    (reference/bezierMesh.cpp:162-178)."""
    i1 = _INDEX_FOR_1_ON_SIDE[split]
    after, before = (i1 + 1) % 3, (i1 + 2) % 3
    sv_before = mids[before]
    sv_after = mids[after]
    out.append(np.stack([tri[before], sv_before, sv_after]))
    if np.linalg.norm(tri[after] - sv_before) < np.linalg.norm(tri[i1] - sv_after):
        out.append(np.stack([tri[after], sv_after, sv_before]))
        out.append(np.stack([tri[i1], tri[after], sv_before]))
    else:
        out.append(np.stack([tri[after], sv_after, tri[i1]]))
        out.append(np.stack([tri[i1], sv_after, sv_before]))


def _append_4split(out, tri, mids):
    """All sides split -> 4 triangles (reference/bezierMesh.cpp:189-198)."""
    out.append(mids.copy())
    for i in range(3):
        out.append(np.stack([tri[i], mids[i], mids[(i + 2) % 3]]))
