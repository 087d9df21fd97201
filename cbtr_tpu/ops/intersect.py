"""Ray x Bezier-patch intersection — THE hot kernel (XLA formulation).

Branch-free, batched re-design of BezierTriangle::intersect +
BezierMesh::intersect (reference/bezierTriangle.cpp:123-195,
reference/bezierMesh.cpp:206-227):

* the reference's early-return `if` pyramid becomes validity masks;
* the fixed 4-iteration Newton-style root search is statically unrolled;
* the per-candidate "follow side" retry on a neighbour patch
  (reference/bezierMesh.cpp:213-217) becomes a second masked evaluation over
  gathered neighbour rows;
* the sequential min-distance scan becomes a masked argmin over the patch
  axis.

Everything broadcasts over ray x patch axes, so one call evaluates a whole
[R, P] tile; `intersect_rays` chunks the ray axis to bound memory.

Numerical-safety deltas vs the reference (documented, not behavioural in
practice):
* `Plane::intersect(point, direction)` in the Newton loop leaves the result
  point *uninitialized* when the signed distance is negative
  (reference/3dGeomUtil.h:279-296 only writes mPoint when mDistance > 0, yet
  bezierTriangle.cpp:159 reads it unconditionally).  We compute the projected
  point unconditionally — the mathematically intended projection.
* every division/normalization is epsilon-guarded so dead lanes carry finite
  garbage instead of NaN (gradient safety).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geom
from ..config import DEFAULT as CFG
from ..bezier.patches import BezierPatches, interpolate, patch_normal

# BezierIntersection::What (reference/bezierTriangle.h:8-14)
WHAT_FOLLOW_SIDE0 = 0
WHAT_FOLLOW_SIDE1 = 1
WHAT_FOLLOW_SIDE2 = 2
WHAT_NONE = 3
WHAT_INTERSECT = 4

# sentinel distance for missed rays (plain float: no backend init at import)
_BIG = 3.4e38


class RayHit(NamedTuple):
    """Per-ray intersection record (reference BezierIntersection + patch id)."""

    what: jnp.ndarray          # [...] i32
    distance: jnp.ndarray      # [...] f32 (along-ray)
    point: jnp.ndarray         # [..., 3]
    normal: jnp.ndarray        # [..., 3] unit surface normal
    bary: jnp.ndarray          # [..., 3]
    cos_incidence: jnp.ndarray # [...] dot(ray dir, normal)
    patch: jnp.ndarray         # [...] i32 winning patch (or -1)


def patch_candidates(patches: BezierPatches, start, direction, limit_domain):
    """Candidate intersection of every ray against every given patch row.

    patches leaves have leading shape [...]; start/direction broadcast with
    it.  limit_domain=True applies the barycentric in-[0,1] gate
    (LimitPlaneIntersection::cThis, reference/bezierTriangle.cpp:127-131).

    Returns (what, distance, point, normal, bary, cos_out).
    """
    cp = patches.control_points
    n = geom.plane_normal(patches.underlying)
    c = geom.plane_constant(patches.underlying)
    h_in = patches.heights[..., 0]
    h_out = patches.heights[..., 1]

    # ray x underlying plane (reference/bezierTriangle.cpp:124-126)
    cos_inc = geom.dot(direction, n)
    dist0 = geom.safe_div(c - geom.dot(n, start), cos_inc)
    valid = (jnp.abs(cos_inc) >= CFG.ray_plane_intersection_epsilon) & (dist0 > 0.0)
    # self-reintersection slab gate
    valid &= (jnp.abs(dist0) > -h_in) & (jnp.abs(dist0) > h_out)

    point0 = start + dist0[..., None] * direction
    bary0 = geom.apply_mat3(patches.bary_inverse, point0)
    if limit_domain:
        in_dom = jnp.all((bary0 >= 0.0) & (bary0 <= 1.0), axis=-1)
        valid &= in_dom

    # Gradient hygiene: lanes already known dead still run the arithmetic
    # below; substitute tame values so no lane can reach inf (an inf forward
    # value turns masked cotangents into 0*inf = NaN that *sums* into real
    # control-point gradients).  Observable outputs are unaffected: dead
    # lanes end as WHAT_NONE either way.
    dist0 = jnp.where(valid, dist0, 1.0)
    cos_inc = jnp.where(valid, cos_inc, 1.0)

    # bracket along the ray (reference/bezierTriangle.cpp:132-135)
    d_in = geom.safe_div(h_in, cos_inc)
    d_out = geom.safe_div(h_out, cos_inc)
    closer = dist0 + jnp.where(cos_inc > 0.0, d_in, d_out)
    further = dist0 + jnp.where(cos_inc > 0.0, d_out, d_in)

    def surface_diff(t):
        p = start + t[..., None] * direction
        b = geom.apply_mat3(
            patches.bary_inverse, geom.plane_project(patches.underlying, p)
        )
        b = jnp.clip(b, -16.0, 16.0)  # bound cubic blow-up on hopeless lanes
        surf = interpolate(cp, b)
        return jnp.abs(geom.plane_distance(patches.underlying, p)) - jnp.abs(
            geom.plane_distance(patches.underlying, surf)
        )

    # secant-style estimate with midpoint fallback (cpp:137-152)
    diff_closer = surface_diff(closer)
    diff_further = surface_diff(further)
    denom = diff_closer - diff_further
    secant = geom.safe_div(diff_closer * further - diff_further * closer, denom)
    middle = jnp.where(
        jnp.abs(denom) < CFG.intersection_estimation_epsilon,
        (closer + further) / 2.0,
        secant,
    )
    middle = jnp.clip(middle, -1e7, 1e7)

    # fixed-iteration Newton-like refinement, statically unrolled (cpp:155-164)
    proj_dir = jnp.broadcast_to(n, middle.shape + (3,))
    distance = middle
    for _ in range(CFG.root_search_iterations):
        distance = middle
        p = start + middle[..., None] * direction
        t = geom.safe_div(c - geom.dot(n, p), geom.dot(proj_dir, n))
        plane_pt = p + t[..., None] * proj_dir
        bary = geom.apply_mat3(patches.bary_inverse, plane_pt)
        bary = jnp.clip(bary, -16.0, 16.0)  # diverged lanes fail acceptance anyway
        normal = patch_normal(cp, patches.deriv_b, bary)
        surf_pt = interpolate(cp, bary)
        step = surf_pt - plane_pt
        new_dir = geom.safe_normalize(step)
        # keep the previous direction when the step vanished (converged lane)
        proj_dir = jnp.where(
            (geom.dot(step, step) > 0.0)[..., None], new_dir, proj_dir
        )
        middle = jnp.clip(
            geom.safe_div(
                geom.dot(surf_pt - start, normal), geom.dot(direction, normal)
            ),
            -1e7,
            1e7,
        )

    # acceptance (cpp:165-167): point close to the ray line AND beyond the slab
    ray_dist = geom.ray_point_distance(start, direction, surf_pt)
    accept = (ray_dist <= CFG.max_intersection_distance_from_ray) & (
        distance >= (further - closer) * CFG.minimal_ray_distance
    )
    valid &= accept

    # domain classification against divider planes (cpp:169-184)
    d_div = geom.plane_distance(patches.dividers, surf_pt[..., None, :])  # [...,3]
    outside = (
        (d_div[..., 0] < 0.0).astype(jnp.int32)
        + (d_div[..., 1] < 0.0).astype(jnp.int32) * 2
        + (d_div[..., 2] < 0.0).astype(jnp.int32) * 4
    )
    what = jnp.where(
        outside == 1,
        WHAT_FOLLOW_SIDE0,
        jnp.where(
            outside == 2,
            WHAT_FOLLOW_SIDE1,
            jnp.where(outside == 4, WHAT_FOLLOW_SIDE2, WHAT_INTERSECT),
        ),
    )
    what = jnp.where(valid, what, WHAT_NONE).astype(jnp.int32)
    cos_out = geom.dot(direction, normal)
    return what, distance, surf_pt, normal, bary, cos_out


def candidates_with_retry(local_patches: BezierPatches,
                          full_patches: BezierPatches, local_base, start,
                          direction):
    """Per-(ray, local patch) candidates after the follow-side retry.

    local_patches: the patch rows this caller scans (a shard or the whole
    table); full_patches: the complete table the retry gathers neighbour
    rows from (neighbour ids are global); local_base: global id of
    local_patches row 0.  start/direction [R,3].

    Returns (what, distance, point, normal, bary, cos, global_patch_id), each
    [R, P_local(, 3)].
    """
    P = local_patches.num_patches
    R = start.shape[0]
    s = start[:, None, :]  # [R,1,3] broadcast over patches
    d = direction[:, None, :]

    # pass 1: local patches, domain gate ON
    what1, dist1, pt1, n1, b1, cos1 = patch_candidates(local_patches, s, d, True)

    # follow-side retry: evaluate the indicated neighbour, gate OFF
    # (reference/bezierMesh.cpp:213-217)
    follow = what1 < WHAT_NONE
    side = jnp.clip(what1, 0, 2)
    nb = jnp.take_along_axis(
        jnp.broadcast_to(local_patches.neighbours[None], (R, P, 3)),
        side[..., None],
        axis=-1,
    )[..., 0]
    nb = jnp.where(follow, nb, 0)
    rows = full_patches.row(nb)  # [R,P] gathered patch rows
    what2, dist2, pt2, n2, b2, cos2 = patch_candidates(rows, s, d, False)

    def merge(a2, a1):
        cond = follow[..., None] if a1.ndim == 3 else follow
        return jnp.where(cond, a2, a1)

    local_ids = local_base + jnp.arange(P, dtype=jnp.int32)
    hit_patch = jnp.where(follow, nb, jnp.broadcast_to(local_ids, follow.shape))
    return (
        merge(what2, what1),
        merge(dist2, dist1),
        merge(pt2, pt1),
        merge(n2, n1),
        merge(b2, b1),
        merge(cos2, cos1),
        hit_patch.astype(jnp.int32),
    )


def select_best(what, dist, pt, n, b, cos, hit_patch) -> RayHit:
    """Min-distance cIntersect wins (reference/bezierMesh.cpp:220-222);
    reduces the trailing patch axis."""
    considered = what == WHAT_INTERSECT
    key = jnp.where(considered, dist, _BIG)
    best = jnp.argmin(key, axis=-1)  # [R]

    def pick(m):
        return jnp.take_along_axis(
            m, best[:, None, None] if m.ndim == 3 else best[:, None], axis=1
        ).squeeze(1)

    any_hit = jnp.any(considered, axis=-1)
    return RayHit(
        what=jnp.where(any_hit, WHAT_INTERSECT, WHAT_NONE).astype(jnp.int32),
        distance=jnp.where(any_hit, pick(dist), _BIG),
        point=pick(pt),
        normal=pick(n),
        bary=pick(b),
        cos_incidence=pick(cos),
        patch=jnp.where(any_hit, pick(hit_patch), -1).astype(jnp.int32),
    )


def _intersect_chunk(patches: BezierPatches, start, direction):
    """Full mesh intersection for a chunk of rays. start/direction [R,3]."""
    fields = candidates_with_retry(patches, patches, 0, start, direction)
    return select_best(*fields)


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def intersect_rays(patches: BezierPatches, start, direction, chunk_size: int = 0):
    """Intersect a batch of rays with the whole Bezier surface.

    start/direction: [..., 3].  chunk_size > 0 scans the ray axis in chunks of
    that size to bound the [chunk, P] working set (VMEM/HBM pressure).
    Returns a RayHit with leading shape [...].
    """
    batch_shape = start.shape[:-1]
    s = start.reshape(-1, 3).astype(jnp.float32)
    d = direction.reshape(-1, 3).astype(jnp.float32)
    R = s.shape[0]

    if chunk_size and R > chunk_size:
        pad = (-R) % chunk_size
        s = jnp.pad(s, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        s = s.reshape(-1, chunk_size, 3)
        d = d.reshape(-1, chunk_size, 3)
        hits = jax.lax.map(lambda sd: _intersect_chunk(patches, sd[0], sd[1]), (s, d))
        hit = jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])[:R], hits
        )
    else:
        hit = _intersect_chunk(patches, s, d)
    return jax.tree.map(
        lambda x: x.reshape(batch_shape + x.shape[1:]), hit
    )
