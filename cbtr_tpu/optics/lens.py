"""Snell refraction at a Bezier lens surface.

Branch-free batched re-design of BezierLens::refract
(reference/bezierLens.cpp:4-34): the if/else ladder (miss / TIR / grazing
pass-through / refraction) becomes masks over a ray batch; the
"expected state" guard — a candidate refraction only survives if the
inside/outside transition matches what the caller expects
(reference/README.md:155) — is a final mask.

Status codes follow the reference enum (reference/bezierLens.h:7-11).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geom
from ..config import DEFAULT as CFG
from ..ops.intersect import WHAT_INTERSECT, intersect_rays

REFRACT_NONE = 0
REFRACT_INSIDE = 1
REFRACT_OUTSIDE = 2


def refract_rays(patches, refractive_index, start, direction, expected,
                 chunk_size: int = 0, intersect_fn=None):
    """Refract a ray batch at the lens surface.

    expected: int (REFRACT_INSIDE or REFRACT_OUTSIDE) or [...] i32 array.
    Returns (new_start [...,3], new_direction [...,3], status [...] i32).
    Rays whose status is REFRACT_NONE are dead (miss / TIR / unexpected
    transition); their outputs carry the inputs unchanged so downstream
    passes stay finite.

    intersect_fn: optional (patches, start, direction) -> RayHit override so
    sharded/tensor-parallel intersection paths (e.g.
    parallel.patch_parallel.intersect_rays_patch_sharded) reuse this exact
    Snell physics instead of duplicating it.
    """
    if intersect_fn is None:
        hit = intersect_rays(patches, start, direction, chunk_size=chunk_size)
    else:
        hit = intersect_fn(patches, start, direction)
    ok = hit.what == WHAT_INTERSECT

    cos_inc = hit.cos_incidence
    # ray from outside has cos < 0 (normal points outwards)
    status = jnp.where(cos_inc < 0.0, REFRACT_INSIDE, REFRACT_OUTSIDE)
    going_in = status == REFRACT_INSIDE
    eff = jnp.where(going_in, 1.0 / refractive_index, refractive_index)
    sin2 = eff * eff * (1.0 - cos_inc * cos_inc)

    tir = sin2 >= CFG.max_sin2_refraction
    grazing = sin2 <= CFG.min_sin2_refraction

    normal = hit.normal * jnp.where(going_in, 1.0, -1.0)[..., None]
    cos1 = jnp.abs(cos_inc)
    # TIR lanes would evaluate sqrt at 0 whose reverse-mode derivative is inf
    # (0-cotangent x inf = NaN polluting the refractive-index gradient); they
    # are masked out below, so substitute a tame argument.  Surviving lanes
    # have 1 - sin2 >= 1 - max_sin2 = 0.01, far above the floor.
    sin2_live = jnp.where(tir, 0.0, sin2)
    cos2 = jnp.sqrt(jnp.maximum(1.0 - sin2_live, 1e-6))
    bent = geom.safe_normalize(
        direction * eff[..., None] + normal * (eff * cos1 - cos2)[..., None]
    )
    new_dir = jnp.where(grazing[..., None], direction, bent)

    status = jnp.where(ok & ~tir, status, REFRACT_NONE)
    expected = jnp.asarray(expected, jnp.int32)
    status = jnp.where(status == expected, status, REFRACT_NONE)

    alive = (status != REFRACT_NONE)[..., None]
    new_start = jnp.where(alive, hit.point, start)
    new_dir = jnp.where(alive, new_dir, direction)
    return new_start, new_dir, status.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("chunk_size", "intersect_fn"))
def trace_through_lens(patches, refractive_index, start, direction,
                       chunk_size: int = 0, intersect_fn=None):
    """Full lens pass: refract entering (expect inside), then exiting
    (expect outside) — the per-ray state machine of the reference's
    illumination loop (reference/test.cpp:376-394).

    intersect_fn is a *static* jit argument (it is a callable): pass a
    long-lived function object, not a fresh closure/lambda per call — each
    new callable identity forces a full retrace and a new compile-cache
    entry.  Hoist the closure (module level or functools.cache keyed on the
    mesh/config) before calling in a loop.

    Returns (start, direction, alive_mask, entry_point, exit_point).
    """
    s1, d1, st1 = refract_rays(
        patches, refractive_index, start, direction, REFRACT_INSIDE,
        chunk_size, intersect_fn,
    )
    s2, d2, st2 = refract_rays(
        patches, refractive_index, s1, d1, REFRACT_OUTSIDE,
        chunk_size, intersect_fn,
    )
    alive = (st1 == REFRACT_INSIDE) & (st2 == REFRACT_OUTSIDE)
    return s2, d2, alive, s1, s2
