"""Patch-sharded intersection: the tensor-parallel axis of the raytracer.

To cut per-chip compute (the brute-force scan is O(rays x patches)), the
*patch* axis is sharded across a mesh axis: every device intersects the ray
batch against its patch shard, then the min-distance winner is combined
across the axis with one all-gather of per-shard bests (a handful of floats
per ray) — the raytracing analogue of tensor parallelism with a reduce
epilogue.

The follow-side retry (reference/bezierMesh.cpp:213-217) can cross shard
boundaries, so each device also keeps the full (replicated) patch table for
the cheap gathered retry rows; the expensive dense pass-1 scan only touches
the local shard.  The SoA is tiny (~250 B/patch) so replication costs
nothing until meshes reach millions of patches.

Composes with ray sharding into a 2D ('rays', 'patches') mesh: rays split
along one axis, patches along the other.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..bezier.patches import BezierPatches
from ..ops.intersect import (
    RayHit,
    WHAT_NONE,
    WHAT_INTERSECT,
    _BIG,
    candidates_with_retry,
    select_best,
)


def pad_patches(patches: BezierPatches, multiple: int) -> BezierPatches:
    """Pad the patch axis with degenerate never-hit rows (zero control points
    give a zero plane normal -> |cos| < epsilon -> invalid)."""
    Pn = patches.num_patches
    pad = (-Pn) % multiple
    if pad == 0:
        return patches

    def pad_leaf(x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return BezierPatches(*(pad_leaf(leaf) for leaf in patches))


def intersect_rays_patch_sharded(patches: BezierPatches, start, direction,
                                 mesh: Mesh, patch_axis: str = "patches",
                                 ray_axis: Optional[str] = None) -> RayHit:
    """Mesh-sharded intersection: patches split along `patch_axis`, rays
    optionally split along `ray_axis` (2D mesh)."""
    n_shards = mesh.shape[patch_axis]
    patches = pad_patches(patches, n_shards)
    shard_size = patches.num_patches // n_shards

    ray_spec = P(ray_axis) if ray_axis else P()
    local_specs = BezierPatches(*(P(patch_axis) for _ in patches))
    full_specs = BezierPatches(*(P() for _ in patches))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(local_specs, full_specs, ray_spec, ray_spec),
        out_specs=RayHit(*(ray_spec for _ in RayHit._fields)),
        check_vma=False,
    )
    def shard_fn(local_patches, full_patches, s, d):
        base = jax.lax.axis_index(patch_axis) * shard_size
        fields = candidates_with_retry(local_patches, full_patches, base, s, d)
        local = select_best(*fields)

        # combine across the patch axis: gather each shard's best candidate
        key = jnp.where(local.what == WHAT_INTERSECT, local.distance, _BIG)
        all_key = jax.lax.all_gather(key, patch_axis)            # [S, R]
        all_hit = jax.tree.map(
            lambda x: jax.lax.all_gather(x, patch_axis), local
        )
        best = jnp.argmin(all_key, axis=0)                        # [R]

        def pick(x):
            idx = best[None, ..., None] if x.ndim == 3 else best[None]
            return jnp.take_along_axis(x, idx, axis=0).squeeze(0)

        won = jnp.take_along_axis(all_key, best[None], axis=0).squeeze(0) < _BIG
        out = jax.tree.map(pick, all_hit)
        return out._replace(
            what=jnp.where(won, WHAT_INTERSECT, WHAT_NONE).astype(jnp.int32),
            patch=jnp.where(won, out.patch, -1).astype(jnp.int32),
        )

    return shard_fn(
        patches, patches,
        start.astype(jnp.float32), direction.astype(jnp.float32),
    )
