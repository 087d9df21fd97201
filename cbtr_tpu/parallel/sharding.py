"""Device-mesh sharding for the raytracer.

The scaling axis of this workload is the *ray/pixel count* (the reference's
planned CUDA batching, reference/README.md:159-198, is the single-GPU
ancestor of this).  TPU-native design:

* rays are sharded over the mesh axis 'rays' (the data-parallel axis);
* the BezierPatches SoA (tens of KB) is replicated on every chip;
* forward needs zero communication (rays independent);
* the backward pass's control-point / refractive-index gradients are
  all-reduced by XLA automatically because parameters are replicated while
  the batch is sharded — the psum rides ICI and overlaps the backward
  schedule.

No torch/NCCL/MPI analogue: `jax.sharding.NamedSharding` + `jax.jit` is the
whole communication stack.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lens_model import LensParams, lens_loss
from ..render.render import render_lens_image


def ray_device_mesh(num_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def shard_rays(mesh: Mesh, array, axis: str = "rays"):
    """Shard the leading (ray) axis across the mesh; pads are caller's job."""
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def render_sharded(mesh: Mesh, patches, refractive_index, start, direction,
                   screen_plane, resolution: int = 128, extent: float = 4.0):
    """Forward render with rays sharded across the mesh.

    The bilinear splat's scatter-add commutes across shards, so XLA reduces
    the per-shard partial images with one psum at the end.
    """
    patches_r = replicate(mesh, patches)
    screen_r = replicate(mesh, screen_plane)
    start_s = shard_rays(mesh, start)
    dir_s = shard_rays(mesh, direction)
    return render_lens_image(
        patches_r, refractive_index, start_s, dir_s, screen_r,
        extent=extent, resolution=resolution,
    )


def make_sharded_train_step(mesh: Mesh, patches, screen_plane, target,
                            resolution: int = 128, extent: float = 4.0,
                            learning_rate: float = 1e-3):
    """Jitted SPMD train step over the ray mesh.

    Params replicated, rays sharded: jax.jit's SPMD partitioner inserts the
    gradient all-reduce (psum over 'rays') on ICI; nothing manual.
    """
    patches_r = replicate(mesh, patches)
    screen_r = replicate(mesh, screen_plane)
    target_r = replicate(mesh, target)

    def loss_fn(params, start, direction):
        return lens_loss(
            params, patches_r, start, direction, screen_r, target_r,
            resolution=resolution, extent=extent,
        )

    param_sharding = NamedSharding(mesh, P())

    @jax.jit
    def step(params: LensParams, start, direction):
        loss, grads = jax.value_and_grad(loss_fn)(params, start, direction)
        new = LensParams(
            control_points=params.control_points
            - learning_rate * grads.control_points,
            refractive_index=params.refractive_index
            - learning_rate * grads.refractive_index,
        )
        return new, loss

    def run(params: LensParams, start, direction):
        params = jax.device_put(params, param_sharding)
        return step(params, shard_rays(mesh, start), shard_rays(mesh, direction))

    return run
