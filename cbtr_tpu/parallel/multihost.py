"""Multi-host distributed execution.

The reference's scale-out story is single-GPU prose (the planned Thrust ray
batching, reference/README.md:159-198).  This module is its pod-scale
TPU-native generalization: `jax.distributed` process groups + a global
('hosts', 'chips') device mesh with

* **rays sharded over every chip of every host** (the data-parallel axis of
  a raytracer — rays are independent, so forward needs zero communication);
* **the BezierPatches SoA replicated** (tens of KB/mesh);
* **gradient all-reduce inserted by XLA**: parameters replicated + batch
  sharded means the backward pass psums control-point / refractive-index
  grads over ICI within a slice and DCN across hosts.  VERIFIED here (HLO
  inspection, tests/test_multihost.py::test_gradient_allreduce_in_backward):
  the compiled train step contains exactly the expected all-reduces over all
  devices, placed inside the backward computation.  On real TPU pods XLA's
  latency-hiding scheduler can additionally overlap those collectives with
  remaining backward compute (async all-reduce-start/done pairs) — that
  schedule-level overlap is a TPU-backend property this single-chip
  environment cannot demonstrate, so we claim insertion + placement, not
  measured overlap.

Single-process (1 host, N devices) and multi-process (N hosts) run the same
code: the mesh is built from `jax.devices()` (global across processes) and
per-process ray shards are assembled with
`jax.make_array_from_process_local_data`.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.lens_model import LensParams, lens_loss
from ..render.render import render_lens_image


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Join (or skip) the jax.distributed process group.

    Explicit args, or the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), or —
    on real multi-host TPU pods — automatic cluster detection.  Returns True
    when a multi-process group was initialized, False for the single-process
    fallback (everything still works on one host's devices).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes is None:
        return False  # single process; nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def multihost_mesh(axis: str = "rays",
                   num_devices: Optional[int] = None) -> Mesh:
    """1D mesh over every chip of every host (the ray/data axis).

    A flat axis is the right shape for this workload: rays need no
    communication, so there is nothing for a second mesh dimension to
    exploit — hosts x chips collapse into one data axis and the only
    collective (gradient psum) rides ICI first, DCN for the cross-host hop.
    """
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def process_ray_shard(start: np.ndarray, direction: np.ndarray,
                      mesh: Mesh, axis: str = "rays"
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Assemble globally-sharded ray arrays from per-process slices.

    start/direction are the *global* [R,3] ray set (procedurally generated,
    so every process can build it — only its own slice is materialized on
    device).  Returns (start, direction, weight) as global jax.Arrays
    sharded over `axis`; weight is 1.0 for real rays, 0.0 for the rays added
    to pad R up to a multiple of the device count.  Callers MUST thread
    `weight` into the splat/loss (render_lens_image / lens_loss take it
    directly) — the pad direction (-x, away from every scene) is only a
    second line of defence, not the guarantee.
    """
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    R = start.shape[0]
    pad = (-R) % n
    weight = np.ones((R + pad,), np.float32)
    if pad:
        # padded rays head -x from the origin, away from every fixture
        # (scenes sit at +x); their weight is 0 regardless, so even a ray
        # that *did* hit something could not touch the image or the loss.
        weight[R:] = 0.0
        start = np.concatenate(
            [start, np.zeros((pad, 3), start.dtype)], axis=0
        )
        dpad = np.zeros((pad, 3), direction.dtype)
        dpad[:, 0] = -1.0
        direction = np.concatenate([direction, dpad], axis=0)

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return (
            jax.device_put(start, sharding),
            jax.device_put(direction, sharding),
            jax.device_put(weight, sharding),
        )
    # multi-process: each process materializes only its addressable shard
    def to_global(arr):
        per = arr.shape[0] // jax.process_count()
        pid = jax.process_index()
        local = arr[pid * per:(pid + 1) * per]
        return jax.make_array_from_process_local_data(sharding, local)

    return to_global(start), to_global(direction), to_global(weight)


def render_multihost(mesh: Mesh, patches, refractive_index, start, direction,
                     screen_plane, resolution: int = 128, extent: float = 4.0,
                     chunk_size: int = 0, axis: str = "rays"):
    """Globally-sharded forward render.

    start/direction: *global* numpy ray arrays (see process_ray_shard).
    Returns the [res, res] image, replicated on every process (the bilinear
    splat's scatter-add commutes across ray shards, so XLA reduces per-shard
    partials with one psum).
    """
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    s, d, w = process_ray_shard(
        np.asarray(start), np.asarray(direction), mesh, axis
    )
    return render_lens_image(
        patches_r, refractive_index, s, d, screen_r,
        extent=extent, resolution=resolution, chunk_size=chunk_size,
        weights=w,
    )


import functools


@functools.partial(
    jax.jit,
    static_argnames=("grid", "ray_sharding", "resolution", "extent",
                     "chunk_size"),
)
def _ortho_render_jit(patches_in, refractive_index, screen, grid,
                      ray_sharding, resolution, extent, chunk_size):
    """Module-level jit so repeated render_multihost_ortho calls hit the
    jit cache instead of retracing a fresh closure per call (grid /
    sharding are hashable statics)."""
    idx = jax.lax.with_sharding_constraint(
        jnp.arange(grid.n_rays, dtype=jnp.int32), ray_sharding
    )
    s, d = grid.rays_at(idx)
    return render_lens_image(
        patches_in, refractive_index, s, d, screen,
        extent=extent, resolution=resolution, chunk_size=chunk_size,
    )


def render_multihost_ortho(mesh: Mesh, patches, refractive_index,
                           grid, screen_plane, resolution: int = 128,
                           extent: float = 4.0, chunk_size: int = 0,
                           axis: str = "rays"):
    """Sharded render with rays SYNTHESIZED ON DEVICE from an OrthoGrid.

    render_multihost uploads the global [R,3] ray arrays; at a 4096x4096
    grid that is 402 MB of host->device traffic per call, which dominated
    the whole 4K render in this image (10.1 s wall vs <2 s compute through
    the TPU tunnel).  Here only a sharded iota of flat grid indices exists;
    each device computes its own rays from the closed-form grid
    (render/camera.py OrthoGrid.rays_at), so no process ever materializes —
    let alone transfers — the global ray set.  Requires
    grid.n_rays % device_count == 0 (an image grid over a power-of-two
    device count in practice).
    """
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if grid.n_rays % n:
        raise ValueError(f"grid rays {grid.n_rays} not divisible by {n} devices")
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    ray_sharding = NamedSharding(mesh, P(axis))
    return _ortho_render_jit(
        patches_r, jnp.float32(refractive_index), screen_r, grid,
        ray_sharding, resolution, extent, chunk_size,
    )


@functools.partial(
    jax.jit,
    static_argnames=("emitter", "ray_sharding", "resolution", "extent",
                     "chunk_size"),
)
def _emitter_render_jit(patches_in, refractive_index, screen, emitter,
                        ray_sharding, resolution, extent, chunk_size):
    idx = jax.lax.with_sharding_constraint(
        jnp.arange(emitter.n_rays, dtype=jnp.int32), ray_sharding
    )
    s, d, w = emitter.rays_at(idx)
    from ..render.render import render_lens_image

    return render_lens_image(
        patches_in, refractive_index, s, d, screen,
        extent=extent, resolution=resolution, chunk_size=chunk_size,
        weights=w,
    )


def render_multihost_emitter(mesh: Mesh, patches, refractive_index,
                             emitter, screen_plane, resolution: int = 128,
                             extent: float = 4.0, chunk_size: int = 0,
                             axis: str = "rays"):
    """Sharded point-source render with rays synthesized ON DEVICE from a
    DeviceEmitter — the emitter analogue of render_multihost_ortho.  Ray
    index space is bin-ordered, so each device's contiguous index slice is a
    contiguous run of hemisphere bins: per-shard tile coherence equals the
    sorted single-device case, with zero host sampling/sorting/upload.
    rays_at(idx) is deterministic in the GLOBAL index, so any device count
    produces identical rays (and, psum aside, identical images).
    Requires emitter.n_rays % device_count == 0."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if emitter.n_rays % n:
        raise ValueError(
            f"emitter rays {emitter.n_rays} not divisible by {n} devices"
        )
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    ray_sharding = NamedSharding(mesh, P(axis))
    return _emitter_render_jit(
        patches_r, jnp.float32(refractive_index), screen_r, emitter,
        ray_sharding, resolution, extent, chunk_size,
    )


def make_multihost_train_step_emitter(mesh: Mesh, patches, screen_plane,
                                      target, emitter,
                                      resolution: int = 128,
                                      extent: float = 4.0,
                                      learning_rate: float = 1e-3,
                                      chunk_size: int = 0,
                                      axis: str = "rays"):
    """SPMD emitter-illumination train step: point-source rays synthesized
    per shard on device (DeviceEmitter), full fwd+bwd against an image
    target, grads psum-reduced by XLA — the reference's motivating car-lamp
    use case (reference/README.md:159-165, hostUtil.cpp:9-29) at scale.

    Returns run(params) -> (new_params, loss, grads)."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if emitter.n_rays % n:
        raise ValueError(
            f"emitter rays {emitter.n_rays} not divisible by {n} devices"
        )
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    target_r = jax.device_put(jnp.asarray(target), rep)
    ray_sharding = NamedSharding(mesh, P(axis))

    def loss_fn(params):
        idx = jax.lax.with_sharding_constraint(
            jnp.arange(emitter.n_rays, dtype=jnp.int32), ray_sharding
        )
        s, d, w = emitter.rays_at(idx)
        return lens_loss(
            params, patches_r, s, d, screen_r, target_r,
            resolution=resolution, extent=extent, chunk_size=chunk_size,
            ray_weights=w,
        )

    @jax.jit
    def step(params: LensParams):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = LensParams(
            control_points=params.control_points
            - learning_rate * grads.control_points,
            refractive_index=params.refractive_index
            - learning_rate * grads.refractive_index,
        )
        return new, loss, grads

    def run(params: LensParams):
        return step(jax.device_put(params, rep))

    return run


def make_multihost_train_step_ortho(mesh: Mesh, patches, screen_plane,
                                    target, grid, resolution: int = 128,
                                    extent: float = 4.0,
                                    learning_rate: float = 1e-3,
                                    chunk_size: int = 0, axis: str = "rays"):
    """SPMD train step with rays SYNTHESIZED ON DEVICE from an OrthoGrid —
    the training analogue of render_multihost_ortho: params replicated,
    each device builds its own ray shard from the closed-form grid (no
    402 MB host upload at 4096^2), backward psums the control-point /
    refractive-index grads over ICI/DCN.

    Returns run(params) -> (new_params, loss, grads); grads are returned so
    large-scale artifacts can checksum them (TRAIN4K).  Requires
    grid.n_rays % device_count == 0."""
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if grid.n_rays % n:
        raise ValueError(f"grid rays {grid.n_rays} not divisible by {n} devices")
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    target_r = jax.device_put(jnp.asarray(target), rep)
    ray_sharding = NamedSharding(mesh, P(axis))

    def loss_fn(params):
        idx = jax.lax.with_sharding_constraint(
            jnp.arange(grid.n_rays, dtype=jnp.int32), ray_sharding
        )
        s, d = grid.rays_at(idx)
        return lens_loss(
            params, patches_r, s, d, screen_r, target_r,
            resolution=resolution, extent=extent, chunk_size=chunk_size,
        )

    @jax.jit
    def step(params: LensParams):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new = LensParams(
            control_points=params.control_points
            - learning_rate * grads.control_points,
            refractive_index=params.refractive_index
            - learning_rate * grads.refractive_index,
        )
        return new, loss, grads

    def run(params: LensParams):
        return step(jax.device_put(params, rep))

    return run


def make_multihost_train_step(mesh: Mesh, patches, screen_plane, target,
                              resolution: int = 128, extent: float = 4.0,
                              learning_rate: float = 1e-3,
                              chunk_size: int = 0, axis: str = "rays"):
    """SPMD train step over the global mesh: params replicated, rays sharded,
    gradient psum over ICI/DCN inserted (and overlapped) by XLA.

    Returns run(params, start_np, direction_np) -> (params, loss); start /
    direction are global numpy arrays, sliced per process internally.
    """
    rep = NamedSharding(mesh, P())
    patches_r = jax.device_put(patches, rep)
    screen_r = jax.device_put(jnp.asarray(screen_plane), rep)
    target_r = jax.device_put(jnp.asarray(target), rep)

    def loss_fn(params, start, direction, weight):
        return lens_loss(
            params, patches_r, start, direction, screen_r, target_r,
            resolution=resolution, extent=extent, chunk_size=chunk_size,
            ray_weights=weight,
        )

    @jax.jit
    def step(params: LensParams, start, direction, weight):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, start, direction, weight
        )
        new = LensParams(
            control_points=params.control_points
            - learning_rate * grads.control_points,
            refractive_index=params.refractive_index
            - learning_rate * grads.refractive_index,
        )
        return new, loss

    def run(params: LensParams, start, direction):
        params = jax.device_put(params, rep)
        s, d, w = process_ray_shard(
            np.asarray(start), np.asarray(direction), mesh, axis
        )
        return step(params, s, d, w)

    return run
