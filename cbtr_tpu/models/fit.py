"""Preemption-safe lens optimization: the failure-detection / elastic-resume
subsystem the reference has no analogue of (its only persistence is STL
round-tripping, reference/mesh.cpp:399-430).

`fit_lens` runs SGD on the differentiable render and checkpoints
atomically every `checkpoint_every` steps; a re-invocation with the same
`checkpoint_dir` resumes from the highest-step checkpoint — kill the
process at any point and the restarted run converges to the same parameters
as an uninterrupted one (asserted in tests/test_fit_resume.py).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from ..utils.checkpoint import latest_checkpoint, load_params, save_params
from .lens_model import (
    LensParams,
    make_opt_train_step,
    make_train_step,
    params_from_scene,
)


def fit_lens(scene, target, steps: int, checkpoint_dir: Optional[str] = None,
             checkpoint_every: int = 10, learning_rate: float = 1e-3,
             resolution: int = 0,
             on_step: Optional[Callable[[int, float], None]] = None,
             rays=None, init_params: Optional[LensParams] = None,
             optimizer=None):
    """Fit the lens control points + refractive index to `target`.

    Returns (params, losses list starting at the resumed step).  With
    `checkpoint_dir`, resumes from the latest `ckpt_{step}.npz` and writes a
    new checkpoint every `checkpoint_every` steps plus one at the end.
    rays: optional (start [N,3], direction [N,3]) overriding the scene's
    collimated grid (e.g. a point-source emitter set — fit_emitter_lens);
    init_params: optional starting parameters (default: the scene's).
    optimizer: None for plain SGD at `learning_rate` (the checkpoint/resume
    -exact path: tests/test_fit_resume.py), "adam" for optax.adam at
    `learning_rate`, or any optax GradientTransformation.  Optimizer state
    is NOT checkpointed — a resumed adam run restarts its moments (the
    params themselves resume exactly).
    """
    target = jnp.asarray(target, jnp.float32)
    resolution = resolution or int(target.shape[0])
    params = init_params if init_params is not None else params_from_scene(scene)
    ray_s, ray_d = rays if rays is not None else (scene.start, scene.direction)
    start_step = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt = latest_checkpoint(checkpoint_dir)
        if ckpt is not None:
            params, start_step = load_params(ckpt, LensParams)

    use_opt = optimizer is not None
    opt_state = None
    if use_opt:
        import optax

        if optimizer == "adam":
            optimizer = optax.adam(learning_rate)
        step_fn_opt = make_opt_train_step(
            scene.patches, scene.screen_plane, target, optimizer,
            resolution=resolution,
        )
        opt_state = optimizer.init(params)
    else:
        step_fn = make_train_step(
            scene.patches, scene.screen_plane, target, resolution=resolution,
            learning_rate=learning_rate,
        )
    losses = []
    for step in range(start_step, steps):
        if use_opt:
            params, opt_state, loss = step_fn_opt(
                params, opt_state, ray_s, ray_d
            )
        else:
            params, loss = step_fn(params, ray_s, ray_d)
        loss = float(loss)
        if not np.isfinite(loss):
            raise FloatingPointError(f"non-finite loss at step {step}")
        losses.append(loss)
        if on_step:
            on_step(step, loss)
        done = step + 1
        if checkpoint_dir and (
            done % checkpoint_every == 0 or done == steps
        ):
            save_params(
                os.path.join(checkpoint_dir, f"ckpt_{done}.npz"), params, done
            )
    return params, losses


def emitter_rays(n_rays: int, belts: int = 16, seed: int = 0,
                 origin=(0.0, 0.0, 0.0)):
    """Point-source hemisphere ray set, SORTED by the reference's belt/patch
    bin (reference/hostUtil.cpp:9-13) so the intersect kernel's sphere cull
    sees coherent 128-ray tiles (the production emitter sort,
    render/render.py render_emitter_image; BENCH ray_sort: 11.2 -> 3.2 ms).
    Returns (start [n,3], direction [n,3]) jnp arrays."""
    from ..render.emitters import UniformHemisphere

    em = UniformHemisphere(belts=belts, seed=seed)
    d, patch = em.sample(n_rays)
    order = np.argsort(patch, kind="stable")
    d = jnp.asarray(d[order])
    s = jnp.broadcast_to(
        jnp.asarray(origin, jnp.float32)[None, :], d.shape
    )
    return jnp.asarray(s), d


def fit_emitter_lens(scene, target, steps: int, n_rays: int = 4096,
                     belts: int = 16, seed: int = 0,
                     origin=(0.0, 0.0, 0.0), **kw):
    """Fit the lens to a target ILLUMINATION pattern from a point source —
    the reference's motivating use case (car-lamp optics,
    reference/README.md:159-165): hemisphere-emitter rays
    (reference/hostUtil.cpp:16-29) refract through the lens and their screen
    splat is optimized toward `target`.

    The emitter set is sampled once (deterministic seed), bin-sorted, and
    held fixed across steps so the loss surface is stationary.  All fit_lens
    kwargs (checkpointing, learning_rate, init_params, ...) pass through.
    """
    return fit_lens(
        scene, target, steps,
        rays=emitter_rays(n_rays, belts=belts, seed=seed, origin=origin),
        **kw,
    )
