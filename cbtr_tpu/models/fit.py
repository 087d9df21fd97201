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
from .lens_model import LensParams, make_train_step, params_from_scene


def fit_lens(scene, target, steps: int, checkpoint_dir: Optional[str] = None,
             checkpoint_every: int = 10, learning_rate: float = 1e-3,
             resolution: int = 0,
             on_step: Optional[Callable[[int, float], None]] = None):
    """SGD-fit the lens control points + refractive index to `target`.

    Returns (params, losses list starting at the resumed step).  With
    `checkpoint_dir`, resumes from the latest `ckpt_{step}.npz` and writes a
    new checkpoint every `checkpoint_every` steps plus one at the end.
    """
    target = jnp.asarray(target, jnp.float32)
    resolution = resolution or int(target.shape[0])
    params = params_from_scene(scene)
    start_step = 0
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt = latest_checkpoint(checkpoint_dir)
        if ckpt is not None:
            params, start_step = load_params(ckpt, LensParams)

    step_fn = make_train_step(
        scene.patches, scene.screen_plane, target, resolution=resolution,
        learning_rate=learning_rate,
    )
    losses = []
    for step in range(start_step, steps):
        params, loss = step_fn(params, scene.start, scene.direction)
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
