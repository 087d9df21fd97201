#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, robot.stl lens.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference-semantics tracer: a faithful
pure-NumPy single-ray implementation of the C++ reference's brute-force
loop (the C++ itself publishes no throughput numbers and is not buildable
here — no Eigen in the image).  The NumPy tracer is timed forward-only on a
small ray sample and extrapolated; the TPU number additionally includes the
full backward pass, so vs_baseline understates the true speedup.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=["smoke", "full"], default="full")
    parser.add_argument("--res", type=int, default=0, help="ray grid resolution")
    parser.add_argument("--iters", type=int, default=0)
    parser.add_argument("--baseline-rays", type=int, default=0)
    args = parser.parse_args()

    smoke = args.preset == "smoke"
    res = args.res or (64 if smoke else 512)
    iters = args.iters or (2 if smoke else 10)
    baseline_rays = args.baseline_rays or (8 if smoke else 64)

    import jax

    # persistent compilation cache: first compile through the TPU tunnel is
    # ~200s; cached recompiles are seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from cbtr_tpu.models import robot_lens_scene
    from cbtr_tpu.models.lens_model import (
        LensParams,
        lens_loss,
        params_from_scene,
    )

    scene = robot_lens_scene(res=res)
    params = params_from_scene(scene)
    n_rays = int(scene.start.shape[0])

    def loss_fn(params, start, direction):
        return lens_loss(
            params, scene.patches, start, direction, scene.screen_plane,
            jnp.zeros((128, 128), jnp.float32), resolution=128,
            chunk_size=65536 if n_rays > 65536 else 0,
        )

    step = jax.jit(jax.value_and_grad(loss_fn))
    start = jnp.asarray(scene.start)
    direction = jnp.asarray(scene.direction)

    # warm-up / compile
    loss, grads = step(params, start, direction)
    jax.block_until_ready((loss, grads))

    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = step(params, start, direction)
    jax.block_until_ready((loss, grads))
    dt = time.perf_counter() - t0
    rays_per_s = n_rays * iters / dt

    # ---- reference-semantics NumPy baseline (forward only, extrapolated) ----
    from cbtr_tpu.harness.reference_tracer import ReferenceTracer

    tracer = ReferenceTracer(scene.patches)
    s_np = np.asarray(scene.start)[:baseline_rays].astype(np.float64)
    d_np = np.asarray(scene.direction)[:baseline_rays].astype(np.float64)
    t0 = time.perf_counter()
    for i in range(baseline_rays):
        tracer.refract(s_np[i], d_np[i], scene.refractive_index, 1)
    base_dt = time.perf_counter() - t0
    base_rays_per_s = baseline_rays / base_dt if base_dt > 0 else 1.0

    print(
        json.dumps(
            {
                "metric": "rays/s/chip fwd+bwd, robot.stl lens "
                f"({res}x{res} rays, 450 patches)",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / base_rays_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
