#!/usr/bin/env python
"""BASELINE config 5's deliverable, as far as one chip allows: a 4K render.

"multi-host pod render: 4K image, rays sharded" (the pod-scale
generalization of the reference's GPU batching plan,
reference/README.md:159-198).  This environment has ONE real TPU chip and
no second host, so the artifact is produced in two halves that together
exercise every piece of the path:

* --tpu: 4096 x 4096 rays (16.8M) through the robot lens on the real chip
  via parallel.multihost (mesh of 1; the SAME code runs on a pod), rays
  chunked, landing in a 1024^2 irradiance image.  Writes wall time, rays/s,
  and an image checksum to RENDER4K_r03.json.  Run twice for a determinism
  check.
* --procs 2: the identical sharded-render code across 2 real
  jax.distributed processes (2 virtual CPU devices each) at a reduced ray
  grid (CPU sweep throughput caps what is feasible), asserting the
  replicated image equals the single-process render bit-for-float — the
  cross-process agreement half.

Usage:
  python benchmarks/render4k.py --tpu --out RENDER4K_r03.json
  python benchmarks/render4k.py --procs 2 --res 256
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_tpu(out: str, res: int, image_res: int, chunk: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    sys.path.insert(0, REPO)
    from cbtr_tpu.models import robot_lens_scene
    from cbtr_tpu.models.scenes import scene_ortho_grid
    from cbtr_tpu.parallel.multihost import (
        multihost_mesh,
        render_multihost_ortho,
    )

    scene = robot_lens_scene(res=1)  # geometry only; rays synthesized on device
    grid = scene_ortho_grid(res)
    mesh = multihost_mesh()
    n_rays = grid.n_rays

    def render(g):
        img = render_multihost_ortho(
            mesh, scene.patches, scene.refractive_index, g,
            scene.screen_plane, resolution=image_res, chunk_size=chunk,
        )
        jax.block_until_ready(img)
        return np.asarray(img)

    img = render(grid)  # compile + warm
    t0 = time.perf_counter()
    img2 = render(grid)
    dt = time.perf_counter() - t0
    checksum = hashlib.sha256(img.tobytes()).hexdigest()[:16]
    checksum2 = hashlib.sha256(img2.tobytes()).hexdigest()[:16]
    assert np.isfinite(img).all()
    assert img.sum() > 0
    record = {
        "metric": f"sharded {res}x{res} robot render -> {image_res}^2 image",
        "rays": n_rays,
        "wall_s": round(dt, 3),
        "rays_per_s": round(n_rays / dt, 1),
        "image_checksum": checksum,
        "deterministic": checksum == checksum2,
        "image_sum": float(img.sum()),
        "live_ray_weight": float(img.sum()),
        "device": jax.devices()[0].device_kind,
        "n_devices": len(jax.devices()),
    }

    # ---- cross-layout agreement (round-4 verdict weak #6): the SAME ray
    # multiset in row-major order.  The splat is order-invariant in exact
    # arithmetic; in f32 the per-pixel accumulation order changes, so
    # borderline acceptances can flip (r03->r04 moved ~470 of 16.8M rays).
    # Quantify it instead of leaving it to the diff of two rounds' files.
    grid_rm = grid._replace(tiled=False)
    img_rm = render(grid_rm)  # compile + warm (different layout -> new jit)
    t0 = time.perf_counter()
    img_rm = render(grid_rm)
    dt_rm = time.perf_counter() - t0
    denom = max(float(np.abs(img).max()), 1e-30)
    record["row_major"] = {
        "wall_s": round(dt_rm, 3),
        "rays_per_s": round(n_rays / dt_rm, 1),
        "image_checksum": hashlib.sha256(img_rm.tobytes()).hexdigest()[:16],
        "live_ray_weight": float(img_rm.sum()),
        "live_ray_weight_delta": float(img_rm.sum() - img.sum()),
        "image_max_abs_diff_rel": float(np.abs(img_rm - img).max() / denom),
        "image_l2_diff_rel": float(
            np.linalg.norm(img_rm - img) / max(np.linalg.norm(img), 1e-30)
        ),
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


def run_procs(nproc: int, res: int) -> None:
    """Cross-process agreement at a CPU-feasible ray grid."""
    out = "/tmp/cbtr_render4k_mp"
    for f in (f"{out}.proc{i}.npz" for i in range(nproc)):
        if os.path.exists(f):
            os.remove(f)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "benchmarks/multiprocess_render.py"),
         "--procs", str(nproc), "--out", out, "--res", str(res)],
        cwd=REPO, env=env,
    )
    if rc:
        sys.exit(rc)
    import numpy as np

    imgs = []
    for i in range(nproc):
        with np.load(f"{out}.proc{i}.npz") as d:
            imgs.append(d["img"])
    for i in range(1, nproc):
        np.testing.assert_array_equal(imgs[0], imgs[i])
    print(f"{nproc}-process {res}x{res} sharded render: replicated images "
          f"identical, checksum "
          f"{hashlib.sha256(imgs[0].tobytes()).hexdigest()[:16]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--procs", type=int, default=0)
    ap.add_argument("--res", type=int, default=4096)
    ap.add_argument("--image-res", type=int, default=1024)
    # 0 = let intersect_rays auto-chunk at pallas_sweep.safe_ray_cap (a
    # hand-picked chunk can overflow the scalar-prefetch SMEM budget when
    # the kernel block size changes — 1M rays x 32 blocks OOMed at 1.03M
    # of the 1.00M SMEM after the block-16 tuning)
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(REPO, "RENDER4K_r03.json"))
    args = ap.parse_args()
    if args.tpu:
        run_tpu(args.out, args.res, args.image_res, args.chunk)
    if args.procs:
        run_procs(args.procs, min(args.res, 256))


if __name__ == "__main__":
    main()
