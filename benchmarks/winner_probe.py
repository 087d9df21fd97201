#!/usr/bin/env python
"""Quick hardware probe of the winner kernel at the large-P bench shapes.

Prints one JSON line per shape: staged vs winner intersect time + agreement.
Not part of bench.py's artifact — a development probe for kernel tuning.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="refined,split4")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cbtr_tpu.models import robot_lens_scene
    from cbtr_tpu.ops.intersect import intersect_rays, WHAT_INTERSECT
    from cbtr_tpu.ops.pallas_sweep import sweep_winner_pallas

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    def log(*a):
        print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)

    scenes = {}
    for name in args.shapes.split(","):
        t0 = time.perf_counter()
        if name == "refined":
            scenes[name] = robot_lens_scene(res=args.res, refine=True)
        elif name.startswith("split"):
            scenes[name] = robot_lens_scene(res=args.res,
                                            split=int(name[5:]))
        else:
            raise SystemExit(f"unknown shape {name}")
        log(f"scene {name} built in {time.perf_counter() - t0:.1f}s "
            f"({scenes[name].patches.num_patches} patches)")

    for name, scn in scenes.items():
        log(f"benching {name} ...")
        s = jnp.asarray(scn.start).reshape(-1, 3)
        d = jnp.asarray(scn.direction).reshape(-1, 3)
        R = int(s.shape[0])
        P = int(scn.patches.num_patches)

        win_jit = jax.jit(
            lambda s_, d_, _p=scn.patches: sweep_winner_pallas(_p, s_, d_)
        )
        t_win = timeit(win_jit, s, d)

        full_jit = jax.jit(
            lambda s_, d_, _p=scn.patches: intersect_rays(_p, s_, d_)
        )
        t_full = timeit(full_jit, s, d)

        # agreement vs XLA on a 4k sample
        sample = 4096
        hp = intersect_rays(scn.patches, s[:sample], d[:sample],
                            backend="pallas")
        hx = intersect_rays(scn.patches, s[:sample], d[:sample],
                            backend="xla")
        wp, wx = np.asarray(hp.what), np.asarray(hx.what)
        agree = wp == wx
        both = agree & (wp == WHAT_INTERSECT)
        d_ok = np.isclose(np.asarray(hp.distance)[both],
                          np.asarray(hx.distance)[both], rtol=1e-4, atol=1e-4)
        agreement = float((agree.sum() - (~d_ok).sum()) / sample)

        print(json.dumps({
            "shape": name, "rays": R, "patches": P,
            "winner_kernel_ms": round(t_win * 1e3, 3),
            "intersect_full_ms": round(t_full * 1e3, 3),
            "intersect_rays_per_s": round(R / t_full, 1),
            "agreement": round(agreement, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
