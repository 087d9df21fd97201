#!/usr/bin/env python
"""Hardware probe for the block-AABB cull leg (round-5 verdict ask #1).

Measures, per shape: executed-(tile x block)-pair fraction from the actual
candidate lists with the AABB leg off/on, and the production kernel timed
both ways (fused at P<=1024, winner above).  Median/min/max of n windows.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stats(ts):
    return {"median_ms": round(float(np.median(ts)) * 1e3, 3),
            "min_ms": round(min(ts) * 1e3, 3),
            "max_ms": round(max(ts) * 1e3, 3), "n": len(ts)}


def _timeit(fn, *args, reps=5, inner=2):
    import jax

    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # tunnel barrier (see bench.py)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    return _stats(ts)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cbtr_tpu.models import robot_lens_scene
    from cbtr_tpu.ops.pallas_sweep import (
        FUSED_BLOCK_P,
        WINNER_BLOCK_P,
        sweep_select_pallas,
        sweep_winner_pallas,
        tile_block_lists,
    )

    R = 65536
    out = {}
    shapes = [
        ("robot_450", robot_lens_scene(res=256), "fused"),
        ("refined_1800", robot_lens_scene(res=256, refine=True), "winner"),
        ("split4_7200", robot_lens_scene(res=256, split=4), "winner"),
    ]
    for name, scn, kind in shapes:
        s = jnp.asarray(scn.start).reshape(-1, 3)[:R]
        d = jnp.asarray(scn.direction).reshape(-1, 3)[:R]
        P = scn.patches.num_patches
        row = {"patches": P}
        # exec-pair fraction from the fused-path lists (same block size as
        # the winner path: 16)
        rays_t8 = jnp.concatenate(
            [s, d, jnp.zeros((R, 2), jnp.float32)], axis=-1
        ).T
        for tag, aabb in (("exec_frac_sphere", False), ("exec_frac_aabb", True)):
            counts, _ = jax.jit(
                lambda rt, _a=aabb: tile_block_lists(
                    scn.patches, rt, 128, FUSED_BLOCK_P, _a)
            )(rays_t8)
            n_blocks = -(-P // FUSED_BLOCK_P)
            row[tag] = round(
                float(np.asarray(jnp.sum(counts))) / (R // 128 * n_blocks), 4
            )
        for tag, aabb in (("ms_sphere", False), ("ms_aabb", True)):
            if kind == "fused":
                fn = jax.jit(lambda s_, d_, _a=aabb: sweep_select_pallas(
                    scn.patches, s_, d_, use_aabb=_a))
            else:
                fn = jax.jit(lambda s_, d_, _a=aabb: sweep_winner_pallas(
                    scn.patches, s_, d_, use_aabb=_a))
            row[tag] = _timeit(fn, s, d)
        # agreement of winners both ways (must be exact: same kernel, only
        # list lengths differ)
        if kind == "fused":
            a0 = sweep_select_pallas(scn.patches, s, d, use_aabb=False)
            a1 = sweep_select_pallas(scn.patches, s, d, use_aabb=True)
        else:
            a0 = sweep_winner_pallas(scn.patches, s, d, use_aabb=False)
            a1 = sweep_winner_pallas(scn.patches, s, d, use_aabb=True)
        row["identical"] = bool(
            np.array_equal(np.asarray(a0[0]), np.asarray(a1[0]))
            and np.array_equal(np.asarray(a0[1])[np.asarray(a0[0])],
                               np.asarray(a1[1])[np.asarray(a1[0])])
        )
        out[name] = row
        print(name, json.dumps(row), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
