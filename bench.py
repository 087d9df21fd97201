#!/usr/bin/env python
"""Headline benchmark: rays/s/chip, forward+backward, robot.stl lens.

Prints ONE JSON line whose required keys are {"metric", "value", "unit",
"vs_baseline"}; additional keys carry the honest-accounting extras:

* pallas_xla_agreement — on-device hit-set agreement + distance-allclose
  rate between the Pallas sweep kernel and the XLA sweep on a 4k-ray
  sample, asserted >= 0.999 every run (the two backends share no kernel
  code);
* breakdown — sweep / select / recompute / backward stage times (ms) for
  the headline shape;
* sweep_gflops — achieved FLOP/s of the sweep stage against the kernel's
  own cost model (ops/pallas_sweep.py cost_estimate), with the device kind
  for roofline context;
* robot_1024 / ellipsoid_512 — BASELINE configs 3 and 2 throughput rows
  (full preset only).

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


def _force(out):
    """Reliable completion barrier: through the axon tunnel the FIRST
    block_until_ready after a fresh dispatch can return early (measured
    1.4 ms for a 4.4 s render); pulling one leaf to host cannot."""
    import jax

    return np.asarray(jax.tree.leaves(out)[0])


def _timeit(fn, inner, *args, reps: int = 5):
    """Median-of-`reps` timing windows, `inner` dispatches per window.

    Single-shot rows proved unable to support claims decided at the 3-5%
    margin (round-4 verdict: the refined-row >=3M bar was met in one
    invocation and missed in another, with the +-5-7% tunnel spread
    captured nowhere), so every timed row now carries
    {median, min, max, n}.  Returns (median_seconds, stats_dict); the
    median feeds every derived scalar, the stats ship in the artifact."""
    import jax

    out = fn(*args)  # compile + warm
    _force(out)      # un-awaited warm work must not bleed into the window
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax.block_until_ready(out)  # not a first dispatch: blocks correctly
        ts.append((time.perf_counter() - t0) / inner)
    med = float(np.median(ts))
    stats = {
        "median_ms": round(med * 1e3, 3),
        "min_ms": round(min(ts) * 1e3, 3),
        "max_ms": round(max(ts) * 1e3, 3),
        "n": reps,
    }
    return med, stats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", choices=["smoke", "full"], default="full")
    parser.add_argument("--res", type=int, default=0, help="ray grid resolution")
    parser.add_argument("--iters", type=int, default=0)
    parser.add_argument("--baseline-rays", type=int, default=0)
    parser.add_argument("--trace", default="", help="save a profiler trace here")
    parser.add_argument("--big-res", type=int, default=1024,
                        help="robot config-3 resolution (full preset)")
    parser.add_argument("--ell-res", type=int, default=512,
                        help="ellipsoid config-2 resolution (full preset)")
    args = parser.parse_args()

    smoke = args.preset == "smoke"
    res = args.res or (64 if smoke else 512)
    iters = args.iters or (2 if smoke else 10)
    baseline_rays = args.baseline_rays or (8 if smoke else 64)
    # timing-window repetitions per row ({median,min,max,n} in the artifact)
    reps = 2 if smoke else 5

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

    # chunking is an SMEM bound, not a throughput knob, and since round 4 it
    # lives inside the library: intersect_rays auto-chunks the ray axis at
    # pallas_sweep.safe_ray_cap(P) (the scalar-prefetch block lists [B, T]
    # must fit the ~1 MB SMEM; B depends on patch count).  chunk_size=0
    # everywhere exercises that guard.
    def loss_fn(params, start, direction):
        return lens_loss(
            params, scene.patches, start, direction, scene.screen_plane,
            jnp.zeros((128, 128), jnp.float32), resolution=128,
        )

    step = jax.jit(jax.value_and_grad(loss_fn))
    start = jnp.asarray(scene.start)
    direction = jnp.asarray(scene.direction)

    # warm-up / compile (+ _force: see the barrier note above)
    loss, grads = step(params, start, direction)
    _force(loss)

    if args.trace:
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(step(params, start, direction))

    t_step, st_step = _timeit(
        step, 2 if smoke else 4, params, start, direction, reps=reps
    )
    rays_per_s = n_rays / t_step

    extras = {}
    # headline spread (rays/s from each window's time)
    extras["value_stats"] = {
        "median": round(n_rays / (st_step["median_ms"] * 1e-3), 1),
        "min": round(n_rays / (st_step["max_ms"] * 1e-3), 1),
        "max": round(n_rays / (st_step["min_ms"] * 1e-3), 1),
        "n": st_step["n"],
    }

    # ---- Pallas vs XLA on-device agreement (4k-ray sample) ----------------
    from cbtr_tpu.ops.intersect import (
        _use_pallas,
        intersect_rays,
        select_candidates,
        sweep_codes_xla,
    )

    sample = 4096
    s4 = start.reshape(-1, 3)[:sample]
    d4 = direction.reshape(-1, 3)[:sample]
    if _use_pallas():
        hit_p = intersect_rays(scene.patches, s4, d4, backend="pallas")
        hit_x = intersect_rays(scene.patches, s4, d4, backend="xla")
        what_p, what_x = np.asarray(hit_p.what), np.asarray(hit_x.what)
        agree = what_p == what_x
        both = agree & (what_p == 4)
        dist_ok = np.isclose(
            np.asarray(hit_p.distance)[both], np.asarray(hit_x.distance)[both],
            rtol=1e-4, atol=1e-4,
        )
        agreement = float((agree.sum() - (~dist_ok).sum()) / sample)
        extras["pallas_xla_agreement"] = round(agreement, 5)
        assert agreement >= 0.999, f"Pallas/XLA agreement {agreement}"

    # ---- stage breakdown + sweep FLOP/s ------------------------------------
    from cbtr_tpu.config import DEFAULT as CFG

    if _use_pallas():
        from cbtr_tpu.ops.pallas_sweep import sweep_codes_pallas as sweep_fn
    else:
        sweep_fn = sweep_codes_xla
    R = min(n_rays, 65536)
    sb = start.reshape(-1, 3)[:R]
    db = direction.reshape(-1, 3)[:R]
    P = scene.patches.num_patches

    sweep_jit = jax.jit(lambda s, d: sweep_fn(scene.patches, s, d))
    t_sweep, st_sweep = _timeit(sweep_jit, 8, sb, db, reps=reps)
    code, dist = sweep_jit(sb, db)
    sel_jit = jax.jit(
        lambda c, di: select_candidates(c, di, scene.patches.neighbours)
    )
    t_select, st_select = _timeit(sel_jit, 8, code, dist, reps=reps)
    full_jit = jax.jit(
        lambda s, d: intersect_rays(scene.patches, s, d)
    )
    t_full, st_full = _timeit(full_jit, 8, sb, db, reps=reps)
    breakdown = {
        "sweep_staged": st_sweep["median_ms"],
        "select_staged": st_select["median_ms"],
        "rays": R,
        "patches": P,
    }
    stats = {"sweep_staged": st_sweep, "select_staged": st_select,
             "full_intersect": st_full}
    if _use_pallas():
        # production path: the FUSED sweep+select kernel (per-pair state
        # never leaves VMEM; select = in-kernel MXU vote matmul)
        from cbtr_tpu.ops.pallas_sweep import sweep_select_pallas

        fused_jit = jax.jit(
            lambda s, d: sweep_select_pallas(scene.patches, s, d)
        )
        t_fused, st_fused = _timeit(fused_jit, 8, sb, db, reps=reps)
        breakdown["fused_sweep_select"] = st_fused["median_ms"]
        breakdown["recompute_rest"] = round(max(t_full - t_fused, 0.0) * 1e3, 3)
        stats["fused_sweep_select"] = st_fused
    else:
        breakdown["recompute_rest"] = round(
            max(t_full - t_sweep - t_select, 0.0) * 1e3, 3
        )
    extras["breakdown_ms"] = breakdown
    extras["breakdown_stats"] = stats

    # ---- cull A/B: block-AABB leg on/off (round-5 verdict ask #1) ----------
    # Executed-(tile x block)-pair fraction straight from the candidate
    # lists the kernel will actually loop over, plus the fused kernel timed
    # both ways at the headline shape.  The AABB leg is provably as
    # conservative as the sphere leg (ops/pallas_sweep._patch_boxes), so
    # winners are identical; only the list lengths (and wall time) move.
    if _use_pallas() and not smoke:
        from cbtr_tpu.ops.pallas_sweep import (
            FUSED_BLOCK_P,
            sweep_select_pallas as _ssp,
            tile_block_lists as _tbl,
        )

        rays_t8 = jnp.concatenate(
            [sb, db, jnp.zeros((R, 2), jnp.float32)], axis=-1
        ).T

        def _exec_frac(use_aabb):
            counts, lists = jax.jit(
                lambda rt: _tbl(scene.patches, rt, 128, FUSED_BLOCK_P,
                                use_aabb)
            )(rays_t8)
            n_blocks = (P + FUSED_BLOCK_P - 1) // FUSED_BLOCK_P
            tiles = rays_t8.shape[1] // 128
            return float(np.asarray(jnp.sum(counts))) / (tiles * n_blocks)

        fused_off = jax.jit(
            lambda s, d: _ssp(scene.patches, s, d, use_aabb=False)
        )
        _, st_fused_off = _timeit(fused_off, 8, sb, db, reps=reps)
        extras["cull"] = {
            "exec_frac_sphere_only": round(_exec_frac(False), 4),
            "exec_frac_with_aabb": round(_exec_frac(True), 4),
            "fused_ms_sphere_only": st_fused_off,
            "fused_ms_with_aabb": stats.get("fused_sweep_select"),
        }

    # ---- winner kernel at small P vs the fused kernel (verdict ask #3) -----
    # Same semantics, different machinery: if the winner kernel ties the
    # fused O(P^2)-vote kernel at P <= 1024 the fused path can be deleted.
    if _use_pallas() and not smoke:
        from cbtr_tpu.models import sphere_lens_scene as _sls
        from cbtr_tpu.ops.pallas_sweep import sweep_winner_pallas as _swp

        rows_wf = {}
        sph = _sls(res=256, sectors=17, belts=10)  # P = 1020 (fused cap)
        for tag, scn_w in (("P450_robot", scene), ("P1020_sphere", sph)):
            sw = jnp.asarray(scn_w.start).reshape(-1, 3)[:R]
            dw = jnp.asarray(scn_w.direction).reshape(-1, 3)[:R]
            f_jit = jax.jit(
                lambda s, d, _p=scn_w.patches: sweep_select_pallas(_p, s, d)
            )
            w_jit = jax.jit(
                lambda s, d, _p=scn_w.patches: _swp(_p, s, d)
            )
            _, st_f = _timeit(f_jit, 8, sw, dw, reps=reps)
            _, st_w = _timeit(w_jit, 8, sw, dw, reps=reps)
            ah_f, win_f, d_f = f_jit(sw, dw)
            ah_w, win_w, d_w = w_jit(sw, dw)
            ah_f, ah_w = np.asarray(ah_f), np.asarray(ah_w)
            same = (ah_f == ah_w)
            hit_both = same & ah_f
            same_win = np.asarray(win_f)[hit_both] == np.asarray(win_w)[hit_both]
            rows_wf[tag] = {
                "patches": int(scn_w.patches.num_patches),
                "fused_ms": st_f,
                "winner_ms": st_w,
                "agreement": round(
                    float((same.sum() - (~same_win).sum()) / same.size), 5
                ),
            }
            assert rows_wf[tag]["agreement"] >= 0.999, rows_wf[tag]
        extras["winner_vs_fused"] = rows_wf
    # the sweep's own flops model (ops/pallas_sweep.py cost_estimate)
    flops_pair = 1300 * CFG.root_search_iterations // 4 + 400
    extras["sweep_gflops"] = round(flops_pair * R * P / t_sweep / 1e9, 1)
    extras["device"] = jax.devices()[0].device_kind

    # ---- measured VPU roofline -> MFU --------------------------------------
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(
        _os.path.abspath(__file__)), "benchmarks"))
    from vpu_peak import measure_vpu_peak

    # The peak is a DEVICE PROPERTY, but the slope microbenchmark is
    # CPU-contention-sensitive through the tunnel (r03 recorded 3.895,
    # r04 2.082 — same chip).  A contended run can only UNDER-measure, so
    # report max-of-N with the per-run values visible (round-4 verdict,
    # weak #1).
    peak_runs = [measure_vpu_peak(timing_iters=3 if smoke else 5)
                 for _ in range(2 if smoke else 3)]
    # outlier rejection before the max: the slope method can occasionally
    # return physically impossible rates (dispatch dedup/pipelining — the
    # microbenchmark's own documented failure mode; one driver run read
    # 13.8 TFLOP/s on a ~4 TFLOP/s VPU).  A broken run OVER-measures
    # wildly while a contended run can only under-measure, so anchor on
    # the MINIMUM (always physically real) and drop runs > 2x it — robust
    # even when a majority of the runs are broken, which a median anchor
    # is not.
    lo_anchor = min(peak_runs)
    valid = [p for p in peak_runs if p <= 2.0 * lo_anchor] or peak_runs
    peak = max(valid)
    extras["vpu_peak_tflops"] = round(peak / 1e12, 3)
    extras["vpu_peak_runs_tflops"] = [round(p / 1e12, 3) for p in peak_runs]
    # effective MFU = cull-credited model FLOPs / measured sustained peak
    # (can exceed 1: the cull skips work the model counts); the *executed*
    # no-cull rate is ~2.0 TFLOP/s (PERF.md roofline section)
    extras["sweep_mfu_effective"] = round(
        flops_pair * R * P / t_sweep / peak, 3
    )

    # ---- recompute acceptance cross-check (weak #6 of round 2) ------------
    from cbtr_tpu.ops.intersect import recompute_winner

    code4, dist4 = sweep_fn(scene.patches, s4, d4)
    ah4, win4, _ = select_candidates(code4, dist4, scene.patches.neighbours)
    _, n_reject = recompute_winner(
        scene.patches, s4, d4, ah4, win4, with_check=True
    )
    extras["recompute_reject_count"] = int(n_reject)
    assert int(n_reject) <= max(1, sample // 1000), (
        f"sweep-accepted winners rejected by recompute: {int(n_reject)}"
    )

    # ---- BASELINE configs 2 and 3 (full preset) ----------------------------
    if not smoke:
        from cbtr_tpu.models import ellipsoid_lens_scene

        big = robot_lens_scene(res=args.big_res)
        sb_, db_ = jnp.asarray(big.start), jnp.asarray(big.direction)
        pb = params_from_scene(big)

        def loss_big(p, s, d):
            return lens_loss(
                p, big.patches, s, d, big.screen_plane,
                jnp.zeros((128, 128), jnp.float32), resolution=128,
            )

        step_big = jax.jit(jax.value_and_grad(loss_big))
        t_big, st_big = _timeit(step_big, 2, pb, sb_, db_, reps=reps)
        extras[f"robot_{args.big_res}"] = {
            "rays": int(sb_.shape[0]),
            "rays_per_s": round(sb_.shape[0] / t_big, 1),
            "stats_ms": st_big,
        }

        ell = ellipsoid_lens_scene(res=args.ell_res, sectors=15, belts=5)
        se, de = jnp.asarray(ell.start), jnp.asarray(ell.direction)
        pe = params_from_scene(ell)

        def loss_ell(p, s, d):
            return lens_loss(
                p, ell.patches, s, d, ell.screen_plane,
                jnp.zeros((128, 128), jnp.float32), resolution=128,
            )

        step_ell = jax.jit(jax.value_and_grad(loss_ell))
        t_ell, st_ell = _timeit(step_ell, 4, pe, se, de, reps=reps)
        extras[f"ellipsoid_{args.ell_res}"] = {
            "rays": int(se.shape[0]),
            "patches": int(ell.patches.num_patches),
            "rays_per_s": round(se.shape[0] / t_ell, 1),
            "stats_ms": st_ell,
        }

        # ---- large-P rows on hardware ------------------------------------
        # All three route onto the winner kernel (in-kernel argmin +
        # voter-side retry, patch-chunked at 4096): refined (P=1800, one
        # 2048 chunk), split-4 (P=7200, two 4096 chunks) and split-6
        # (P=16200, four chunks — the scale the old 2D streaming kernel
        # covered, now with O(R+P) HBM instead of 8 B/pair).  Each row
        # carries an on-device Pallas/XLA agreement check at that shape;
        # the split-6 scene build doubles as the preprocess wall-time row
        # (native C++ runtime by default since round 4).
        t0p = time.perf_counter()
        scn6 = robot_lens_scene(res=256, split=6)
        split6_build_s = time.perf_counter() - t0p
        from cbtr_tpu import native as _native

        extras["preprocess_split6"] = {
            "faces": int(scn6.patches.num_patches) // 3,
            "scene_build_s": round(split6_build_s, 3),
            "native_runtime": _native.available(),
        }
        # direct preprocess-stage timing (weld + orient + topology +
        # averages) on the split-6 mesh, native C++ vs the NumPy oracle
        from cbtr_tpu.harness import preprocess as _pre
        from cbtr_tpu.mesh.core import TriMesh as _TM

        from cbtr_tpu.models.scenes import robot_stl_path as _robot_path

        _m = _TM().read(_robot_path())
        _m = _pre(_m)
        _c = _m.tris.reshape(-1, 3).mean(axis=0)
        _m.translate(-_c)
        _m.scale(1.0 / float(np.abs(_m.tris).max()))
        _m = _pre(_m)
        _m.split_triangles(6)
        _tris6 = _m.tris.copy()
        if _native.available():
            t0p = time.perf_counter()
            _pre(_TM(_tris6.copy()))
            extras["preprocess_split6"]["native_s"] = round(
                time.perf_counter() - t0p, 4
            )
        t0p = time.perf_counter()
        _pre(_TM(_tris6.copy()), use_native=False)
        extras["preprocess_split6"]["numpy_s"] = round(
            time.perf_counter() - t0p, 4
        )
        # Each large-P row is measured in a FRESH SUBPROCESS (same pattern
        # as the fast_newton row): round-5 measured that by the time these
        # rows ran, the long-lived bench process (holding the headline /
        # 1024 / ellipsoid executables + buffers) slowed the identical
        # winner-kernel call from ~22 ms (solo probe AND a fresh process)
        # to ~35 ms — a +13 ms process-state tax that made rounds
        # incomparable.  The persistent compile cache keeps the subprocess
        # cost to scene build + 5 timed windows.
        largep_script = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from cbtr_tpu.models import robot_lens_scene
from cbtr_tpu.ops.intersect import intersect_rays, _use_pallas
kw = json.loads(sys.argv[1])
reps = int(sys.argv[2])
sample = int(sys.argv[3])
scn = robot_lens_scene(res=256, **kw)
sl = jnp.asarray(scn.start).reshape(-1, 3)
dl = jnp.asarray(scn.direction).reshape(-1, 3)
def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 8)
    return {"median_ms": round(float(np.median(ts)) * 1e3, 3),
            "min_ms": round(min(ts) * 1e3, 3),
            "max_ms": round(max(ts) * 1e3, 3), "n": reps}
big_jit = jax.jit(lambda s, d: intersect_rays(scn.patches, s, d))
st = timeit(big_jit, sl, dl)
row = {"rays": int(sl.shape[0]),
       "patches": int(scn.patches.num_patches),
       "intersect_rays_per_s": round(
           sl.shape[0] / (st["median_ms"] * 1e-3), 1),
       "stats_ms": st}
if _use_pallas():
    from cbtr_tpu.ops.pallas_sweep import sweep_winner_pallas as swp
    for tag, aabb in (("winner_ms_sphere_only", False),
                      ("winner_ms_with_aabb", True)):
        wj = jax.jit(lambda s, d, _a=aabb: swp(scn.patches, s, d, use_aabb=_a))
        row[tag] = timeit(wj, sl, dl)
    hp = intersect_rays(scn.patches, sl[:sample], dl[:sample],
                        backend="pallas")
    # the XLA oracle materializes [R, P, 3, 10] control-point
    # intermediates - 7.4 GB at (4096, 16200) - so chunk its ray axis
    hx = intersect_rays(scn.patches, sl[:sample], dl[:sample],
                        chunk_size=512, backend="xla")
    wp, wx = np.asarray(hp.what), np.asarray(hx.what)
    agree_l = wp == wx
    bt = agree_l & (wp == 4)
    d_ok = np.isclose(np.asarray(hp.distance)[bt],
                      np.asarray(hx.distance)[bt], rtol=1e-4, atol=1e-4)
    row["pallas_xla_agreement"] = round(
        float((agree_l.sum() - (~d_ok).sum()) / sample), 5)
    assert row["pallas_xla_agreement"] >= 0.999, row
print("ROW " + json.dumps(row))
"""
        import os as _os4
        import subprocess as _sp4
        import sys as _sys4

        for label, kw in (("robot_refined", {"refine": True}),
                          ("robot_split4", {"split": 4}),
                          ("robot_split6", {"split": 6})):
            proc = None  # don't attribute a previous row's stderr on failure
            try:
                proc = _sp4.run(
                    [_sys4.executable, "-c", largep_script,
                     json.dumps(kw), str(reps), str(sample)],
                    capture_output=True, text=True, timeout=2400,
                    env=dict(_os4.environ),
                    cwd=_os4.path.dirname(_os4.path.abspath(__file__)),
                )
                line = [ln for ln in proc.stdout.splitlines()
                        if ln.startswith("ROW ")][-1]
                extras[label] = json.loads(line[4:])
            except Exception as e:  # report, don't fail the artifact
                extras[label] = {
                    "error": f"{type(e).__name__}: {e}"[:200],
                    "stderr": proc.stderr[-400:] if proc is not None else "",
                }

    # ---- ray sorting: measure the claimed coherence win (full preset) ------
    if not smoke:
        from cbtr_tpu.render.ray_sort import (
            coherence_keys,
            intersect_rays_sorted,
        )
        from cbtr_tpu.render.emitters import UniformHemisphere
        from cbtr_tpu.ops.pallas_sweep import BLOCK_P, TILE_R, patch_spheres

        def _block_skip_rate(s_np, d_np):
            """Host replay of the kernel's sphere cull: fraction of
            (128-ray tile x 32-patch block) pairs with zero sphere hits."""
            c, r = map(np.asarray, patch_spheres(scene.patches))
            rel = c[None] - s_np[:, None]                    # [R,P,3]
            t_ca = np.einsum("rpk,rk->rp", rel, d_np)
            rel2 = np.einsum("rpk,rpk->rp", rel, rel)
            r2 = r[None] ** 2
            hit = ((rel2 - t_ca ** 2) <= r2) & ((t_ca >= 0) | (rel2 <= r2))
            Rr = (hit.shape[0] // TILE_R) * TILE_R
            Pb = (hit.shape[1] // BLOCK_P) * BLOCK_P
            tiles = hit[:Rr, :Pb].reshape(
                Rr // TILE_R, TILE_R, Pb // BLOCK_P, BLOCK_P
            ).any(axis=(1, 3))
            return 1.0 - float(tiles.mean())

        rngs = np.random.default_rng(0)
        s_np = np.asarray(start.reshape(-1, 3)[:R])
        d_np = np.asarray(direction.reshape(-1, 3)[:R])
        perm = rngs.permutation(R)
        s_sh, d_sh = s_np[perm], d_np[perm]  # shuffled ortho grid

        sorted_jit = jax.jit(
            lambda s, d: intersect_rays_sorted(scene.patches, s, d)
        )
        t_shuf, st_shuf = _timeit(full_jit, 8, jnp.asarray(s_sh),
                                  jnp.asarray(d_sh), reps=reps)
        t_shuf_sorted, st_shuf_sorted = _timeit(
            sorted_jit, 8, jnp.asarray(s_sh), jnp.asarray(d_sh), reps=reps
        )
        morton_order = np.argsort(
            np.asarray(coherence_keys(s_sh, d_sh)), kind="stable"
        )

        em = UniformHemisphere(belts=16, seed=1)
        d_em, patch_em = em.sample(R)
        s_em = np.zeros((R, 3), np.float32)
        order = np.argsort(patch_em, kind="stable")
        t_em, st_em = _timeit(full_jit, 8, jnp.asarray(s_em),
                              jnp.asarray(d_em), reps=reps)
        t_em_sorted, st_em_sorted = _timeit(full_jit, 8,
                                            jnp.asarray(s_em[order]),
                                            jnp.asarray(d_em[order]),
                                            reps=reps)
        extras["ray_sort"] = {
            "ortho_ms": st_full,
            "shuffled_ms": st_shuf,
            "shuffled_sorted_ms": st_shuf_sorted,
            "emitter_ms": st_em,
            "emitter_sorted_ms": st_em_sorted,
            "skip_ortho": round(_block_skip_rate(s_np, d_np), 3),
            "skip_shuffled": round(_block_skip_rate(s_sh, d_sh), 3),
            "skip_shuffled_sorted": round(
                _block_skip_rate(s_sh[morton_order], d_sh[morton_order]), 3
            ),
            "skip_emitter": round(_block_skip_rate(s_em, d_em), 3),
            "skip_emitter_sorted": round(
                _block_skip_rate(s_em[order], d_em[order]), 3
            ),
        }

    # ---- emitter-illumination fit: one train step on point-source rays ----
    # the reference's motivating use case (car-lamp optics,
    # reference/README.md:159-165): hemisphere-emitter rays, bin-sorted
    # (the production emitter sort), full fwd+bwd against an image target.
    if not smoke:
        from cbtr_tpu.models.fit import emitter_rays

        s_ef, d_ef = emitter_rays(R, belts=16, seed=1)
        loss_ef, grads_ef = step(params, s_ef, d_ef)
        _force(loss_ef)
        t_ef, st_ef = _timeit(step, 4, params, s_ef, d_ef, reps=reps)
        gn = float(jnp.linalg.norm(grads_ef.control_points))
        assert np.isfinite(float(loss_ef)) and np.isfinite(gn) and gn > 0
        extras["emitter_fit"] = {
            "rays": R,
            "rays_per_s_fwd_bwd": round(R / t_ef, 1),
            "stats_ms": st_ef,
            "loss": float(loss_ef),
            "grad_cp_norm": round(gn, 6),
        }

    # ---- opt-in fast-math Newton (config.fast_newton) ---------------------
    # trace-time-captured flag -> measured in a fresh subprocess at the
    # breakdown shape; reported next to the default-divide fused time so
    # both rates ship in every BENCH artifact.
    if not smoke and _use_pallas():
        import os as _os2
        import subprocess as _sp
        import sys as _sys2

        fast_script = r"""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys as _s
from cbtr_tpu.config import DEFAULT as CFG
if _s.argv[-1] != "default":
    object.__setattr__(CFG, "fast_newton", True)
import jax.numpy as jnp
from cbtr_tpu.models import robot_lens_scene
from cbtr_tpu.ops.pallas_sweep import sweep_select_pallas
scene = robot_lens_scene(res=256)
s = jnp.asarray(scene.start).reshape(-1, 3)
d = jnp.asarray(scene.direction).reshape(-1, 3)
fn = jax.jit(lambda s_, d_: sweep_select_pallas(scene.patches, s_, d_))
out = fn(s, d)
import numpy as _np
_np.asarray(out[2])  # force: first block_until_ready can return early
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(s, d)
    jax.block_until_ready(out)
    ts.append((time.perf_counter() - t0) / 8)
print(json.dumps({"fused_ms": round(float(_np.median(ts)) * 1e3, 3),
                  "fused_ms_min": round(min(ts) * 1e3, 3),
                  "fused_ms_max": round(max(ts) * 1e3, 3), "n": len(ts),
                  "hits": int(jnp.sum(out[0]))}))
"""
        env = dict(_os2.environ)
        try:
            proc = _sp.run(
                [_sys2.executable, "-c", fast_script], capture_output=True,
                text=True, timeout=1500, env=env,
                cwd=_os2.path.dirname(_os2.path.abspath(__file__)),
            )
            fast = json.loads(proc.stdout.strip().splitlines()[-1])
            # default-divide baseline measured in an EQUALLY FRESH
            # subprocess: comparing a fresh-process experiment against the
            # aged bench process's fused time biases the speedup (the
            # per-dispatch process-state tax, see the PERF measurement
            # note) — both sides of an A/B must share process state.
            proc_d = _sp.run(
                [_sys2.executable, "-c", fast_script, "default"],
                capture_output=True, text=True, timeout=1500, env=env,
                cwd=_os2.path.dirname(_os2.path.abspath(__file__)),
            )
            fused_default = json.loads(
                proc_d.stdout.strip().splitlines()[-1])["fused_ms"]
            extras["fused_default_subprocess_ms"] = fused_default
            extras["fast_newton"] = {
                "fused_ms": fast["fused_ms"],
                "fused_ms_min": fast.get("fused_ms_min"),
                "fused_ms_max": fast.get("fused_ms_max"),
                "n": fast.get("n"),
                "default_fused_ms": fused_default,
                "speedup": round(fused_default / fast["fused_ms"], 3)
                if fused_default else None,
                "hits": fast["hits"],
            }
        except Exception as e:  # report, don't fail the artifact
            extras["fast_newton"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- opt-in bf16-accumulation sweep (config.bf16_sweep) ---------------
    # round-5 verdict ask #4: measure the sub-f32 sweep both ways on
    # hardware.  Fresh subprocess (trace-time flag), reporting rate AND
    # per-ray winner agreement vs the in-process f32 fused result.
    if not smoke and _use_pallas():
        bf16_script = r"""
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys as _s
from cbtr_tpu.config import DEFAULT as CFG
if _s.argv[-1] != "default":
    object.__setattr__(CFG, "bf16_sweep", True)
import jax.numpy as jnp
from cbtr_tpu.models import robot_lens_scene
from cbtr_tpu.ops.pallas_sweep import sweep_select_pallas
scene = robot_lens_scene(res=256)
s = jnp.asarray(scene.start).reshape(-1, 3)
d = jnp.asarray(scene.direction).reshape(-1, 3)
fn = jax.jit(lambda s_, d_: sweep_select_pallas(scene.patches, s_, d_))
out = fn(s, d)
np.asarray(out[2])  # tunnel barrier
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(s, d)
    jax.block_until_ready(out)
    ts.append((time.perf_counter() - t0) / 8)
ah = np.asarray(out[0]); win = np.asarray(out[1])
np.savez(_s.argv[1], ah=ah, win=win)
print(json.dumps({"fused_ms": round(float(np.median(ts)) * 1e3, 3),
                  "fused_ms_min": round(min(ts) * 1e3, 3),
                  "fused_ms_max": round(max(ts) * 1e3, 3), "n": len(ts),
                  "hits": int(ah.sum())}))
"""
        import os as _os3
        import subprocess as _sp2
        import sys as _sys3

        # Winner agreement must compare IDENTICAL RAY SETS: both the bf16
        # and the f32-default run are subprocesses over the same res=256
        # scene, dumping winners to npz.  (An earlier version compared the
        # bf16 subprocess's res=256 grid against the first 65,536 rays of
        # the in-process res=512 grid — spatially different rays — which
        # made the recorded agreement measure grid mismatch, not bf16
        # error.)
        try:
            outs = {}
            for mode in ("bf16", "default"):
                win_path = f"/tmp/cbtr_bf16_{mode}.npz"
                proc = _sp2.run(
                    [_sys3.executable, "-c", bf16_script, win_path, mode],
                    capture_output=True, text=True, timeout=1500,
                    env=dict(_os3.environ),
                    cwd=_os3.path.dirname(_os3.path.abspath(__file__)),
                )
                outs[mode] = (
                    json.loads(proc.stdout.strip().splitlines()[-1]),
                    np.load(win_path),
                )
            bf, wb = outs["bf16"]
            df, wf = outs["default"]
            ah_f = wf["ah"].astype(bool)
            ah_b = wb["ah"].astype(bool)
            same = ah_f == ah_b
            bothb = same & ah_f
            same_w = wf["win"][bothb] == wb["win"][bothb]
            extras["bf16_sweep"] = {
                **bf,
                "default_fused_ms": df["fused_ms"],
                "speedup": round(df["fused_ms"] / bf["fused_ms"], 3),
                "winner_agreement": round(
                    float((same.sum() - (~same_w).sum()) / same.size), 5
                ),
            }
        except Exception as e:  # report, don't fail the artifact
            extras["bf16_sweep"] = {"error": f"{type(e).__name__}: {e}"[:200]}

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
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
