"""Central configuration: every tunable constant of the pipeline.

All values default to the reference implementation's constants so that the
TPU build reproduces its numerical behaviour exactly:

- general epsilons            -> reference/3dGeomUtil.h:19-20, :219
- vertex welding / normals    -> reference/mesh.h:20-22
- Bezier construction         -> reference/bezierTriangle.h:53-62
- thick-patch refinement      -> reference/bezierMesh.h:12-14
- refraction cutoffs          -> reference/bezierLens.h:16-17
"""
from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class Config:
    # --- global geometry epsilons (3dGeomUtil.h:19-20) ---
    general_epsilon: float = 1.0e-5
    ray_plane_intersection_epsilon: float = 1.0e-5  # Plane::csRayPlaneIntersectionEpsilon (3dGeomUtil.h:219)
    a_perpendicular_epsilon: float = 1.0e-10        # util::getAperpendicular (3dGeomUtil.h:81)

    # --- mesh preprocessing (mesh.h:20-22) ---
    standardize_vertices_epsilon_factor: float = 0.2
    standardize_normals_epsilon: float = 0.01
    standardize_normals_independent_move_factor: float = 0.2

    # --- Bezier triangle construction (bezierTriangle.h:53-62) ---
    proportion_control_on_original_side: float = 0.291
    proportion_control_on_original_vertex_centroid: float = 0.304
    proportion_control_on_original_median: float = 0.2
    height_safety_factor: float = 1.33333333
    root_search_iterations: int = 4
    height_sample_divisor: int = 5
    max_intersection_distance_from_ray: float = 0.01
    minimal_ray_distance: float = 1.0
    intersection_estimation_epsilon: float = 1.0e-6

    # Improvement over the reference (not a reference constant): clamp the
    # secant-style first estimate into the [closer, further] bracket.  The
    # reference's unclamped secant (bezierTriangle.cpp:137-152) can
    # extrapolate far outside the bracket on concave geometry (e.g. the
    # dimpled solid's waist) and lose real exit hits; clamping recovers them
    # and is a no-op whenever the estimate already lies inside the bracket.
    # Set False for strict reference-parity semantics.
    #
    # TRACE-TIME CAPTURE: this flag (like every Config field) is read while
    # Python traces the jitted/Pallas functions.  Set it BEFORE the first
    # call in the process — toggling later is silently ignored by the
    # jit/Mosaic compilation caches.  tests/test_parity_refraction.py pins
    # the flag=False (strict upstream) semantics in a fresh subprocess.
    clamp_secant_estimate: bool = True

    # Opt-in fast-math — measured PERF-NEUTRAL, default OFF (not a
    # reference constant): replace the ~12 hardware divides per
    # (ray, patch) Newton evaluation in the Pallas sweep kernels with an
    # exponent-negation reciprocal approximation + 2 Newton refinements
    # (~6e-6 relative error, pure mul/sub VPU ops).  The measurement
    # history is itself the record: round 3's roofline ESTIMATED ~1.3x,
    # round 4 measured 0.66-0.73x "slower", and round 5 found BOTH numbers
    # were tunnel-latency artifacts (PERF.md measurement note) — the fair
    # steady-state A/B (matched fresh subprocesses, 8 dispatches/window)
    # reads 5.85 vs 5.79 ms: a 1% wash.  OFF stays the default because the
    # trick buys nothing and shifts sweep acceptance/distance by ~1e-5
    # (bounded by the recompute_reject_count guard); the differentiable
    # winner recompute stays exact either way.
    #
    # TRACE-TIME CAPTURE: like clamp_secant_estimate, read during trace —
    # set BEFORE the first jit/Pallas call in the process
    # (tests/test_fast_newton.py pins both settings in fresh subprocesses).
    fast_newton: bool = False

    # Opt-in sub-f32 sweep experiment (round-5 verdict ask #4; default OFF
    # preserves exact f32 sweep arithmetic): run the Pallas sweep tile's
    # Bernstein-interpolate / directional-derivative POLYNOMIAL
    # ACCUMULATIONS in bfloat16; brackets, compares, and acceptance stay
    # f32 (a full-bf16 tile does not compile — Mosaic rejects the bf16
    # compare layout), the emitted distance is f32, and the differentiable
    # winner recompute is exact-f32 as always.  bf16's 8-bit mantissa is
    # far below the acceptance epsilons, so acceptance flips are expected —
    # recompute_reject_count and the BENCH agreement row quantify them;
    # see BENCH_r05 bf16_sweep for the measured rate/agreement verdict
    # (0.83x, slower — rejected; PERF.md round-5 item 3).
    #
    # TRACE-TIME CAPTURE: read during trace — set BEFORE the first
    # jit/Pallas call in the process.
    bf16_sweep: bool = False

    # --- thick-patch refinement (bezierMesh.h:12-14) ---
    sample_ratios_original_side: tuple = (0.25, 0.5, 0.75)
    bezier_height_per_perimeter_limit: float = 0.03
    split_bezier_interpolate_factor: float = 0.7

    # --- refraction (bezierLens.h:16-17) ---
    max_sin2_refraction: float = 0.99
    min_sin2_refraction: float = 1.0e-12


PI = math.pi

DEFAULT = Config()
