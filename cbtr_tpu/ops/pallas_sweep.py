"""Pallas TPU kernel for the intersection sweep stage.

Computes, for every (ray, patch) pair, the gate-OFF candidate code
``what | (in_domain << 3)`` and the along-ray distance — the quantities
`select_candidates` needs (see ops/intersect.py for the three-stage
decomposition).  Same math as `sweep_codes_xla`, hand-laid-out for the VPU:

* **patches live on the sublane axis (8/tile), rays on the lane axis
  (128/tile)**, so every per-pair quantity is an [8, TILE_R] f32 tile —
  exactly one vreg.  This orientation makes the bounding-sphere tile cull
  far more selective than the transposed one: a tile is skippable iff *8*
  spatially-local patches miss *128* coherent rays (83% of tiles skip on
  the robot lens with block-ordered rays, vs 45% when a tile needed all of
  128 patches to miss);
* per-patch state is staged as a row-major [P, 64] table (sublanes =
  patches, lanes = features) so a feature column broadcasts along lanes;
  per-ray state as an [8, R] table (rows = features) so a ray row
  broadcasts along sublanes;
* the fixed 4-iteration Newton root search (reference/bezierTriangle.h:58)
  is statically unrolled; all control flow is `jnp.where` masks — zero
  divergence, zero dynamic shapes;
* padding rows are all-zero -> zero plane normal -> |cos| < epsilon ->
  WHAT_NONE, so padded patches can never win.

The kernel runs under `interpret=True` off-TPU so CPU tests exercise the
same code path bit-for-bit (modulo float associativity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DEFAULT as CFG
from ..bezier.patches import BezierPatches

# feature-column layout of the row-major [P, 64] patch table
_ROW_CP = 0        # 30 cols: control point k at cols (3k, 3k+1, 3k+2)
_ROW_PLANE = 30    # 4 cols: underlying plane nx, ny, nz, c
_ROW_BINV = 34     # 9 cols: barycentric inverse, row-major
_ROW_H = 43        # 2 cols: heights (inside, outside)
_ROW_DB = 45       # 3 cols: second derivative direction
_ROW_DIV = 48      # 12 cols: 3 divider planes x (nx, ny, nz, c)
_ROW_BSPHERE = 60  # 4 cols: bounding sphere cx, cy, cz, radius (inflated)
_N_ROWS = 64       # padded to a multiple of the 128-lane register width / 2

_WHAT_NONE = 3
_WHAT_INTERSECT = 4

# tile shape: patches on sublanes (8 = the f32 sublane minimum), 128 rays
# on lanes (see module docstring)
TILE_R = 128

# LEGACY default block size, retained for the generic helpers'
# (block_spheres / tile_block_lists / sweep_codes_pallas) signatures.  It
# was the round-2/3 optimum for the resident kernel WITHOUT scalar-prefetch
# lists (loop-trip floor vs skip granularity).  The production kernels are
# tuned separately — use FUSED_BLOCK_P / WINNER_BLOCK_P (= 16, measured
# below) for anything on the hot path.
BLOCK_P = 32

# block sizes of the two production kernels' candidate lists, tuned on
# hardware per path.  With the scalar-prefetch lists the old "all-skip
# floor" is gone, so the tradeoff is listed-block loop overhead vs cull
# granularity: a host replay of the sphere cull on the refined robot shows
# executed pairs drop 42% -> 31% -> 25% at 32 -> 16 -> 8, but the 2x loop
# trips at 8 eat the extra skips.  Measured on v5e, 65536 rays:
#   fused  P=450   32/16/8 = 12.67 / 12.11 / 13.23 ms
#   winner P=1800  32/16/8 = 36.83 / 33.12 / 39.63 ms
#   winner P=7200  32/16/8 = 35.25 / 34.65 / 42.94 ms
# -> 16 is the optimum for both paths.  (A front-to-back early-exit
# variant — lists sorted by sphere-entry distance, in-kernel stop once
# every ray's best beats the next entry — was built and measured SLOWER at
# every shape: 14.34 / 37.80 / 42.55 ms at block 16.  The per-block
# vector->scalar max + SMEM done-flag serializes the loop, and any tile
# containing a ray that never finds a hit can never exit.  Rejected.)
# Re-verified in round 5 AFTER the AABB list leg shortened the candidate
# lists 2.7x (the 8-vs-16 tradeoff could have flipped): steady-state
# inner=8 medians, fused P=450 8/16/32 = 6.15/5.97/6.37 ms, winner P=1800
# 14.75/13.47/15.35 ms -> 16 still optimal for both paths.
FUSED_BLOCK_P = 16
WINNER_BLOCK_P = 16


def _fast_recip(x):
    """Approximate reciprocal: exponent-negation bit trick + 2 Newton
    refinements (measured relative error < 7e-6 over 1e-12..1e12), all
    single-pass VPU mul/sub ops instead of the multi-pass hardware divide.
    Identical bits on TPU and in interpret mode (no backend intrinsics)."""
    ax = jnp.abs(x)
    i = jax.lax.bitcast_convert_type(ax, jnp.int32)
    r = jax.lax.bitcast_convert_type(jnp.int32(0x7EF311C3) - i, jnp.float32)
    r = r * (2.0 - ax * r)
    r = r * (2.0 - ax * r)
    return jnp.where(x < 0.0, -r, r)


def _safe_div(num, den, eps=1e-12):
    den_safe = jnp.where(jnp.abs(den) < eps, jnp.where(den < 0, -eps, eps), den)
    if CFG.fast_newton and den_safe.dtype == jnp.float32:
        # opt-in fast-math (config.fast_newton, trace-time captured): the
        # Newton body's divides are its non-FMA cost center (PERF.md
        # roofline: ~47% of executed time is the non-FMA mix)
        return num * _fast_recip(den_safe)
    return num / den_safe


def _sphere_hit(row, sx, sy, sz, dx, dy, dz):
    """Bounding-sphere cull test (the Ritter cull the reference declared but
    never implemented: reference/3dGeomUtil.h:351-362, README.md:194).
    Patch surface ⊂ convex hull of its control net ⊂ the packed (inflated)
    sphere."""
    bcx, bcy, bcz = row(_ROW_BSPHERE), row(_ROW_BSPHERE + 1), row(_ROW_BSPHERE + 2)
    brad = row(_ROW_BSPHERE + 3)
    relx, rely, relz = bcx - sx, bcy - sy, bcz - sz
    t_ca = relx * dx + rely * dy + relz * dz
    rel2 = relx * relx + rely * rely + relz * relz
    r2 = brad * brad
    return ((rel2 - t_ca * t_ca) <= r2) & ((t_ca >= 0.0) | (rel2 <= r2))


def _sweep_kernel_resident(counts_ref, lists_ref, rays_ref, patch_ref,
                           code_ref, dist_ref):
    """1D-grid kernel: one invocation per 128-ray tile with the ENTIRE patch
    table VMEM-resident; 32-patch blocks stream through an in-kernel loop
    behind the sphere cull.

    Why: the 2D grid pays grid-sequencing + DMA overhead per tile whether or
    not `pl.when` skips the Newton block — measured on the robot 512x512
    bench shape (65536 rays x 450 patches), 76% of 8-patch tiles are
    sphere-skippable yet the 2D kernel ran at ~full-work time (13.7 ms vs a
    24.6 ms no-cull run).  In-kernel blocks make a skipped block cost just
    the sphere test + a scalar branch; with the measured BLOCK_P=32 optimum
    the same shape runs in 8.3 ms (4.1 ms loop floor + 4.2 ms surviving
    Newton work).  The scalar-prefetched counts/lists (tile_block_lists)
    then delete the floor for merged-sphere-skippable blocks entirely: the
    loop visits only this tile's candidate blocks.
    """
    i = pl.program_id(0)
    nb = counts_ref[i]
    rays = rays_ref[:]                    # [8, TILE_R]
    sx, sy, sz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]

    code_ref[:] = jnp.full(code_ref.shape, _WHAT_NONE, jnp.int32)
    dist_ref[:] = jnp.zeros(dist_ref.shape, jnp.float32)

    def body(k, carry):
        off = lists_ref[k, i] * BLOCK_P
        pt = patch_ref[pl.ds(off, BLOCK_P), :]   # [BLOCK_P, 64]

        def row(j):
            return pt[:, j:j + 1]

        sphere_hit = _sphere_hit(row, sx, sy, sz, dx, dy, dz)

        @pl.when(jnp.any(sphere_hit))
        def _compute():
            code, dist = _sweep_tile(row, sx, sy, sz, dx, dy, dz)
            code_ref[pl.ds(off, BLOCK_P), :] = code
            dist_ref[pl.ds(off, BLOCK_P), :] = dist

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


def _sweep_tile(row, sx, sy, sz, dx, dy, dz):
    """Full candidate evaluation for an 8-patch x TILE_R-ray tile; returns
    (code, dist) arrays."""
    # sub-f32 sweep experiment (config.bf16_sweep, trace-time captured):
    # run the Bernstein interpolate / directional-derivative POLYNOMIAL
    # ACCUMULATIONS — the FLOP-heavy part of the Newton body — in bfloat16,
    # keeping brackets, compares, and acceptance in f32.  (A full-bf16 tile
    # does not compile: Mosaic rejects the bf16 compare layout with
    # 'Invalid relayout ... vector<16x128xi1>', measured round 5.)  The
    # emitted distance stays f32 and the differentiable winner recompute is
    # exact-f32 regardless.
    acc_dtype = jnp.bfloat16 if CFG.bf16_sweep else jnp.float32
    nx, ny, nz, c = (row(_ROW_PLANE + k) for k in range(4))
    h_in, h_out = row(_ROW_H), row(_ROW_H + 1)

    # ray x underlying plane (reference/bezierTriangle.cpp:124-126)
    cos_inc = dx * nx + dy * ny + dz * nz
    dist0 = _safe_div(c - (sx * nx + sy * ny + sz * nz), cos_inc)
    valid = (jnp.abs(cos_inc) >= CFG.ray_plane_intersection_epsilon) & (dist0 > 0.0)
    valid &= (jnp.abs(dist0) > -h_in) & (jnp.abs(dist0) > h_out)

    m = [row(_ROW_BINV + k) for k in range(9)]

    def bary_of(px, py, pz):
        b0 = m[0] * px + m[1] * py + m[2] * pz
        b1 = m[3] * px + m[4] * py + m[5] * pz
        b2 = m[6] * px + m[7] * py + m[8] * pz
        return b0, b1, b2

    p0x = sx + dist0 * dx
    p0y = sy + dist0 * dy
    p0z = sz + dist0 * dz
    b0, b1, b2 = bary_of(p0x, p0y, p0z)
    in_dom = (
        (b0 >= 0.0) & (b0 <= 1.0)
        & (b1 >= 0.0) & (b1 <= 1.0)
        & (b2 >= 0.0) & (b2 <= 1.0)
    )

    # tame dead lanes (gradient-free here, but keeps inf/NaN out of the VPU)
    dist0 = jnp.where(valid, dist0, 1.0)
    cos_inc = jnp.where(valid, cos_inc, 1.0)

    # bracket along the ray (reference/bezierTriangle.cpp:132-135)
    d_in = _safe_div(h_in, cos_inc)
    d_out = _safe_div(h_out, cos_inc)
    going = cos_inc > 0.0
    closer = dist0 + jnp.where(going, d_in, d_out)
    further = dist0 + jnp.where(going, d_out, d_in)

    cpx = [row(3 * k) for k in range(10)]
    cpy = [row(3 * k + 1) for k in range(10)]
    cpz = [row(3 * k + 2) for k in range(10)]

    def clip_bary(b):
        return jnp.clip(b, -16.0, 16.0)

    def bernstein(b0, b1, b2):
        b0_2, b1_2, b2_2 = b0 * b0, b1 * b1, b2 * b2
        return (
            b0 * b0_2, b1 * b1_2, b2 * b2_2,
            3.0 * b1 * b0_2, 3.0 * b0 * b1_2,
            3.0 * b2 * b1_2, 3.0 * b1 * b2_2,
            3.0 * b0 * b2_2, 3.0 * b2 * b0_2,
            6.0 * b0 * b1 * b2,
        )

    def interpolate(b0, b1, b2):
        w = [wk.astype(acc_dtype) for wk in bernstein(b0, b1, b2)]
        cx = [v.astype(acc_dtype) for v in cpx]
        cy = [v.astype(acc_dtype) for v in cpy]
        cz = [v.astype(acc_dtype) for v in cpz]
        fx = w[0] * cx[0]
        fy = w[0] * cy[0]
        fz = w[0] * cz[0]
        for k in range(1, 10):
            fx += w[k] * cx[k]
            fy += w[k] * cy[k]
            fz += w[k] * cz[k]
        return (fx.astype(jnp.float32), fy.astype(jnp.float32),
                fz.astype(jnp.float32))

    def surface_diff(t):
        px = sx + t * dx
        py = sy + t * dy
        pz = sz + t * dz
        pd = px * nx + py * ny + pz * nz - c
        qx = px - nx * pd
        qy = py - ny * pd
        qz = pz - nz * pd
        b0, b1, b2 = bary_of(qx, qy, qz)
        fx, fy, fz = interpolate(clip_bary(b0), clip_bary(b1), clip_bary(b2))
        sd = fx * nx + fy * ny + fz * nz - c
        return jnp.abs(pd) - jnp.abs(sd)

    # secant-style estimate with midpoint fallback (cpp:137-152)
    diff_closer = surface_diff(closer)
    diff_further = surface_diff(further)
    denom = diff_closer - diff_further
    secant = _safe_div(diff_closer * further - diff_further * closer, denom)
    middle = jnp.where(
        jnp.abs(denom) < CFG.intersection_estimation_epsilon,
        (closer + further) / 2.0,
        secant,
    )
    if CFG.clamp_secant_estimate:
        # bracket clamp (see config.py): recovers concave-fixture exit hits
        middle = jnp.clip(
            middle, jnp.minimum(closer, further), jnp.maximum(closer, further)
        )
    else:
        middle = jnp.clip(middle, -1e7, 1e7)

    db0, db1, db2 = row(_ROW_DB), row(_ROW_DB + 1), row(_ROW_DB + 2)

    def normal_of(b0, b1, b2):
        """Quadratic directional-derivative normal
        (reference/bezierTriangle.cpp:197-233)."""
        b0_2 = (b0 * b0).astype(acc_dtype)
        b1_2 = (b1 * b1).astype(acc_dtype)
        b2_2 = (b2 * b2).astype(acc_dtype)
        ab = (2.0 * b0 * b1).astype(acc_dtype)
        bc = (2.0 * b1 * b2).astype(acc_dtype)
        ac = (2.0 * b0 * b2).astype(acc_dtype)
        outs = []
        for cp in (cpx, cpy, cpz):
            cpa = [v.astype(acc_dtype) for v in cp]
            comp0 = (b0_2 * cpa[0] + ab * cpa[3] + b1_2 * cpa[4]
                     + b2_2 * cpa[7] + ac * cpa[8] + bc * cpa[9])
            comp1 = (b1_2 * cpa[1] + b0_2 * cpa[3] + ab * cpa[4]
                     + bc * cpa[5] + b2_2 * cpa[6] + ac * cpa[9])
            comp2 = (b2_2 * cpa[2] + b1_2 * cpa[5] + bc * cpa[6]
                     + ac * cpa[7] + b0_2 * cpa[8] + ab * cpa[9])
            comp0 = comp0.astype(jnp.float32)
            comp1 = comp1.astype(jnp.float32)
            comp2 = comp2.astype(jnp.float32)
            # first direction is the constant (1, 0, -1)
            a_comp = comp0 - comp2
            b_comp = db0 * comp0 + db1 * comp1 + db2 * comp2
            outs.append((a_comp, b_comp))
        (ax, bx), (ay, by), (az, bz) = outs
        nxo = ay * bz - az * by
        nyo = az * bx - ax * bz
        nzo = ax * by - ay * bx
        n2 = nxo * nxo + nyo * nyo + nzo * nzo
        inv = jnp.where(n2 < 1e-30, 0.0, jax.lax.rsqrt(jnp.maximum(n2, 1e-30)))
        return nxo * inv, nyo * inv, nzo * inv

    # fixed-iteration Newton-like refinement, unrolled (cpp:155-164)
    pdx = jnp.zeros_like(cos_inc) + nx
    pdy = jnp.zeros_like(cos_inc) + ny
    pdz = jnp.zeros_like(cos_inc) + nz
    distance = middle
    for _ in range(CFG.root_search_iterations):
        distance = middle
        px = sx + middle * dx
        py = sy + middle * dy
        pz = sz + middle * dz
        t = _safe_div(
            c - (px * nx + py * ny + pz * nz), pdx * nx + pdy * ny + pdz * nz
        )
        plx = px + t * pdx
        ply = py + t * pdy
        plz = pz + t * pdz
        b0, b1, b2 = bary_of(plx, ply, plz)
        b0, b1, b2 = clip_bary(b0), clip_bary(b1), clip_bary(b2)
        nmx, nmy, nmz = normal_of(b0, b1, b2)
        fx, fy, fz = interpolate(b0, b1, b2)
        stx = fx - plx
        sty = fy - ply
        stz = fz - plz
        st2 = stx * stx + sty * sty + stz * stz
        inv = jnp.where(st2 < 1e-30, 0.0, jax.lax.rsqrt(jnp.maximum(st2, 1e-30)))
        moved = st2 > 0.0
        pdx = jnp.where(moved, stx * inv, pdx)
        pdy = jnp.where(moved, sty * inv, pdy)
        pdz = jnp.where(moved, stz * inv, pdz)
        middle = jnp.clip(
            _safe_div(
                (fx - sx) * nmx + (fy - sy) * nmy + (fz - sz) * nmz,
                dx * nmx + dy * nmy + dz * nmz,
            ),
            -1e7,
            1e7,
        )

    # acceptance (cpp:165-167)
    rx = fx - sx
    ry = fy - sy
    rz = fz - sz
    along = rx * dx + ry * dy + rz * dz
    qx = rx - along * dx
    qy = ry - along * dy
    qz = rz - along * dz
    ray_dist2 = qx * qx + qy * qy + qz * qz
    max_d = CFG.max_intersection_distance_from_ray
    accept = (ray_dist2 <= max_d * max_d) & (
        distance >= (further - closer) * CFG.minimal_ray_distance
    )
    valid &= accept

    # domain classification against divider planes (cpp:169-184)
    outside = jnp.zeros_like(cos_inc, dtype=jnp.int32)
    for j in range(3):
        dnx = row(_ROW_DIV + 4 * j)
        dny = row(_ROW_DIV + 4 * j + 1)
        dnz = row(_ROW_DIV + 4 * j + 2)
        dc = row(_ROW_DIV + 4 * j + 3)
        dd = fx * dnx + fy * dny + fz * dnz - dc
        outside += (dd < 0.0).astype(jnp.int32) << j
    what = jnp.where(
        outside == 1, 0,
        jnp.where(outside == 2, 1, jnp.where(outside == 4, 2, _WHAT_INTERSECT)),
    )
    what = jnp.where(valid, what, _WHAT_NONE)
    return what | (in_dom.astype(jnp.int32) << 3), distance.astype(jnp.float32)


def patch_spheres(patches: BezierPatches):
    """Per-patch bounding sphere over the control net (surface ⊂ convex hull
    of the 10 control points), inflated 25%.  Returns (center [P,3],
    radius [P]).

    The 25% is an EMPIRICAL choice, not a provable bound — round 5 measured
    both directions (benchmarks/inflation_probe.py, PERF.md round-5):
    gate-OFF retry candidates can converge up to 66x the hull radius out
    (the clip_bary extended-surface region), so NO finite inflation is
    provably lossless; actual winners' rays require up to 1.37x at the
    per-patch level, yet 1.25 stays exact in practice because the cull is
    (tile x block)-granular — a block is evaluated whole when ANY of its
    pairs passes.  Shrinking to 1.10 was measured to drop 3 of 65,536
    winners on the refined robot for only +3%..+14% intersect time —
    rejected to keep exact reference agreement.  The guards that make this
    empiricism safe: on-device Pallas/XLA agreement asserted every bench
    run at 4 shapes, recompute_reject_count, and the CPU fixture suite."""
    center = jnp.mean(patches.control_points, axis=1)  # [P,3]
    radius = jnp.max(
        jnp.linalg.norm(patches.control_points - center[:, None, :], axis=-1),
        axis=-1,
    ) * 1.25 + 1e-5
    return center, radius


def block_spheres(patches: BezierPatches, pad_to: int,
                  block_p: int = BLOCK_P):
    """Merged bounding sphere per block_p-patch block of the padded table:
    (center [B,3], radius [B]) with radius < 0 for all-padding blocks.

    These drive the host-side candidate-block lists of the fused kernel: a
    block can only intersect a ray tile if its merged sphere does, so blocks
    whose sphere misses all 128 rays of a tile are dropped from that tile's
    in-kernel loop entirely (they previously still paid the loop-trip +
    per-patch sphere test + branch 'floor', measured 4.1 ms/call at the
    bench shape)."""
    center, radius = patch_spheres(patches)
    P = patches.num_patches
    P_pad = P + (-P) % pad_to
    n_real = jnp.minimum(
        jnp.maximum(P - jnp.arange(0, P_pad, block_p), 0), block_p
    )  # real patches per block [B]
    pad_n = P_pad - P
    center = jnp.pad(center, ((0, pad_n), (0, 0)))
    radius = jnp.pad(radius, ((0, pad_n),))
    cb = center.reshape(-1, block_p, 3)
    rb = radius.reshape(-1, block_p)
    real = (
        jnp.arange(block_p)[None, :] < n_real[:, None]
    )  # [B, block_p]
    denom = jnp.maximum(n_real, 1).astype(jnp.float32)
    c = jnp.sum(jnp.where(real[..., None], cb, 0.0), axis=1) / denom[:, None]
    reach = jnp.linalg.norm(cb - c[:, None, :], axis=-1) + rb
    r = jnp.max(jnp.where(real, reach, -1.0), axis=1)
    return c, r


def tile_block_lists(patches: BezierPatches, rays, pad_to: int,
                     block_p: int = BLOCK_P, use_aabb: bool = True):
    """Per-128-ray-tile candidate block lists for the fused kernel.

    rays [8, R_pad] (the kernel's transposed layout).  Returns
    (counts [T] i32, lists [B, T] i32): lists[:counts[t], t] are the ids of
    blocks whose merged sphere AND union-of-patch-AABBs are hit by at least
    one ray of tile t, ascending (so winners keep the staged pipeline's
    first-index tie-break order).  The AABB leg (use_aabb, see
    _patch_boxes) is exactly as conservative as the sphere leg and much
    tighter for elongated blocks.  lists is stored block-major because SMEM
    pads the minor dimension to 128 lanes: [T, B] would burn T*512 bytes of
    the 1 MB SMEM budget (OOM at T=2048, i.e. one 262144-ray call), [B, T]
    only B*max(T,128)*4."""
    center, radius = patch_spheres(patches)
    P = patches.num_patches
    pad_n = (-P) % pad_to
    lo, hi = _patch_boxes(patches.control_points, center, radius)
    center = jnp.pad(center, ((0, pad_n), (0, 0)))
    radius = jnp.pad(radius, ((0, pad_n),))
    lo = jnp.pad(lo, ((0, pad_n), (0, 0)))
    hi = jnp.pad(hi, ((0, pad_n), (0, 0)))
    return _tile_lists_core(center, radius, lo, hi, rays, block_p, use_aabb)


def _tile_lists_core(center, radius, lo, hi, rays_t, block_p: int,
                     use_aabb: bool):
    """Shared candidate-list builder: per-patch padded sphere (center,
    radius; radius <= 0 marks padding) and AABB (lo, hi) arrays [Pp, ...],
    rays_t [8, R_pad].  Returns (counts [T] i32, lists [B, T] i32)."""
    c, r = _block_spheres_cr(center, radius, block_p)  # [B,3], [B]
    s = rays_t[0:3, :].T                               # [R_pad, 3]
    d = rays_t[3:6, :].T
    rel = c[None, :, :] - s[:, None, :]                # [R_pad, B, 3]
    t_ca = jnp.einsum("rbk,rk->rb", rel, d)
    rel2 = jnp.einsum("rbk,rbk->rb", rel, rel)
    r2 = r[None, :] * r[None, :]
    hit = ((rel2 - t_ca * t_ca) <= r2) & ((t_ca >= 0.0) | (rel2 <= r2))
    hit &= (r >= 0.0)[None, :]                         # all-padding blocks
    if use_aabb:
        real = (radius > 0.0).reshape(-1, block_p)     # [B, block_p]
        lob = jnp.min(
            jnp.where(real[..., None], lo.reshape(-1, block_p, 3), jnp.inf),
            axis=1,
        )
        hib = jnp.max(
            jnp.where(real[..., None], hi.reshape(-1, block_p, 3), -jnp.inf),
            axis=1,
        )
        hit &= _ray_aabb_hit(lob, hib, s, d)
    tile_hit = hit.reshape(-1, TILE_R, hit.shape[-1]).any(axis=1)   # [T,B]
    counts = jnp.sum(tile_hit, axis=-1).astype(jnp.int32)
    lists = jnp.argsort(~tile_hit, axis=-1, stable=True).astype(jnp.int32)
    return counts, lists.T


def _patch_boxes(cp, center, radius):
    """Per-patch AABB: control-net box expanded per axis by the sphere's
    slack (radius - r_hull, the follow-side/ray-distance inflation
    patch_spheres applied).

    cp [P,10,3] control nets, center/radius the packed (inflated) spheres.
    This leg assumes the accepted-candidate region ⊆ hull ⊕ ball(slack) —
    a STRICTLY TIGHTER model than the sphere leg's ball(center, radius)
    (hull ⊕ ball(slack) ⊂ ball(center, r_hull + slack); e.g. a near-flat
    patch's sphere reaches 1.25*r_hull off-plane while box ⊕ slack reaches
    only 0.25*r_hull there).  Neither model is provable — the inflation
    probe measured retry candidates converging up to 66x r_hull out, so
    ANY finite bound is empirical (see patch_spheres) — and the AABB leg
    is validated the same way the sphere bound is: bit-identical winners
    at every bench shape, the always-on Pallas/XLA agreement assertions,
    and the CPU fixture suite (which runs the identical interpret-mode
    cull).  `use_aabb=False` on the sweep entry points restores the
    sphere-only cull for cross-checks.  The payoff: the box hugs a
    surface strip in its two thin directions where a merged 16-patch
    sphere covers a ball (executed pairs 0.41 -> 0.15 at the bench
    shape).  Padding rows (cp = 0, radius = 0) yield lo = hi = 0 and are
    excluded by the radius mask downstream."""
    r_hull = jnp.max(
        jnp.linalg.norm(cp - center[:, None, :], axis=-1), axis=-1
    )
    slack = jnp.maximum(radius - r_hull, 0.0)[:, None]
    return jnp.min(cp, axis=1) - slack, jnp.max(cp, axis=1) + slack


def _ray_aabb_hit(lo, hi, s, d):
    """Slab test: do rays (s, d) [R,3] hit boxes [B,3]?  Returns [R,B] bool.
    Zero direction components are substituted with ±1e-30 so the slab
    arithmetic stays finite: a ray parallel to a slab then produces
    same-sign ±huge (outside -> miss) or straddling ±huge (inside -> pass),
    which is the exact parallel-ray semantics."""
    d_safe = jnp.where(jnp.abs(d) < 1e-30,
                       jnp.where(d < 0.0, -1e-30, 1e-30), d)
    inv = 1.0 / d_safe                                     # [R,3]
    t1 = (lo[None, :, :] - s[:, None, :]) * inv[:, None, :]   # [R,B,3]
    t2 = (hi[None, :, :] - s[:, None, :]) * inv[:, None, :]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)           # [R,B]
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (tmax >= 0.0) & (tmin <= tmax)


def _block_spheres_cr(center, radius, block_p: int = BLOCK_P):
    """block_spheres from per-patch (center [Pp,3], radius [Pp]) arrays whose
    row count is already a block_p multiple; padding rows are marked by
    radius <= 0 (packed tables pad with zeros).  Returns ([B,3], [B]) with
    radius < 0 for all-padding blocks."""
    cb = center.reshape(-1, block_p, 3)
    rb = radius.reshape(-1, block_p)
    real = rb > 0.0
    n_real = jnp.sum(real, axis=1)
    denom = jnp.maximum(n_real, 1).astype(jnp.float32)
    c = jnp.sum(jnp.where(real[..., None], cb, 0.0), axis=1) / denom[:, None]
    reach = jnp.linalg.norm(cb - c[:, None, :], axis=-1) + rb
    r = jnp.max(jnp.where(real, reach, -1.0), axis=1)
    return c, r


def _tile_lists_cr(center, radius, rays_t, block_p: int = BLOCK_P,
                   lo=None, hi=None, use_aabb: bool = True):
    """tile_block_lists from per-patch sphere arrays (see _block_spheres_cr)
    plus optional per-patch AABBs (lo/hi [Pp,3] — omitted, they degrade to
    center±radius boxes); rays_t [8, R_pad].  Returns
    (counts [T] i32, lists [B, T] i32)."""
    if lo is None or hi is None:
        lo = center - radius[:, None]
        hi = center + radius[:, None]
    return _tile_lists_core(center, radius, lo, hi, rays_t, block_p, use_aabb)


def pack_vote_matrix(neighbours, pad_to: int) -> jnp.ndarray:
    """[P_pad, 3*P_pad] bf16 follow-vote matrix for the fused kernel's MXU
    select: entry (q, s*P_pad + p) is 1 iff ``neighbours[p, s] == q``.

    votes = B @ f where f[s*P_pad + p, ray] = (gate-ON what of patch p == s);
    votes[q, ray] > 0 marks patch q as a follow-side retry target — the same
    one-hot-matmul reconstruction of the reference's forward retry
    (reference/bezierMesh.cpp:213-217) as ops.intersect.select_candidates'
    MXU path, just evaluated inside the kernel on VMEM-resident codes.
    bf16 one-hots are exact: values 0/1, row sums <= 3, f32 accumulation.
    """
    P = neighbours.shape[0]
    P_pad = P + (-P) % pad_to
    q_ids = jnp.arange(P_pad, dtype=jnp.int32)[:, None]
    cols = []
    for s in range(3):
        nb = jnp.full((P_pad,), -1, jnp.int32).at[:P].set(
            neighbours[:, s].astype(jnp.int32)
        )
        cols.append((q_ids == nb[None, :]).astype(jnp.bfloat16))
    return jnp.concatenate(cols, axis=1)


def pack_patch_table(patches: BezierPatches, pad_to: int) -> jnp.ndarray:
    """Row-major [P_pad, 64] feature table (sublanes = patches, lanes = features)."""
    P = patches.num_patches
    center, radius = patch_spheres(patches)
    rows = jnp.concatenate(
        [
            patches.control_points.reshape(P, 30).T,   # 0..29
            patches.underlying.T,                      # 30..33
            patches.bary_inverse.reshape(P, 9).T,      # 34..42
            patches.heights.T,                         # 43..44
            patches.deriv_b.T,                         # 45..47
            patches.dividers.reshape(P, 12).T,         # 48..59
            center.T,                                  # 60..62
            radius[None],                              # 63
        ],
        axis=0,
    ).astype(jnp.float32)
    pad_p = (-P) % pad_to
    rows = jnp.pad(rows, ((0, _N_ROWS - rows.shape[0]), (0, pad_p)))
    return rows.T  # [P_pad, 64]


# largest patch table kept fully VMEM-resident by the 1D-grid kernel:
# table Pp*64*4 B + two [Pp, TILE_R] out blocks (8 B/pair) <= ~10.3 MB of
# the v5e's ~16 MB VMEM; sweep_codes_pallas chunks the patch axis here
# (chunks concatenate — per-pair codes are patch-independent).
_RESIDENT_MAX_P = 8192

# largest patch count handled by the FUSED sweep+select kernel: the [P_pad,
# 3*P_pad] bf16 vote matrix (6 MB at 1024) + [P_pad, TILE_R] code/dist
# scratch (1 MB) + the patch table must all stay VMEM-resident.
_FUSED_MAX_P = 1024

_BIG_F = 3.4e38  # miss sentinel (matches ops.intersect._BIG)


def _sweep_select_kernel(counts_ref, lists_ref, rays_ref, patch_ref, vote_ref,
                         dist_out_ref, idx_out_ref, code_scr, dist_scr,
                         *, block_p: int = BLOCK_P,
                         half_gate: bool = False):
    """FUSED sweep + select: one invocation per 128-ray tile.

    Replaces the materialize-[R,P]-then-select pipeline for P <= _FUSED_MAX_P:
    per-pair codes/distances live only in VMEM scratch, the follow-side vote
    is one MXU matmul over those codes, and the kernel emits just the per-ray
    winner (8 B/ray instead of 8 B/pair to HBM — at the robot bench shape
    that deletes ~236 MB of HBM round-trip plus the entire 4.2 ms select
    stage).  Semantics identical to
    sweep_codes -> ops.intersect.select_candidates (tested for equality):
    the same candidate multiset as the reference's brute-force scan with one
    forward retry (reference/bezierMesh.cpp:206-227), min-distance winner,
    first-index tie-break.

    counts/lists are scalar-prefetch args (tile_block_lists): the in-kernel
    loop runs ONLY over the blocks whose merged sphere is hit by some ray of
    this tile, so sphere-skippable blocks cost literally nothing (they used
    to pay loop trip + 32-patch sphere test + branch — the 4.1 ms 'all-skip
    floor' of round 2).  counts == 0 doubles as the whole-tile early exit.
    Per-patch spheres still gate the Newton work inside listed blocks (the
    merged sphere is coarser than the 32 individual ones).
    """
    i = pl.program_id(0)
    nb = counts_ref[i]
    rays = rays_ref[:]                    # [8, TILE_R]
    sx, sy, sz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]

    dist_out_ref[:] = jnp.full(dist_out_ref.shape, _BIG_F, jnp.float32)
    idx_out_ref[:] = jnp.zeros(idx_out_ref.shape, jnp.int32)

    @pl.when(nb > 0)
    def _full():
        code_scr[:] = jnp.full(code_scr.shape, _WHAT_NONE, jnp.int32)
        dist_scr[:] = jnp.zeros(dist_scr.shape, jnp.float32)

        # Half-gating (default OFF — a measured negative): 25-29% of the
        # 8-patch HALVES inside listed blocks have zero sphere hits (host
        # replay, robot 450/refined), but gating each half independently
        # measured SLOWER on v5e (7.12 vs 5.86 ms at the headline shape,
        # identical winners): the two [8,128]-row tile evaluations halve
        # the VPU's exploitable ILP and double the branch points, costing
        # more than the ~27% skipped Newton work saves.  Kept behind the
        # flag as the record, like the block_p=8 list experiment.
        sub = block_p // 2 if (half_gate and block_p >= 16) else block_p

        def body(k, carry):
            off0 = lists_ref[k, i] * block_p
            for h in range(block_p // sub):
                off = off0 + h * sub
                pt = patch_ref[pl.ds(off, sub), :]

                def row(j, _pt=pt):
                    return _pt[:, j:j + 1]

                sphere_hit = _sphere_hit(row, sx, sy, sz, dx, dy, dz)

                @pl.when(jnp.any(sphere_hit))
                def _compute(row=row, off=off):
                    code, dist = _sweep_tile(row, sx, sy, sz, dx, dy, dz)
                    code_scr[pl.ds(off, sub), :] = code
                    dist_scr[pl.ds(off, sub), :] = dist

            return carry

        jax.lax.fori_loop(0, nb, body, 0)

        # ---- in-kernel select (ops.intersect.select_candidates semantics) --
        code = code_scr[:]                # [P_pad, TILE_R]
        dist = dist_scr[:]
        what_off = code & 7
        in_dom = (code >> 3) > 0
        what_on = jnp.where(in_dom, what_off, _WHAT_NONE)
        hit_off = what_off == _WHAT_INTERSECT
        direct = what_on == _WHAT_INTERSECT

        f = jnp.concatenate(
            [(what_on == s).astype(jnp.bfloat16) for s in range(3)], axis=0
        )                                  # [3*P_pad, TILE_R]
        votes = jnp.dot(
            vote_ref[:], f, preferred_element_type=jnp.float32
        )                                  # [P_pad, TILE_R]
        considered = direct | ((votes > 0.0) & hit_off)
        key = jnp.where(considered, dist, _BIG_F)
        best = jnp.min(key, axis=0, keepdims=True)          # [1, TILE_R]
        rows = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
        idx = jnp.min(
            jnp.where(key == best, rows, jnp.int32(2 ** 30)),
            axis=0, keepdims=True,
        )
        dist_out_ref[:] = jnp.broadcast_to(best, dist_out_ref.shape)
        idx_out_ref[:] = jnp.broadcast_to(idx, idx_out_ref.shape)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "block_p", "half_gate"))
def _sweep_select_call(counts, lists, rays, patch_t, votes, interpret: bool,
                       block_p: int = BLOCK_P, half_gate: bool = False):
    Rp = rays.shape[1]
    Pp = patch_t.shape[0]
    flops_pair = 1300 * CFG.root_search_iterations // 4 + 400
    cost = pl.CostEstimate(
        flops=(flops_pair + 6) * Rp * Pp,
        bytes_accessed=16 * Rp + (Rp // TILE_R) * 4 * _N_ROWS * Pp,
        transcendentals=10 * Rp * Pp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts [T], lists [B, T]
        grid=(Rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, _N_ROWS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, 3 * Pp), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((Pp, TILE_R), jnp.int32),
            pltpu.VMEM((Pp, TILE_R), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sweep_select_kernel, block_p=block_p,
                          half_gate=half_gate),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(counts, lists, rays, patch_t, votes)


def sweep_select_pallas(patches: BezierPatches, start, direction,
                        interpret: bool | None = None,
                        block_p: int | None = None,
                        use_aabb: bool = True,
                        half_gate: bool = False):
    """Fused sweep+select: (any_hit [R] bool, win [R] i32, win_dist [R] f32)
    — the winner of reference/bezierMesh.cpp:206-227's scan+retry without
    ever materializing per-pair state in HBM.  P must be <= _FUSED_MAX_P."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:  # pragma: no cover
            interpret = True
    R = start.shape[0]
    P = patches.num_patches
    pad_r = (-R) % TILE_R
    rays = jnp.concatenate(
        [
            start.astype(jnp.float32),
            direction.astype(jnp.float32),
            jnp.zeros((R, 2), jnp.float32),
        ],
        axis=-1,
    )
    pad_rows = jnp.zeros((pad_r, 8), jnp.float32).at[:, 3].set(1.0)
    rays = jnp.concatenate([rays, pad_rows], axis=0) if pad_r else rays
    if block_p is None:
        block_p = FUSED_BLOCK_P
    # pad P to a multiple of 128 so the vote matmul's contraction dim tiles
    # cleanly onto the MXU (and every block size divides it)
    patch_t = pack_patch_table(patches, 128)
    votes = pack_vote_matrix(patches.neighbours, 128)
    rays_t = rays.T
    counts, lists = tile_block_lists(patches, rays_t, 128, block_p, use_aabb)
    dist8, idx8 = _sweep_select_call(
        counts, lists, rays_t, patch_t, votes, bool(interpret), block_p,
        half_gate,
    )
    best = dist8[0, :R]
    win = idx8[0, :R]
    return best < (_BIG_F * 0.5), win, best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_call(rays, patch_t, counts, lists, interpret: bool):
    Rp = rays.shape[1]
    Pp = patch_t.shape[0]
    flops_pair = 1300 * CFG.root_search_iterations // 4 + 400
    cost = pl.CostEstimate(
        flops=flops_pair * Rp * Pp,
        bytes_accessed=8 * Rp * Pp + (Rp // TILE_R) * 4 * _N_ROWS * Pp,
        transcendentals=10 * Rp * Pp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts [T], lists [B, T]
        grid=(Rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, _N_ROWS), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Pp, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _sweep_kernel_resident,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Pp, Rp), jnp.int32),
            jax.ShapeDtypeStruct((Pp, Rp), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(counts, lists, rays, patch_t)


def sweep_codes_pallas(patches: BezierPatches, start, direction,
                       interpret: bool | None = None):
    """Pallas sweep: (code [R,P] i32, dist [R,P] f32) for start/direction [R,3].

    Runs the VMEM-resident 1D-grid kernel, chunking the patch axis at
    _RESIDENT_MAX_P (per-pair codes are patch-independent, so chunks just
    concatenate) and the ray axis whenever a chunk's scalar-prefetch lists
    would blow the SMEM budget.  (A 2D streaming-grid kernel used to cover
    these overflows; it never ran on hardware after the winner kernel
    landed — round-4 verdict weak #5 — and was deleted in round 5 in favour
    of this chunking, which reuses the one production-tested kernel.)
    Production callers go through intersect_rays / sweep_select_pallas /
    sweep_winner_pallas; this entry point serves the staged pipeline,
    tests, and the bench breakdown."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:  # pragma: no cover
            interpret = True
    R = start.shape[0]
    P = patches.num_patches
    pad_r = (-R) % TILE_R
    rays = jnp.concatenate(
        [
            start.astype(jnp.float32),
            direction.astype(jnp.float32),
            jnp.zeros((R, 2), jnp.float32),
        ],
        axis=-1,
    )
    # padded rays point along +x from the origin; results are sliced away
    pad_rows = jnp.zeros((pad_r, 8), jnp.float32).at[:, 3].set(1.0)
    rays = jnp.concatenate([rays, pad_rows], axis=0) if pad_r else rays
    patch_t = pack_patch_table(patches, BLOCK_P)
    rays_t = rays.T
    Pp = patch_t.shape[0]
    pad_n = Pp - P
    center, radius = patch_spheres(patches)
    lo, hi = _patch_boxes(patches.control_points, center, radius)
    center = jnp.pad(center, ((0, pad_n), (0, 0)))
    radius = jnp.pad(radius, ((0, pad_n),))
    lo = jnp.pad(lo, ((0, pad_n), (0, 0)))
    hi = jnp.pad(hi, ((0, pad_n), (0, 0)))

    p_cap = max(_RESIDENT_MAX_P - _RESIDENT_MAX_P % BLOCK_P, BLOCK_P)
    code_rows, dist_rows = [], []
    for p0 in range(0, Pp, p_cap):
        pt_c = patch_t[p0:p0 + p_cap]
        blocks = pt_c.shape[0] // BLOCK_P
        ray_cap = max(_SMEM_LIST_BUDGET // (4 * blocks), 128) * TILE_R
        cols = []
        for r0 in range(0, rays_t.shape[1], ray_cap):
            rt = rays_t[:, r0:r0 + ray_cap]
            counts, lists = _tile_lists_cr(
                center[p0:p0 + p_cap], radius[p0:p0 + p_cap], rt, BLOCK_P,
                lo[p0:p0 + p_cap], hi[p0:p0 + p_cap],
            )
            cols.append(_sweep_call(rt, pt_c, counts, lists, bool(interpret)))
        code_rows.append(
            jnp.concatenate([c for c, _ in cols], axis=1)
            if len(cols) > 1 else cols[0][0]
        )
        dist_rows.append(
            jnp.concatenate([d for _, d in cols], axis=1)
            if len(cols) > 1 else cols[0][1]
        )
    code = (jnp.concatenate(code_rows, axis=0)
            if len(code_rows) > 1 else code_rows[0])
    dist = (jnp.concatenate(dist_rows, axis=0)
            if len(dist_rows) > 1 else dist_rows[0])
    return code.T[:R, :P], dist.T[:R, :P]


# ---------------------------------------------------------------------------
# Winner kernel: in-kernel running argmin for ANY patch count
# ---------------------------------------------------------------------------
#
# The fused kernel above resolves the follow-side retry
# (reference/bezierMesh.cpp:213-217) with an O(P^2) one-hot vote matmul —
# MXU-cheap at P <= 1024 but quadratic in memory and flops, so refined
# meshes (reference/bezierMesh.cpp:79-204 makes 1.8k-16k+ patches) used to
# fall back to materializing the full [R, P] code/dist in HBM (8 B/pair)
# plus an XLA select: measured 3.45M rays/s at P=450 vs 0.70M at P=7200 —
# the throughput cliff was the per-pair HBM round-trip, not compute.
#
# This kernel keeps a per-ray running (best distance, best patch) INSIDE the
# kernel (8 B/ray to HBM) and resolves the retry **at the voter** with
# host-permuted neighbour tables:
#
#   T_s[p] = patch_table[neighbours[p, s]]          (one device gather, O(P))
#
# When patch p's gate-ON candidate classifies as cFollowSide_s, the kernel
# re-evaluates the neighbour q = neighbours[p, s]'s gate-OFF candidate
# directly from T_s — the same arithmetic on the same f32 rows the staged
# select would have gathered, so the recomputed (distance, q) is bit-equal
# to the neighbour's own sweep result.  No gather, no O(P^2) matrix, and —
# because a voter's chunk always carries T_s copies of its neighbours'
# rows — patch chunks become embarrassingly parallel: any P is covered by
# ceil(P / _WINNER_MAX_P) resident kernel calls whose per-ray winners
# combine with an O(R) min.  The vote recompute only runs per (block, side)
# when some pair in the block actually voted (pl.when), so its cost scales
# with boundary-crossing rays, not with P.
#
# Total HBM traffic: O(R + P) — rays in, tables in (once: constant
# index_map), 8 B/ray winners out.  The 2D streaming kernel's
# tiles * patches table re-streaming and the staged path's 8 B/pair both
# disappear.

# winner-table feature columns 64..67 live in the lane padding the VMEM
# (8, 128) f32 tiling already pays for [P, 64] tables — they are free.
_ROW_NB_ID = 64    # 3 cols: f32 neighbour patch ids (sides 0..2)
_ROW_SELF_ID = 67  # 1 col: own GLOBAL patch id (f32; exact to 2^24)
_N_ROWS_W = 68

# per-chunk patch cap: 4 resident tables x [4096, 68->128 lanes] f32 = 8 MB
# of the v5e's ~16 MB VMEM (the 128-lane padding is physical).
_WINNER_MAX_P = 4096

# scalar-prefetch SMEM budget for the [B, T] block lists (B*max(T,128)*4 B
# after lane padding — see tile_block_lists).  Half the 1 MB SMEM, leaving
# headroom for Mosaic's own scalars.
_SMEM_LIST_BUDGET = 512 * 1024


def safe_ray_cap(num_patches: int, block_p: int | None = None,
                 kernel: str = "auto") -> int:
    """Largest per-call ray count whose scalar-prefetch block lists fit the
    SMEM budget, for the kernel that handles `num_patches`.  Multiple of
    TILE_R.  kernel="auto" follows the production routing (fused at
    P <= _FUSED_MAX_P, winner-chunked above); kernel="winner" computes the
    cap from the winner kernel's actual 2048/4096 padding bucket — required
    for direct sweep_winner_pallas calls at small P, whose lists are up to
    4x larger than the fused-path estimate.  block_p overrides the path's
    default candidate-block size (tuning)."""
    if kernel == "winner" or (kernel == "auto" and num_patches > _FUSED_MAX_P):
        # winner chunks pad to their VMEM bucket (see sweep_winner_pallas)
        p_pad = _WINNER_MAX_P if num_patches > 2048 else 2048
        blocks = max(p_pad // (block_p or WINNER_BLOCK_P), 1)
    else:
        p_pad = num_patches + (-num_patches) % 128
        blocks = max(p_pad // (block_p or FUSED_BLOCK_P), 1)
    tiles = max(_SMEM_LIST_BUDGET // (4 * blocks), 128)
    return tiles * TILE_R


def pack_winner_tables(patches: BezierPatches):
    """(base, (T0, T1, T2)): the [P, 68] extended feature table plus its
    three neighbour-permuted copies T_s[p] = base[neighbours[p, s]] (ids
    clamped to [0, P) exactly like select_candidates' jnp.take clip mode).
    All unpadded; the chunked driver pads per chunk."""
    P = patches.num_patches
    base64 = pack_patch_table(patches, 1)                     # [P, 64]
    nb = jnp.clip(patches.neighbours.astype(jnp.int32), 0, P - 1)
    ids = jnp.arange(P, dtype=jnp.float32)[:, None]
    base = jnp.concatenate([base64, nb.astype(jnp.float32), ids], axis=1)
    return base, tuple(base[nb[:, s]] for s in range(3))


def _winner_kernel(counts_ref, lists_ref, rays_ref, t0_ref, tn_ref,
                   dist_ref, idx_ref, *, block_p: int = BLOCK_P):
    """One invocation per 128-ray tile; the base table t0 [Pp, W] and the
    stacked permuted tables tn = concat(T_0, T_1, T_2) [3*Pp, W] are all
    VMEM-resident.

    Candidate multiset per ray (identical to select_candidates'):
      * direct:  patch q with gate-ON what == cIntersect -> (dist[q], q)
      * retry:   voter p with gate-ON what == cFollowSide_s contributes its
        neighbour q's gate-OFF candidate, recomputed from T_s[p]
        -> (dist_off[q], q) if that recompute accepts (what_off == cIntersect)
        and q's own bounding sphere is hit by the ray (the per-patch cull the
        staged sweep would have applied to q's row).
    Winner = min distance; ties keep the earliest accumulation (same
    candidate reappearing — direct + voted, or two voters — carries the same
    (dist, q) pair, so the winner is order-independent).

    The vote pass is a fori_loop over sides with a DYNAMIC table offset
    (s * Pp + off) rather than three unrolled bodies: _sweep_tile is
    instantiated twice total (direct + vote), halving Mosaic code size and
    compile time vs the per-side-unrolled form.
    """
    i = pl.program_id(0)
    nb = counts_ref[i]
    Pp = t0_ref.shape[0]
    rays = rays_ref[:]                    # [8, TILE_R]
    sx, sy, sz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]

    dist_ref[:] = jnp.full(dist_ref.shape, _BIG_F, jnp.float32)
    idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)

    def acc(key, idf):
        """Fold a candidate tile (key [block_p, R], idf [block_p, 1] f32
        ids) into the running per-ray (best dist, best id)."""
        bm = jnp.min(key, axis=0, keepdims=True)           # [1, R]
        sel = jnp.min(jnp.where(key <= bm, idf, _BIG_F), axis=0, keepdims=True)
        old = dist_ref[:]
        bm_b = jnp.broadcast_to(bm, old.shape)
        take = bm_b < old
        dist_ref[:] = jnp.where(take, bm_b, old)
        idx_ref[:] = jnp.where(
            take, jnp.broadcast_to(sel, old.shape).astype(jnp.int32),
            idx_ref[:],
        )

    def body(k, carry):
        off = lists_ref[k, i] * block_p
        pt = t0_ref[pl.ds(off, block_p), :]

        def row(j):
            return pt[:, j:j + 1]

        sphere_hit = _sphere_hit(row, sx, sy, sz, dx, dy, dz)

        @pl.when(jnp.any(sphere_hit))
        def _compute():
            code, dist = _sweep_tile(row, sx, sy, sz, dx, dy, dz)
            what_off = code & 7
            in_dom = (code >> 3) > 0
            what_on = jnp.where(in_dom, what_off, _WHAT_NONE)
            acc(jnp.where(what_on == _WHAT_INTERSECT, dist, _BIG_F),
                row(_ROW_SELF_ID))

            def vote_body(s, carry2):
                mask_s = what_on == s

                @pl.when(jnp.any(mask_s))
                def _vote():
                    ptn = tn_ref[pl.ds(s * Pp + off, block_p), :]

                    def rown(j):
                        return ptn[:, j:j + 1]

                    nb_sphere = _sphere_hit(rown, sx, sy, sz, dx, dy, dz)
                    code2, dist2 = _sweep_tile(rown, sx, sy, sz, dx, dy, dz)
                    hit2 = (code2 & 7) == _WHAT_INTERSECT
                    acc(jnp.where(mask_s & hit2 & nb_sphere, dist2, _BIG_F),
                        rown(_ROW_SELF_ID))

                return carry2

            jax.lax.fori_loop(0, 3, vote_body, 0)

        return carry

    jax.lax.fori_loop(0, nb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_p"))
def _winner_call(counts, lists, rays, t0, tn, interpret: bool,
                 block_p: int = BLOCK_P):
    Rp = rays.shape[1]
    Pp = t0.shape[0]
    flops_pair = 1300 * CFG.root_search_iterations // 4 + 400
    cost = pl.CostEstimate(
        # ~2x per-pair: direct sweep + amortized voter-side recomputes
        flops=2 * flops_pair * Rp * Pp,
        bytes_accessed=16 * Rp + 4 * 4 * _N_ROWS_W * Pp,
        transcendentals=20 * Rp * Pp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts [T], lists [B, T]
        grid=(Rp // TILE_R,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Pp, _N_ROWS_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Pp, _N_ROWS_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE_R), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_winner_kernel, block_p=block_p),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(counts, lists, rays, t0, tn)


def sweep_winner_pallas(patches: BezierPatches, start, direction,
                        interpret: bool | None = None,
                        block_p: int | None = None,
                        use_aabb: bool = True):
    """Per-ray winner of the full scan+retry (reference/bezierMesh.cpp:206-227)
    for ANY patch count: (any_hit [R] bool, win [R] i32, win_dist [R] f32).

    Patches are processed in VMEM-resident chunks of <= _WINNER_MAX_P whose
    per-ray winners combine with an O(R) min (retries never cross the chunk
    boundary — the voter's chunk carries permuted copies of its neighbours'
    rows, wherever they live).  The ray axis auto-chunks to keep the
    scalar-prefetch block lists inside the SMEM budget, so callers need no
    manual chunking at any R."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
        except Exception:  # pragma: no cover
            interpret = True
    interpret = bool(interpret)
    if block_p is None:
        block_p = WINNER_BLOCK_P
    R = start.shape[0]
    P = patches.num_patches
    base, perms = pack_winner_tables(patches)

    n_chunks = max(1, -(-P // _WINNER_MAX_P))
    bucket = _WINNER_MAX_P if P > 2048 else 2048

    def pad_chunk(t, c0):
        sl = t[c0:min(c0 + _WINNER_MAX_P, P)]
        return jnp.pad(sl, ((0, bucket - sl.shape[0]), (0, 0)))

    def run_rays(rays_c):
        """rays_c [8, Rc] -> (best dist [Rc], best id [Rc])."""
        best_d = best_i = None
        for c in range(n_chunks):
            c0 = c * _WINNER_MAX_P
            t0 = pad_chunk(base, c0)
            tn = jnp.concatenate([pad_chunk(t, c0) for t in perms], axis=0)
            center = t0[:, _ROW_BSPHERE:_ROW_BSPHERE + 3]
            radius = t0[:, _ROW_BSPHERE + 3]
            cp = t0[:, :30].reshape(-1, 10, 3)
            lo, hi = _patch_boxes(cp, center, radius)
            counts, lists = _tile_lists_cr(center, radius, rays_c, block_p,
                                           lo, hi, use_aabb)
            d8, i8 = _winner_call(counts, lists, rays_c, t0, tn, interpret,
                                  block_p)
            d, i = d8[0], i8[0]
            if best_d is None:
                best_d, best_i = d, i
            else:
                take = d < best_d
                best_i = jnp.where(take, i, best_i)
                best_d = jnp.minimum(d, best_d)
        return best_d, best_i

    pad_r = (-R) % TILE_R
    rays = jnp.concatenate(
        [
            start.astype(jnp.float32),
            direction.astype(jnp.float32),
            jnp.zeros((R, 2), jnp.float32),
        ],
        axis=-1,
    )
    pad_rows = jnp.zeros((pad_r, 8), jnp.float32).at[:, 3].set(1.0)
    rays = jnp.concatenate([rays, pad_rows], axis=0) if pad_r else rays
    rays_t = rays.T                                    # [8, Rp]
    Rp = rays_t.shape[1]

    cap = safe_ray_cap(P, block_p, kernel="winner")
    if Rp <= cap:
        best, win = run_rays(rays_t)
    else:
        pad2 = (-Rp) % cap
        rt = jnp.pad(rays_t, ((0, 0), (0, pad2)))
        rt = rt.at[3, Rp:].set(1.0) if pad2 else rt
        chunks = jnp.moveaxis(rt.reshape(8, -1, cap), 1, 0)  # [n, 8, cap]
        d_c, i_c = jax.lax.map(run_rays, chunks)
        best = d_c.reshape(-1)[:Rp]
        win = i_c.reshape(-1)[:Rp]
    return best[:R] < (_BIG_F * 0.5), win[:R], best[:R]
