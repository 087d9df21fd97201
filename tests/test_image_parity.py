"""BASELINE config 1: 128x128 sphere-lens *image* allclose vs the oracle.

The JAX path renders the image; the oracle (FastReferenceTracer — f64 NumPy,
cross-checked against the scalar ReferenceTracer below) traces the same
16384 rays one by one through both refractions and splats them with an
independent NumPy bilinear splat.  Reported and asserted:

* per-ray disagreement rate (keep-mask mismatches + position mismatches),
* pixel-level image agreement.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.harness.reference_tracer import (
    FastReferenceTracer,
    R_INSIDE,
    R_NONE,
    R_OUTSIDE,
    ReferenceTracer,
)
from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.optics import REFRACT_INSIDE, REFRACT_OUTSIDE, refract_rays
from cbtr_tpu.render.render import render_lens_image, screen_hits

RES = 128
EXTENT = 4.0


@pytest.fixture(scope="module")
def scene():
    return sphere_lens_scene(res=RES, sectors=15, belts=7)


def test_fast_tracer_matches_scalar_tracer(scene):
    """The vectorized oracle used for image parity is pinned to the scalar
    ground-truth oracle on a ray sample."""
    fast = FastReferenceTracer(scene.patches)
    slow = ReferenceTracer(scene.patches)
    rng = np.random.default_rng(21)
    n = 48
    d = np.concatenate(
        [np.ones((n, 1)), rng.uniform(-0.15, 0.15, (n, 2))], axis=1
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s = np.zeros((n, 3))
    s[:, 1:] = rng.uniform(-0.3, 0.3, (n, 2))
    for i in range(n):
        a = fast.intersect(s[i], d[i])
        b = slow.intersect(s[i], d[i])
        assert (a is None) == (b is None), f"ray {i} hit mismatch"
        if a is not None:
            assert a["patch"] == b["patch"], f"ray {i} patch mismatch"
            np.testing.assert_allclose(a["point"], b["point"], atol=1e-12)


def _oracle_trace(tracer, scene, starts, dirs):
    """Two-pass refraction + screen landing for every ray (f64 NumPy)."""
    n = scene.refractive_index
    screen = np.asarray(scene.screen_plane, np.float64)
    nrm, c = screen[:3], screen[3]
    # the screen's in-plane frame must match render.screen_hits (u from
    # geom.a_perpendicular of +x is computed the same way: normal (1,0,0))
    u = np.asarray([0.0, 1.0, 0.0])
    v = np.cross(nrm, u)
    R = len(starts)
    hit2d = np.zeros((R, 2))
    keep = np.zeros(R, bool)
    for i in range(R):
        s1, d1, st1 = tracer.refract(starts[i], dirs[i], n, R_INSIDE)
        if st1 != R_INSIDE:
            continue
        s2, d2, st2 = tracer.refract(s1, d1, n, R_OUTSIDE)
        if st2 != R_OUTSIDE:
            continue
        cos = d2 @ nrm
        if abs(cos) < 1e-5:
            continue
        t = (c - s2 @ nrm) / cos
        if t <= 0:
            continue
        p = s2 + t * d2
        hit2d[i] = [p @ u, p @ v]
        keep[i] = True
    return hit2d, keep


def _splat_numpy(hit2d, keep, extent, res):
    img = np.zeros((res, res))
    xy = (hit2d / (2.0 * extent) + 0.5) * res - 0.5
    x0 = np.floor(xy).astype(int)
    frac = xy - np.floor(xy)
    for i in np.flatnonzero(keep):
        for dx in (0, 1):
            for dy in (0, 1):
                wx = frac[i, 0] if dx else 1.0 - frac[i, 0]
                wy = frac[i, 1] if dy else 1.0 - frac[i, 1]
                ix, iy = x0[i, 0] + dx, x0[i, 1] + dy
                if 0 <= ix < res and 0 <= iy < res:
                    img[ix, iy] += wx * wy
    return img


@pytest.mark.slow
def test_sphere_image_128_matches_oracle(scene):
    """BASELINE config 1, asserted: pixel allclose + per-ray disagreement
    rate <= 0.5%."""
    # JAX per-ray landing (for the ray-level comparison)
    s1, d1, st1 = refract_rays(
        scene.patches, scene.refractive_index, scene.start, scene.direction,
        REFRACT_INSIDE,
    )
    s2, d2, st2 = refract_rays(
        scene.patches, scene.refractive_index, s1, d1, REFRACT_OUTSIDE,
    )
    alive = (np.asarray(st1) == REFRACT_INSIDE) & (
        np.asarray(st2) == REFRACT_OUTSIDE
    )
    hit2d_jax, on = screen_hits(s2, d2, scene.screen_plane)
    keep_jax = alive & np.asarray(on)
    hit2d_jax = np.asarray(hit2d_jax)

    # oracle per-ray landing
    tracer = FastReferenceTracer(scene.patches)
    starts = np.asarray(scene.start, np.float64)
    dirs = np.asarray(scene.direction, np.float64)
    hit2d_ref, keep_ref = _oracle_trace(tracer, scene, starts, dirs)

    # per-ray disagreement rate
    mask_mismatch = keep_jax != keep_ref
    both = keep_jax & keep_ref
    pos_err = np.abs(hit2d_jax[both] - hit2d_ref[both]).max(axis=-1)
    pos_mismatch = pos_err > 5e-3  # in screen units; pixels are 2*4/128=0.0625
    disagree = mask_mismatch.sum() + pos_mismatch.sum()
    rate = disagree / len(starts)
    print(f"per-ray disagreement rate: {rate:.5f} "
          f"({mask_mismatch.sum()} mask, {pos_mismatch.sum()} position)")
    assert rate <= 0.005, f"per-ray disagreement {rate:.4%}"
    # live positions agree to a fraction of a pixel on the median
    assert np.median(pos_err) < 5e-4

    # image-level agreement: render via the production path, splat the
    # oracle's rays with an independent NumPy splat
    img_jax = np.asarray(
        render_lens_image(
            scene.patches, scene.refractive_index, scene.start,
            scene.direction, scene.screen_plane, extent=EXTENT,
            resolution=RES,
        )
    )
    img_ref = _splat_numpy(hit2d_ref, keep_ref, EXTENT, RES)
    # energy conservation: both splats keep the same total weight (rays whose
    # bilinear footprint straddles the image border lose the outside corners
    # in both implementations identically)
    assert img_jax.sum() == pytest.approx(img_ref.sum(), rel=1e-3)
    # pixel agreement: the few disagreeing rays move <= a couple of units
    diff = np.abs(img_jax - img_ref)
    assert diff.max() <= 2.0 + 1e-3, f"max pixel diff {diff.max()}"
    assert (diff > 0.05).mean() <= 0.005, "too many differing pixels"
    # and aggregate: relative L1 error over the image
    rel_l1 = diff.sum() / max(img_ref.sum(), 1.0)
    print(f"image relative L1: {rel_l1:.5f}")
    assert rel_l1 <= 0.01
