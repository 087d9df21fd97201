"""Asserted versions of the reference's remaining manual-test drivers
(reference/test.cpp:100-235, 464-494) — what it inspected in Blender, we
assert numerically."""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.harness.drivers import (
    bezier2plane_driver,
    control_point_markers,
    custom_stl_driver,
    dump_control_points,
    followers_report,
    split_divisor_driver,
    split_maxside_driver,
    split_tall_driver,
)
from cbtr_tpu.models import robot_lens_scene, sphere_lens_scene
from cbtr_tpu.ops import intersect_rays, WHAT_INTERSECT

from cbtr_tpu.models.scenes import robot_stl_path

ROBOT = robot_stl_path()


def test_split_divisor_roundtrip(tmp_path):
    """testDequeDivisor: divisor-split multiplies faces by divisor^2, stays
    on the sphere, and the visualizations are non-empty."""
    r = split_divisor_driver("deque", 7, 3, 2.0, 3, out_dir=str(tmp_path))
    assert len(r.roundtripped) == len(r.original) * 9
    radii = np.linalg.norm(r.roundtripped.tris[:, :, :].reshape(-1, 3), axis=-1)
    # split points of flat triangles lie ON the chords — inside the sphere
    assert radii.max() <= 2.0 * (1 + 1e-4)
    assert radii.min() >= 2.0 * 0.5
    assert len(r.normals_vis) > 0 and len(r.vertex_normals_vis) > 0
    # outward orientation survived the round trip: face normals point away
    tris = r.roundtripped.tris
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    c = tris.mean(axis=1)
    assert (np.einsum("fi,fi->f", n, c) > 0).all()


def test_split_maxside_roundtrip(tmp_path):
    """testVectorMax: every emitted side obeys the max-side bound."""
    max_side = 0.7
    r = split_maxside_driver("vmax", 7, 3, 2.0, max_side, out_dir=str(tmp_path))
    tris = r.roundtripped.tris
    sides = np.stack([
        np.linalg.norm(tris[:, 0] - tris[:, 1], axis=-1),
        np.linalg.norm(tris[:, 1] - tris[:, 2], axis=-1),
        np.linalg.norm(tris[:, 2] - tris[:, 0], axis=-1),
    ])
    assert sides.max() <= max_side * (1 + 1e-4)
    assert len(r.roundtripped) > len(r.original)


def test_bezier2plane_and_control_dump(tmp_path):
    """testBezier2plane: the tessellation has P*div^2 triangles hugging the
    sphere better than the flat mesh; the control-point dump has P*10 points
    within the bounding shell."""
    radius, div = 2.0, 3
    r = bezier2plane_driver(9, 4, radius, div, out_dir=str(tmp_path))
    P = len(r.original) * 3
    assert len(r.planified) == P * div * div
    assert r.control_points.shape == (P * 10, 3)

    # Bezier tessellation points hug the sphere (sub-percent worst case,
    # vs the flat mesh whose mid-chord sag at sectors=9/belts=4 is ~6%)
    vr = np.linalg.norm(r.planified.tris.reshape(-1, 3), axis=-1)
    chord_mid = r.original.tris.mean(axis=1)
    flat_sag = np.abs(np.linalg.norm(chord_mid, axis=-1) - radius).max()
    assert np.abs(vr - radius).max() < flat_sag / 2
    assert np.abs(vr / radius - 1.0).mean() < 5e-3
    cr = np.linalg.norm(r.control_points, axis=-1)
    assert cr.max() < radius * 1.1 and cr.min() > radius * 0.8

    markers = control_point_markers(
        sphere_lens_scene(res=4, sectors=5, belts=2).patches, 0.01
    )
    assert len(markers) > 0


def test_split_tall_refines_thick_patches(tmp_path):
    """testBezierSplitTall: a coarse tall ellipsoid must trigger thick
    splits in round 1, produce more faces, and strictly reduce the max
    height ratio in round 2."""
    r = split_tall_driver(7, 3, (1.0, 4.0, 2.0), out_dir=str(tmp_path))
    assert r.num_thick1 > 0
    assert len(r.split1) > len(r.original)
    # refinement converges: round 2 finds at most as many thick faces
    assert r.num_thick2 <= r.num_thick1


def test_custom_stl_robot_with_refinement(tmp_path):
    """testCustomStl on robot.stl + the refinement pass the reference never
    ran on it: the refined surface must still be a closed, orientable mesh
    that preprocesses cleanly and intersects rays."""
    r = custom_stl_driver(ROBOT, 2, refine=True, out_dir=str(tmp_path))
    assert r.patches.num_patches == 450
    assert len(r.planified) == 450 * 4
    assert r.num_thick > 0, "robot.stl has thick patches; refinement must act"
    assert r.refined_patches is not None
    assert r.refined_patches.num_patches > r.patches.num_patches
    assert np.isfinite(np.asarray(r.refined_patches.control_points)).all()


def test_refined_robot_scene_traces_rays():
    """robot_lens_scene(refine=True) end-to-end: the refined lens still
    intersects a healthy fraction of a centered beam."""
    scene = robot_lens_scene(res=8, refine=True)
    assert scene.patches.num_patches > 450  # refinement actually split
    hit = intersect_rays(scene.patches, scene.start, scene.direction)
    frac = (np.asarray(hit.what) == WHAT_INTERSECT).mean()
    # the robot silhouette covers ~19% of the 1.8-wide beam unrefined;
    # refinement must not lose coverage
    assert frac >= 0.15, f"refined robot lens hit rate {frac}"
    assert np.isfinite(np.asarray(hit.point)).all()


def test_followers_report(tmp_path):
    """visualizeFollowers: rays near patch seams produce follow-side
    candidates; the report must name valid (patch, side, neighbour) triples."""
    scene = sphere_lens_scene(res=12, sectors=9, belts=4)
    rep = followers_report(scene.patches, scene.start, scene.direction)
    assert rep["total_follow_candidates"] > 0
    P = scene.patches.num_patches
    nb = np.asarray(scene.patches.neighbours)
    for lst in rep["followers"]:
        for patch, side, neighbour in lst:
            assert 0 <= patch < P and 0 <= side < 3
            assert neighbour == nb[patch, side]
