"""Golden parity: the batched XLA path vs the independent scalar NumPy
reference tracer (cbtr_tpu/harness/reference_tracer.py — a line-faithful
reimplementation of the C++ reference's loops with real branches).

Agreement here is the BASELINE 'allclose vs reference' gate: the two
implementations share no code paths (separate arithmetic, f64 scalar vs f32
batched)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.harness.reference_tracer import ReferenceTracer, W_INTERSECT
from cbtr_tpu.models import sphere_lens_scene, robot_lens_scene
from cbtr_tpu.ops import intersect_rays, WHAT_INTERSECT
from cbtr_tpu.optics import refract_rays, REFRACT_INSIDE


@pytest.fixture(scope="module")
def sphere():
    scene = sphere_lens_scene(res=16, sectors=9, belts=4)
    return scene, ReferenceTracer(scene.patches)


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    d = np.concatenate(
        [np.ones((n, 1)), rng.uniform(-0.11, 0.11, (n, 2))], axis=1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s = np.zeros((n, 3), np.float32)
    s[:, 1:] = rng.uniform(-0.2, 0.2, (n, 2))
    return s, d


def test_intersection_matches_reference_tracer(sphere):
    scene, tracer = sphere
    s, d = _rays(40, seed=11)
    hit = intersect_rays(scene.patches, jnp.asarray(s), jnp.asarray(d))
    what = np.asarray(hit.what)
    for i in range(len(s)):
        ref = tracer.intersect(s[i], d[i])
        if ref is None:
            assert what[i] != WHAT_INTERSECT, f"ray {i}: XLA hit, reference missed"
            continue
        assert what[i] == WHAT_INTERSECT, f"ray {i}: XLA missed, reference hit"
        assert int(hit.patch[i]) == ref["patch"], f"ray {i}: different patch"
        np.testing.assert_allclose(
            float(hit.distance[i]), ref["distance"], atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(hit.point[i]), ref["point"], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(hit.normal[i]), ref["normal"], atol=1e-3
        )


def test_refraction_matches_reference_tracer(sphere):
    scene, tracer = sphere
    s, d = _rays(24, seed=5)
    s1, d1, st = refract_rays(
        scene.patches, scene.refractive_index, jnp.asarray(s), jnp.asarray(d),
        REFRACT_INSIDE,
    )
    st = np.asarray(st)
    for i in range(len(s)):
        rs, rd, rstat = tracer.refract(s[i], d[i], scene.refractive_index, 1)
        assert st[i] == rstat, f"ray {i}: status {st[i]} vs reference {rstat}"
        if rstat != 0:
            np.testing.assert_allclose(np.asarray(s1[i]), rs, atol=2e-4)
            np.testing.assert_allclose(np.asarray(d1[i]), rd, atol=1e-3)


def test_robot_scene_parity_sample():
    scene = robot_lens_scene(res=8)
    tracer = ReferenceTracer(scene.patches)
    s = np.asarray(scene.start)[::7][:10]
    d = np.asarray(scene.direction)[::7][:10]
    hit = intersect_rays(scene.patches, jnp.asarray(s), jnp.asarray(d))
    for i in range(len(s)):
        ref = tracer.intersect(s[i], d[i])
        got_hit = int(hit.what[i]) == WHAT_INTERSECT
        ref_hit = ref is not None
        assert got_hit == ref_hit, f"ray {i}: hit mismatch"
        if ref_hit:
            np.testing.assert_allclose(
                np.asarray(hit.point[i]), ref["point"], atol=5e-4
            )
