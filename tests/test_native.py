"""Native (C++) preprocessing runtime vs the NumPy oracle."""
import numpy as np
import pytest

from cbtr_tpu import native
from cbtr_tpu.harness import preprocess
from cbtr_tpu.mesh.core import TriMesh, make_ellipsoid, make_unit_sphere
from cbtr_tpu.mesh import stl_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _numpy_pipeline(tris):
    mesh = preprocess(TriMesh(tris.copy()))
    arrays = mesh.device_arrays()
    return (
        arrays["tris"],
        arrays["fellow_triangles"],
        arrays["fellow_common_side_starts"],
        arrays["corner_average_normals"],
    )


@pytest.mark.parametrize(
    "tris",
    [
        make_unit_sphere(7, 3).tris,
        make_ellipsoid(15, 5, (1.0, 4.0, 2.0)).tris,
        stl_io.read_stl(__import__(
            "cbtr_tpu.models.scenes", fromlist=["robot_stl_path"]
        ).robot_stl_path()),
    ],
    ids=["sphere7x3", "ellipsoid15x5", "robot"],
)
def test_native_matches_numpy_pipeline(tris):
    nt, nf, ns, na = native.preprocess(tris)
    pt, pf, ps, pa = _numpy_pipeline(tris)
    np.testing.assert_allclose(nt, pt, atol=1e-6)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(ns, ps)
    np.testing.assert_allclose(na, pa, atol=1e-5)


def test_native_raises_on_open_mesh():
    open_tris = make_unit_sphere(5, 2).tris[:3]
    with pytest.raises(ValueError, match="Vertex on edge"):
        native.preprocess(open_tris)


def test_native_weld_collapses_close_vertices():
    tris = make_unit_sphere(7, 3).tris
    welded = native.weld(tris)
    flat = welded.reshape(-1, 3)
    uniq = np.unique(flat, axis=0)
    # welding must reduce distinct instances to the watertight vertex count
    assert len(uniq) <= len(np.unique(tris.reshape(-1, 3), axis=0))


def test_native_patches_trace_identically():
    """End-to-end: patches built from native preprocessing give the same
    intersections as the NumPy-preprocessed ones."""
    import jax.numpy as jnp
    from cbtr_tpu.bezier import build_patches
    from cbtr_tpu.ops import intersect_rays

    base = make_unit_sphere(9, 4)
    base.translate((5.0, 0.0, 0.0))
    nt, nf, ns, na = native.preprocess(base.tris)
    patches_native = build_patches(
        jnp.asarray(nt), jnp.asarray(nf), jnp.asarray(ns), jnp.asarray(na)
    )
    pt, pf, ps, pa = _numpy_pipeline(base.tris)
    patches_numpy = build_patches(
        jnp.asarray(pt), jnp.asarray(pf), jnp.asarray(ps), jnp.asarray(pa)
    )

    rng = np.random.default_rng(0)
    d = np.concatenate([np.ones((16, 1)), rng.uniform(-0.1, 0.1, (16, 2))], 1)
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    s = np.zeros((16, 3), np.float32)
    a = intersect_rays(patches_native, jnp.asarray(s), jnp.asarray(d))
    b = intersect_rays(patches_numpy, jnp.asarray(s), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(a.what), np.asarray(b.what))
    hit = np.asarray(a.what) == 4
    np.testing.assert_allclose(
        np.asarray(a.point)[hit], np.asarray(b.point)[hit], atol=1e-4
    )


def test_preprocess_defaults_to_native_and_matches_numpy():
    """harness.preprocess routes onto the native runtime by default (the
    scenes pipeline inherits this); results must match the NumPy oracle and
    populate the per-vertex view the visualizers read."""
    tris = make_unit_sphere(7, 3).tris
    m_native = preprocess(TriMesh(tris.copy()))
    assert m_native.corner_average_normals is not None, "native path not taken"
    m_numpy = preprocess(TriMesh(tris.copy()), use_native=False)
    assert m_numpy.corner_average_normals is None
    a = m_native.device_arrays()
    b = m_numpy.device_arrays()
    np.testing.assert_allclose(a["tris"], b["tris"], atol=1e-6)
    np.testing.assert_array_equal(a["fellow_triangles"], b["fellow_triangles"])
    np.testing.assert_array_equal(
        a["fellow_common_side_starts"], b["fellow_common_side_starts"]
    )
    np.testing.assert_allclose(
        a["corner_average_normals"], b["corner_average_normals"], atol=1e-5
    )
    # per-vertex view consistent with the corner view
    assert m_native.vertices is not None
    np.testing.assert_allclose(
        m_native.vertex_average_normals[m_native.face2vertex],
        m_native.corner_average_normals, atol=0,
    )
