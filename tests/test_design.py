"""Mesh-vertex lens design (models/design.py + benchmarks/design_lens.py).

The full converged artifact (DESIGN_r05.json: 2,000 staged-adam steps,
262k rays, >=100x loss drop) runs on hardware; here the SAME trajectory
runs at reduced scale on CPU — same staged schedule, same flat-top target,
same pattern+flux loss — asserting the descent shape (>=10x drop, best
iterate in the later half).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_patches_from_vertices_matches_host_build():
    """The differentiable rebuild must reproduce build_from_trimesh exactly
    (same tris, same topology -> same control points/tables)."""
    import jax.numpy as jnp  # noqa: F401

    from cbtr_tpu.bezier import build_from_trimesh
    from cbtr_tpu.harness import preprocess
    from cbtr_tpu.mesh.core import make_unit_sphere
    from cbtr_tpu.models.design import (
        patches_from_vertices,
        topology_from_mesh,
    )

    mesh = preprocess(make_unit_sphere(7, 3))
    topo, params = topology_from_mesh(mesh)
    a = patches_from_vertices(params, topo)
    b = build_from_trimesh(mesh)
    np.testing.assert_allclose(
        np.asarray(a.control_points), np.asarray(b.control_points), atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(a.neighbours), np.asarray(b.neighbours)
    )
    np.testing.assert_allclose(
        np.asarray(a.underlying), np.asarray(b.underlying), atol=2e-5
    )


def test_design_gradients_flow_to_vertices():
    """d(loss)/d(vertices) exists, is finite, and is nonzero — the whole
    Clough-Tocher construction differentiates."""
    import jax
    import jax.numpy as jnp

    from cbtr_tpu.harness import preprocess
    from cbtr_tpu.mesh.core import make_unit_sphere
    from cbtr_tpu.models.scenes import LENS_CENTER
    from cbtr_tpu.models.design import design_loss, topology_from_mesh

    mesh = preprocess(make_unit_sphere(5, 2))
    mesh.translate(LENS_CENTER)
    mesh = preprocess(mesh)
    topo, params = topology_from_mesh(mesh)
    rng = np.random.default_rng(3)
    n = 256
    d = np.stack([np.ones(n), 0.1 * rng.normal(size=n),
                  0.1 * rng.normal(size=n)], -1)
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    s = jnp.zeros((n, 3), jnp.float32)
    screen = jnp.asarray([1.0, 0.0, 0.0, 10.0], jnp.float32)
    target = jnp.ones((8, 8), jnp.float32)

    g = jax.grad(
        lambda p: design_loss(p, topo, s, jnp.asarray(d), screen, target,
                              resolution=8)[0]
    )(params)
    gv = np.asarray(g.vertices)
    assert np.isfinite(gv).all()
    assert np.abs(gv).max() > 0.0
    assert np.isfinite(float(g.refractive_index))


@pytest.mark.slow
def test_design_smoke_trajectory():
    """Reduced-scale run of the DESIGN artifact script: staged adam on the
    flat-top target must drop the loss >= 10x (the script asserts it)."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks/design_lens.py"),
         "--smoke"],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
