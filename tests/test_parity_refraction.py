"""Status-by-status refraction parity vs the independent scalar oracle.

Covers every RefractionResult outcome of BezierLens::refract
(reference/bezierLens.cpp:4-34): entering (cInside), exiting (cOutside),
TIR-killed, grazing pass-through, and the expected-state guard — the paths
test_parity.py's entry-only check left uncovered.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.harness.reference_tracer import (
    R_INSIDE,
    R_NONE,
    R_OUTSIDE,
    ReferenceTracer,
)
from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.optics import (
    REFRACT_INSIDE,
    REFRACT_NONE,
    REFRACT_OUTSIDE,
    refract_rays,
)

CENTER = np.array([5.0, 0.0, 0.0], np.float64)


@pytest.fixture(scope="module")
def sphere():
    scene = sphere_lens_scene(res=8, sectors=9, belts=4)
    return scene, ReferenceTracer(scene.patches)


def _assert_matches(scene, tracer, starts, dirs, expected, min_live=0):
    s1, d1, st = refract_rays(
        scene.patches, scene.refractive_index, jnp.asarray(starts, jnp.float32),
        jnp.asarray(dirs, jnp.float32), expected,
    )
    st = np.asarray(st)
    live = 0
    for i in range(len(starts)):
        rs, rd, rstat = tracer.refract(
            starts[i], dirs[i], scene.refractive_index, expected
        )
        assert st[i] == rstat, (
            f"ray {i}: status {st[i]} vs oracle {rstat}"
        )
        if rstat != R_NONE:
            live += 1
            # atol 1e-3: steep-incidence interior rays sit at the Newton
            # loop's worst convergence (reference's own worst case is 2e-4
            # in f64, reference/README.md:110; f32 roughly doubles it)
            np.testing.assert_allclose(np.asarray(s1[i]), rs, atol=1e-3)
            np.testing.assert_allclose(np.asarray(d1[i]), rd, atol=3e-3)
    assert live >= min_live, f"only {live} live rays — fixture too weak"
    return st


def test_exiting_rays_match_oracle(sphere):
    """expected=cOutside from inside the glass (reference/test.cpp:376 second
    leg): statuses and refracted rays match the oracle."""
    scene, tracer = sphere
    rng = np.random.default_rng(4)
    n = 24
    # start inside the unit sphere, heading outward in random directions
    starts = CENTER + rng.uniform(-0.3, 0.3, (n, 3))
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    _assert_matches(
        scene, tracer, starts.astype(np.float32), dirs.astype(np.float32),
        REFRACT_OUTSIDE, min_live=12,
    )


def test_tir_rays_match_oracle(sphere):
    """Near-tangent exits: sin^2 >= 0.99 rejects (TIR / steep grazing,
    reference/bezierLens.cpp:13).  Construct rays from inside aimed to hit
    the surface at very shallow angles and check the oracle agrees on every
    status, including which rays die."""
    scene, tracer = sphere
    rng = np.random.default_rng(9)
    n = 32
    # start near the center-ish, aim close to tangent at impact: a chord far
    # from the center gives high incidence angle.  sin(theta_inc) = b (impact
    # parameter for a unit sphere); TIR for n=1.3 needs sin >= 0.765/1 ->
    # aim at chords with offset ~0.8..0.99
    starts = []
    dirs = []
    for _ in range(n):
        # random chord: impact parameter spanning the TIR threshold
        # (sin(theta_inc) = b on a unit sphere; cutoff at b ~ 0.765 for
        # n=1.3 via n^2 sin^2 >= 0.99, reference/bezierLens.h:16)
        b = rng.uniform(0.5, 0.99)
        phi = rng.uniform(0, 2 * np.pi)
        # plane through center: ray along +x' offset by b in y'
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        # build orthonormal frame (u, v) perpendicular to axis
        u = np.cross(axis, [0.0, 0.0, 1.0])
        if np.linalg.norm(u) < 1e-6:
            u = np.cross(axis, [0.0, 1.0, 0.0])
        u /= np.linalg.norm(u)
        v = np.cross(axis, u)
        offset = b * (np.cos(phi) * u + np.sin(phi) * v)
        direction = np.cos(phi + np.pi / 2) * u + np.sin(phi + np.pi / 2) * v
        starts.append(CENTER + offset - 0.3 * direction)
        dirs.append(direction)
    starts = np.asarray(starts, np.float32)
    dirs = np.asarray(dirs, np.float32)
    st = _assert_matches(scene, tracer, starts, dirs, REFRACT_OUTSIDE)
    # the band must actually produce some TIR deaths AND some survivors
    assert (np.asarray(st) == REFRACT_NONE).sum() >= 4, "no TIR rays produced"
    assert (np.asarray(st) == REFRACT_OUTSIDE).sum() >= 4, "no survivors"


def test_near_normal_incidence_matches_oracle(sphere):
    """Rays aimed at the sphere center hit at (nearly) normal incidence
    (reference/bezierLens.cpp:14,22 pass-through regime up to the Bezier
    approximation's ~1e-3 normal tilt): both implementations must agree and
    bend only negligibly."""
    scene, tracer = sphere
    offsets = np.array(
        [[0.0, 0.0, 0.0], [0.0, 1e-6, 0.0], [0.0, 0.0, -1e-6]], np.float32
    )
    dirs = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (3, 1))
    s1, d1, st = refract_rays(
        scene.patches, scene.refractive_index, jnp.asarray(offsets),
        jnp.asarray(dirs), REFRACT_INSIDE,
    )
    st = np.asarray(st)
    for i in range(3):
        rs, rd, rstat = tracer.refract(
            offsets[i], dirs[i], scene.refractive_index, R_INSIDE
        )
        assert st[i] == rstat == R_INSIDE
        np.testing.assert_allclose(np.asarray(d1[i]), rd, atol=1e-3)
        # near-normal: the bend is bounded by the surface-normal tilt
        assert float(jnp.linalg.norm(d1[i] - dirs[i])) < 5e-3


def test_grazing_passthrough_branch_parity(sphere):
    """The sin^2 <= 1e-12 pass-through branch itself
    (reference/bezierLens.cpp:14,22): both implementations share the exact
    cutoff constant, verified on the config values and by the status math
    of near-normal rays above; here assert the constants are the reference's
    (reference/bezierLens.h:16-17)."""
    from cbtr_tpu.config import DEFAULT as CFG

    assert CFG.min_sin2_refraction == 1e-12
    assert CFG.max_sin2_refraction == 0.99


_STRICT_PARITY_SCRIPT = r"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

# strict upstream semantics: disable the clamp BEFORE any jit trace — the
# flag is captured at trace time (see cbtr_tpu/config.py).
from cbtr_tpu.config import DEFAULT as CFG
object.__setattr__(CFG, "clamp_secant_estimate", False)
assert CFG.clamp_secant_estimate is False

import jax.numpy as jnp
from cbtr_tpu.harness.reference_tracer import R_INSIDE, R_NONE, R_OUTSIDE, ReferenceTracer
from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.optics import REFRACT_INSIDE, REFRACT_OUTSIDE, refract_rays

scene = sphere_lens_scene(res=8, sectors=9, belts=4)
tracer = ReferenceTracer(scene.patches)
rng = np.random.default_rng(13)
n = 16
d = np.concatenate([np.ones((n, 1)), rng.uniform(-0.12, 0.12, (n, 2))], axis=1).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
s = np.zeros((n, 3), np.float32)
s[:, 1:] = rng.uniform(-0.25, 0.25, (n, 2)).astype(np.float32)

s1, d1, st1 = refract_rays(scene.patches, scene.refractive_index, jnp.asarray(s), jnp.asarray(d), REFRACT_INSIDE)
s2, d2, st2 = refract_rays(scene.patches, scene.refractive_index, s1, d1, REFRACT_OUTSIDE)
matched = 0
for i in range(n):
    rs1, rd1, rst1 = tracer.refract(s[i], d[i], scene.refractive_index, R_INSIDE)
    assert int(st1[i]) == rst1, f"ray {i} pass-1 status {int(st1[i])} vs {rst1}"
    if rst1 == R_NONE:
        continue
    rs2, rd2, rst2 = tracer.refract(rs1, rd1, scene.refractive_index, R_OUTSIDE)
    assert int(st2[i]) == rst2, f"ray {i} pass-2 status {int(st2[i])} vs {rst2}"
    if rst2 != R_NONE:
        np.testing.assert_allclose(np.asarray(s2[i]), rs2, atol=5e-4)
        np.testing.assert_allclose(np.asarray(d2[i]), rd2, atol=2e-3)
        matched += 1
assert matched >= 10, matched
print("STRICT_PARITY_OK", matched)
"""


def test_strict_unclamped_secant_parity_subprocess():
    """clamp_secant_estimate=False pins TRUE upstream semantics (the
    unclamped secant of reference/bezierTriangle.cpp:137-152) — with the
    flag on by default, the rest of the parity suite validates a deliberate
    deviation against an oracle applying the same deviation.  Runs in a
    fresh subprocess because the flag is captured at jit trace time."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _STRICT_PARITY_SCRIPT],
        capture_output=True, text=True, timeout=560, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "STRICT_PARITY_OK" in proc.stdout


def test_two_pass_state_machine_matches_oracle(sphere):
    """Full enter->exit chain (the illumination loop state machine,
    reference/test.cpp:376-394) against the oracle chained the same way."""
    scene, tracer = sphere
    rng = np.random.default_rng(13)
    n = 16
    d = np.concatenate(
        [np.ones((n, 1)), rng.uniform(-0.12, 0.12, (n, 2))], axis=1
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s = np.zeros((n, 3), np.float32)
    s[:, 1:] = rng.uniform(-0.25, 0.25, (n, 2)).astype(np.float32)

    s1, d1, st1 = refract_rays(
        scene.patches, scene.refractive_index, jnp.asarray(s), jnp.asarray(d),
        REFRACT_INSIDE,
    )
    s2, d2, st2 = refract_rays(
        scene.patches, scene.refractive_index, s1, d1, REFRACT_OUTSIDE,
    )
    matched_full = 0
    for i in range(n):
        rs1, rd1, rst1 = tracer.refract(s[i], d[i], scene.refractive_index, R_INSIDE)
        assert int(st1[i]) == rst1, f"ray {i} pass-1 status"
        if rst1 == R_NONE:
            continue
        rs2, rd2, rst2 = tracer.refract(rs1, rd1, scene.refractive_index, R_OUTSIDE)
        assert int(st2[i]) == rst2, f"ray {i} pass-2 status"
        if rst2 != R_NONE:
            np.testing.assert_allclose(np.asarray(s2[i]), rs2, atol=5e-4)
            np.testing.assert_allclose(np.asarray(d2[i]), rd2, atol=2e-3)
            matched_full += 1
    assert matched_full >= 10
