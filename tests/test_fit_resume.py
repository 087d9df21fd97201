"""Preemption/resume and ray-coherence-sort tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.models.fit import fit_lens
from cbtr_tpu.ops.intersect import intersect_rays
from cbtr_tpu.render.emitters import UniformHemisphere
from cbtr_tpu.render.ray_sort import (
    coherence_keys,
    intersect_rays_sorted,
    sort_rays,
)


@pytest.fixture(scope="module")
def scene():
    return sphere_lens_scene(res=12, sectors=9, belts=4)


def test_fit_descends_and_checkpoints(scene, tmp_path):
    target = jnp.zeros((12, 12), jnp.float32)
    params, losses = fit_lens(
        scene, target, steps=4, checkpoint_dir=str(tmp_path),
        checkpoint_every=2, learning_rate=1e-4,
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0]
    assert (tmp_path / "ckpt_4.npz").exists()


def test_fit_resume_matches_uninterrupted_run(scene, tmp_path):
    """Kill-and-resume converges to bit-identical parameters: 3 steps +
    resume for 3 == 6 straight (SGD is deterministic)."""
    target = jnp.zeros((12, 12), jnp.float32)
    p_straight, l_straight = fit_lens(
        scene, target, steps=6, learning_rate=1e-4
    )

    ckpt = tmp_path / "ckpts"
    fit_lens(scene, target, steps=3, checkpoint_dir=str(ckpt),
             checkpoint_every=1, learning_rate=1e-4)
    # "preemption": a fresh invocation resumes from ckpt_3
    p_resumed, l_resumed = fit_lens(
        scene, target, steps=6, checkpoint_dir=str(ckpt),
        checkpoint_every=1, learning_rate=1e-4,
    )
    assert len(l_resumed) == 3  # only steps 3..5 re-ran
    np.testing.assert_array_equal(
        np.asarray(p_straight.control_points),
        np.asarray(p_resumed.control_points),
    )
    np.testing.assert_array_equal(
        np.asarray(p_straight.refractive_index),
        np.asarray(p_resumed.refractive_index),
    )
    assert l_resumed == l_straight[3:]


def test_sorted_intersection_identical_results(scene):
    """Coherence sort/unsort is a pure permutation: bit-identical RayHit in
    the caller's order, on a shuffled emitter-style bundle."""
    rng = np.random.default_rng(3)
    hemi = UniformHemisphere(belts=4, seed=1)
    d, patch = hemi.sample(256)
    d = d * np.array([1.0, 0.25, 0.25], np.float32)  # narrow toward the lens
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s = np.zeros((256, 3), np.float32)
    s[:, 1:] = rng.uniform(-0.3, 0.3, (256, 2)).astype(np.float32)

    a = intersect_rays(scene.patches, jnp.asarray(s), jnp.asarray(d))
    b = intersect_rays_sorted(scene.patches, jnp.asarray(s), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(a.what), np.asarray(b.what))
    np.testing.assert_array_equal(np.asarray(a.patch), np.asarray(b.patch))
    live = np.asarray(a.what) == 4
    for leaf_a, leaf_b in zip(a, b):
        # live lanes only: dead-lane garbage differs at the ulp because CPU
        # SIMD body-vs-tail codegen rounds FMA contractions differently
        # depending on a ray's row position
        np.testing.assert_allclose(
            np.asarray(leaf_a)[live], np.asarray(leaf_b)[live],
            rtol=1e-6, atol=1e-6,
        )
    # emitter patch index works as the key too (the reference's own binning)
    c = intersect_rays_sorted(
        scene.patches, jnp.asarray(s), jnp.asarray(d), keys=jnp.asarray(patch)
    )
    np.testing.assert_array_equal(np.asarray(a.what), np.asarray(c.what))


def test_coherence_keys_group_neighbours():
    """Rays with equal octant and nearby origins share keys; opposite
    directions never do."""
    s = np.zeros((4, 3), np.float32)
    d = np.array(
        [[1, 0.1, 0.1], [1, 0.12, 0.09], [-1, 0.1, 0.1], [1, -0.1, 0.1]],
        np.float32,
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    keys = np.asarray(coherence_keys(jnp.asarray(s), jnp.asarray(d)))
    assert keys[0] == keys[1]
    assert keys[0] != keys[2]
    assert keys[0] != keys[3]
    # sort_rays round-trips
    ss, dd, inv = sort_rays(jnp.asarray(s), jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(dd)[np.asarray(inv)], d)


def test_emitter_fit_descends_to_self_consistent_target(scene):
    """fit_emitter_lens: point-source hemisphere illumination fit — the
    reference's motivating car-lamp use case (reference/README.md:159-165,
    hostUtil.cpp:9-29).  Target = the true lens's emitter image; starting
    from perturbed control points the loss must descend monotonically-ish
    and gradients stay finite (TIR/dead rays zeroed, not NaNed)."""
    from cbtr_tpu.models.fit import emitter_rays, fit_emitter_lens
    from cbtr_tpu.models.lens_model import LensParams, lens_forward, params_from_scene

    n_rays, belts, seed = 2048, 8, 3
    s, d = emitter_rays(n_rays, belts=belts, seed=seed)
    true_params = params_from_scene(scene)
    target = lens_forward(
        true_params, scene.patches, s, d, scene.screen_plane, resolution=24
    )
    assert float(jnp.sum(target)) > 0, "emitter rays never reach the screen"

    rng = np.random.default_rng(0)
    pert = LensParams(
        control_points=true_params.control_points
        + jnp.asarray(
            rng.normal(scale=2e-3, size=true_params.control_points.shape),
            jnp.float32,
        ),
        refractive_index=true_params.refractive_index + 0.01,
    )
    params, losses = fit_emitter_lens(
        scene, target, steps=6, n_rays=n_rays, belts=belts, seed=seed,
        learning_rate=5e-4, resolution=24, init_params=pert,
    )
    assert len(losses) == 6
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(np.asarray(params.control_points)).all()


def test_emitter_rays_are_bin_sorted():
    from cbtr_tpu.models.fit import emitter_rays
    from cbtr_tpu.render.emitters import UniformHemisphere

    n = 1024
    s, d = emitter_rays(n, belts=8, seed=3)
    assert s.shape == (n, 3) and d.shape == (n, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5
    )
    # same sampler, same seed -> the sort key must be non-decreasing
    em = UniformHemisphere(belts=8, seed=3)
    _, patch = em.sample(n)
    assert (np.diff(np.sort(patch, kind="stable")) >= 0).all()
    d_raw, patch_raw = UniformHemisphere(belts=8, seed=3).sample(n)
    order = np.argsort(patch_raw, kind="stable")
    np.testing.assert_array_equal(np.asarray(d), d_raw[order])
