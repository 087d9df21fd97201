"""DeviceEmitter: on-device, bin-sorted point-source ray synthesis.

The emitter analogue of the OrthoGrid work: render_emitter_image samples and
argsorts rays on the HOST and uploads them; DeviceEmitter partitions ray
index space over the reference's belt/patch bins (reference/hostUtil.cpp:9-13)
so rays are sorted by construction and synthesized per shard on device.
These tests pin (a) the uniform-over-area distribution, (b) the
sorted-by-bin guarantee, (c) unbiasing weights, (d) determinism in the
global index (sharding-independence), and (e) the sharded render/train
parity on the virtual 8-device mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cbtr_tpu.models import scenes, sphere_lens_scene
from cbtr_tpu.models.lens_model import params_from_scene
from cbtr_tpu.render.emitters import (
    DeviceEmitter,
    UniformHemisphere,
    belt_patch_counts,
)
from cbtr_tpu.render.render import (
    render_emitter_image,
    render_emitter_image_device,
)

EMITTER_ORIGIN = tuple(
    (np.asarray(scenes.LENS_CENTER) - np.array([3.0, 0, 0], np.float32)).tolist()
)


@pytest.fixture(scope="module")
def em():
    return DeviceEmitter(origin=(0.0, 0.0, 0.0), belts=8, n_rays=100_000,
                         seed=2)


@pytest.fixture(scope="module")
def rays(em):
    s, d, w = em.rays_at(jnp.arange(em.n_rays, dtype=jnp.int32))
    return np.asarray(s), np.asarray(d), np.asarray(w)


def test_device_emitter_uniform_over_area(em, rays):
    _, d, _ = rays
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 0] >= 0).all()  # +x hemisphere
    # uniform over hemisphere area <=> cos(incidence) = x uniform on [0,1].
    # Counts are deterministic (proportional partition) + stratified within
    # bins, so the histogram is far tighter than an iid sampler's.
    hist, _ = np.histogram(d[:, 0], bins=10, range=(0.0, 1.0))
    assert hist.min() > 0.97 * em.n_rays / 10
    assert hist.max() < 1.03 * em.n_rays / 10
    # turn angle uniform on [0, 2pi)
    turn = np.arctan2(d[:, 2], d[:, 1]) % (2 * np.pi)
    hist_t, _ = np.histogram(turn, bins=8, range=(0.0, 2 * np.pi))
    assert hist_t.min() > 0.95 * em.n_rays / 8
    assert hist_t.max() < 1.05 * em.n_rays / 8


def test_device_emitter_sorted_by_reference_bin(em, rays):
    """Rays must arrive ordered by the reference's belt/patch bin — the
    whole point of the index-space partition (sweep-tile coherence with
    zero sort cost)."""
    _, d, _ = rays
    hemi = UniformHemisphere(belts=em.belts)
    incidence = np.arccos(np.clip(d[:, 0], -1.0, 1.0))
    turn = np.arctan2(d[:, 2], d[:, 1]) % (2 * np.pi)
    belt = np.minimum(
        (incidence / hemi.belt_width).astype(np.int64), em.belts - 1
    )
    patch = hemi.patch_starts[belt] + np.minimum(
        (turn / hemi.patch_widths[belt]).astype(np.int64),
        belt_patch_counts(em.belts)[belt] - 1,
    )
    # float roundoff at bin edges may flip a ray into the adjacent bin;
    # the sequence must still be non-decreasing for ~all adjacent pairs.
    frac_sorted = float(np.mean(np.diff(patch) >= 0))
    assert frac_sorted > 0.995, frac_sorted


def test_device_emitter_weights_unbiased(em, rays):
    _, _, w = rays
    # sum(w) = n * sum(area fractions of non-empty bins) — n exactly when
    # every bin got at least one ray (true at this n/belts ratio)
    assert abs(w.sum() - em.n_rays) < 1e-3 * em.n_rays
    assert w.min() > 0.3 and w.max() < 3.0  # rounding-level corrections only


def test_device_emitter_deterministic_in_global_index(em):
    """rays_at must be a pure function of the GLOBAL index so sharded
    synthesis (disjoint index slices per device) reproduces the
    single-device rays bit-for-bit."""
    full = em.rays_at(jnp.arange(em.n_rays, dtype=jnp.int32))
    part = em.rays_at(jnp.arange(37, 91, dtype=jnp.int32))
    for a, b in zip(full, part):
        np.testing.assert_array_equal(np.asarray(a)[37:91], np.asarray(b))


@pytest.fixture(scope="module")
def sc():
    return sphere_lens_scene(res=4)  # rays unused; geometry only


def test_device_emitter_image_matches_host_emitter(sc):
    """Same scene, same ray count: the device emitter's image must agree
    statistically with the host sampler's (both estimate the same
    irradiance integral; the device one is stratified)."""
    n = 4096
    dev = DeviceEmitter(origin=EMITTER_ORIGIN, belts=5, n_rays=n, seed=3)
    img_dev = render_emitter_image_device(
        sc.patches, sc.refractive_index, dev, sc.screen_plane, resolution=32
    )
    hemi = UniformHemisphere(belts=5, seed=3)
    img_host = render_emitter_image(
        sc.patches, sc.refractive_index, hemi, n,
        np.asarray(EMITTER_ORIGIN, np.float32), sc.screen_plane,
        resolution=32,
    )
    f_dev = float(jnp.sum(img_dev))
    f_host = float(jnp.sum(img_host))
    assert f_dev > 0.0 and f_host > 0.0
    # total transmitted flux: Monte-Carlo agreement between two estimators
    assert abs(f_dev - f_host) < 0.12 * max(f_dev, f_host), (f_dev, f_host)


def test_multihost_emitter_render_matches_single_device(sc):
    from cbtr_tpu.parallel.multihost import (
        multihost_mesh,
        render_multihost_emitter,
    )

    n = 2048
    dev = DeviceEmitter(origin=EMITTER_ORIGIN, belts=5, n_rays=n, seed=3)
    single = render_emitter_image_device(
        sc.patches, sc.refractive_index, dev, sc.screen_plane, resolution=32
    )
    mesh = multihost_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices
    sharded = render_multihost_emitter(
        mesh, sc.patches, sc.refractive_index, dev, sc.screen_plane,
        resolution=32,
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=2e-4
    )


def test_multihost_emitter_train_step_descends(sc):
    from cbtr_tpu.parallel.multihost import (
        make_multihost_train_step_emitter,
        multihost_mesh,
    )

    dev = DeviceEmitter(origin=EMITTER_ORIGIN, belts=5, n_rays=2048, seed=3)
    mesh = multihost_mesh()
    # target: the emitter image of the UNPERTURBED lens; start from a
    # slightly inflated control net and fit back toward it
    target = render_emitter_image_device(
        sc.patches, sc.refractive_index, dev, sc.screen_plane, resolution=32
    )
    step = make_multihost_train_step_emitter(
        mesh, sc.patches, sc.screen_plane, target, dev, resolution=32,
        learning_rate=2e-4,
    )
    params = params_from_scene(sc)
    params = params._replace(control_points=params.control_points * 1.02)
    p1, loss0, g0 = step(params)
    p2, loss1, _ = step(p1)
    _, loss2, _ = step(p2)
    gn = float(jnp.linalg.norm(g0.control_points))
    assert np.isfinite(float(loss0)) and np.isfinite(gn) and gn > 0
    assert float(loss2) < float(loss0)
