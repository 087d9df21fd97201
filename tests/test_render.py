"""Renderer + emitter + visualizer tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cbtr_tpu.harness import preprocess
from cbtr_tpu.harness.visual import visualize_normals, visualize_ray
from cbtr_tpu.mesh.core import make_unit_sphere
from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.models.lens_model import (
    lens_forward,
    make_train_step,
    params_from_scene,
)
from cbtr_tpu.render import (
    angle_sweep_rays,
    ortho_ray_grid,
    pinhole_ray_grid,
    render_surface_normals,
    splat_bilinear,
)
from cbtr_tpu.render.emitters import UniformHemisphere, belt_patch_counts, sample_hemisphere


@pytest.fixture(scope="module")
def scene():
    return sphere_lens_scene(res=24, sectors=9, belts=4)


def test_cameras_produce_unit_directions():
    for start, d in (
        angle_sweep_rays(3.0, 3.0, 4, 4),
        ortho_ray_grid((0, 0, 0), (1, 0, 0), (0, 0, 1), 2.0, 2.0, 5, 7),
        pinhole_ray_grid((0, 0, 0), (5, 0, 0), (0, 0, 1), 40.0, 6, 6),
    ):
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert start.shape == d.shape


def test_angle_sweep_matches_reference_formula():
    """reference/test.cpp:352-360."""
    _, d = angle_sweep_rays(3.0, 3.0, 4, 4)
    sin_v = np.sin((2 * 3.0 + 1.0) * np.pi / 180.0)  # v=2
    sin_w = np.sin((1 * 3.0 + 1.0) * np.pi / 180.0)  # w=1
    want = np.array([np.sqrt(1 - sin_v**2 - sin_w**2), sin_v, sin_w])
    np.testing.assert_allclose(d[2 * 4 + 1], want / np.linalg.norm(want), atol=1e-6)


def test_splat_conserves_mass():
    pts = jnp.asarray([[0.0, 0.0], [1.0, -1.5], [2.5, 3.0]], jnp.float32)
    w = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    img = splat_bilinear(pts, w, extent=4.0, resolution=16)
    assert float(img.sum()) == pytest.approx(3.5, abs=1e-5)
    # a point straddling the image border sheds its out-of-image share
    img_edge = splat_bilinear(
        jnp.asarray([[3.9, 3.9]], jnp.float32),
        jnp.asarray([1.0], jnp.float32),
        extent=4.0,
        resolution=16,
    )
    assert 0.0 < float(img_edge.sum()) < 1.0
    # out-of-extent point drops
    img2 = splat_bilinear(
        jnp.asarray([[100.0, 0.0]], jnp.float32),
        jnp.asarray([1.0], jnp.float32),
        extent=4.0,
        resolution=16,
    )
    assert float(img2.sum()) == pytest.approx(0.0, abs=1e-6)


def test_lens_image_forms_and_is_differentiable(scene):
    params = params_from_scene(scene)
    img = lens_forward(
        params, scene.patches, scene.start, scene.direction, scene.screen_plane,
        resolution=32,
    )
    assert img.shape == (32, 32)
    total = float(img.sum())
    assert total > 0, "no rays reached the screen"

    g = jax.grad(
        lambda n: jnp.sum(
            lens_forward(
                params._replace(refractive_index=n), scene.patches, scene.start,
                scene.direction, scene.screen_plane, resolution=32,
            )
            ** 2
        )
    )(jnp.float32(1.3))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_train_step_reduces_loss(scene):
    params = params_from_scene(scene)
    target = lens_forward(
        params, scene.patches, scene.start, scene.direction, scene.screen_plane,
        resolution=32,
    )
    # perturb refractive index; training should pull the loss down
    params = params._replace(refractive_index=jnp.float32(1.45))
    step = make_train_step(
        scene.patches, scene.screen_plane, target, resolution=32,
        learning_rate=3e-3,
    )
    _, loss0 = step(params, scene.start, scene.direction)
    p = params
    for _ in range(5):
        p, loss = step(p, scene.start, scene.direction)
    assert float(loss) < float(loss0)


def test_surface_normal_render(scene):
    # light travels +x (from the camera side); entry normals face -x
    shade, depth, mask = render_surface_normals(
        scene.patches, scene.start, scene.direction, light_dir=(1.0, 0, 0)
    )
    mask = np.asarray(mask)
    assert mask.any()
    assert (np.asarray(shade)[mask] > 0).any()
    assert (np.asarray(depth)[mask] > 3.0).all()


def test_hemisphere_sampler_uniformity_and_patches():
    hemi = UniformHemisphere(6, seed=1)
    d, patch = hemi.sample(20000)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 0] >= 0).all()  # hemisphere around +x
    # cos(incidence) = x uniformly distributed on [0,1] for area-uniform sampling
    hist, _ = np.histogram(d[:, 0], bins=10, range=(0, 1))
    assert hist.min() > 1700 and hist.max() < 2300
    assert patch.min() >= 0 and patch.max() < hemi.patch_count
    # reference patch-count formula (reference/hostUtil.cpp:11)
    np.testing.assert_array_equal(
        belt_patch_counts(6), [4, 10, 15, 20, 23, 24]
    )

    dj = sample_hemisphere(jax.random.PRNGKey(0), 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dj), axis=-1), 1.0, atol=1e-5)


def test_visualizers_emit_meshes(tmp_path):
    mesh = preprocess(make_unit_sphere(5, 2))
    vn = visualize_normals(mesh)
    assert len(vn) == len(mesh) * 4
    beam = visualize_ray((0, 0, 0), (1, 0, 0), 5.0)
    assert len(beam) == 8
    out = tmp_path / "beam.stl"
    beam.write(str(out))
    assert out.exists()


def test_dimpled_lens_scene_end_to_end():
    """The concave dimpled fixture (reference/test.cpp:241-245) as a lens,
    end to end: with the bracket-clamped secant estimate (an improvement
    over the reference — see config.clamp_secant_estimate) enough rays
    complete the enter->exit chain to form a non-empty image."""
    from cbtr_tpu.models import dimpled_lens_scene
    from cbtr_tpu.optics import REFRACT_INSIDE, REFRACT_OUTSIDE, refract_rays
    from cbtr_tpu.render.render import render_lens_image

    scene = dimpled_lens_scene(res=16)
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
    assert alive.mean() > 0.5, f"only {alive.mean():.2f} rays completed"
    img = render_lens_image(
        scene.patches, scene.refractive_index, scene.start, scene.direction,
        scene.screen_plane, extent=4.0, resolution=16,
    )
    assert float(jnp.sum(img)) > 0.3 * alive.sum()


def test_render_emitter_image_sorted_matches_unsorted():
    """render_emitter_image sorts rays by the emitter's patch bin for sweep
    tile coherence; the splat is order-invariant so the image must equal the
    unsorted trace of the same ray multiset (up to scatter-add rounding)."""
    from cbtr_tpu.models import sphere_lens_scene, scenes
    from cbtr_tpu.render.render import render_emitter_image, render_lens_image

    sc = sphere_lens_scene(res=4)  # rays unused; we take the scene geometry
    hemi = UniformHemisphere(belts=5, seed=3)
    origin = np.asarray(scenes.LENS_CENTER) - np.array([3.0, 0, 0], np.float32)

    img = render_emitter_image(
        sc.patches, sc.refractive_index, hemi, 512, origin,
        sc.screen_plane, resolution=32,
    )

    hemi2 = UniformHemisphere(belts=5, seed=3)  # same stream -> same rays
    d, _ = hemi2.sample(512)
    s = np.broadcast_to(origin[None, :], d.shape)
    ref = render_lens_image(
        sc.patches, sc.refractive_index, jnp.asarray(s), jnp.asarray(d),
        sc.screen_plane, resolution=32,
    )
    assert float(jnp.sum(img)) > 0.0  # some rays make it through the lens
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-3)
    np.testing.assert_allclose(
        float(jnp.sum(img)), float(jnp.sum(ref)), rtol=1e-4
    )


def test_tiled_grid_same_multiset_and_device_parity():
    """The 16x8-block ray layout (render/camera.py grid_index_map) must be
    a permutation of the row-major grid (same ray multiset -> identical
    order-invariant splats) and OrthoGrid.rays_at must reproduce the host
    grid bit-for-bit in tiled mode."""
    import jax.numpy as jnp
    from cbtr_tpu.render.camera import OrthoGrid, grid_is_tileable

    args = ((0, 0, 0), (1, 0, 0), (0, 0, 1), 2.0, 1.5, 32, 16)
    s_t, d_t = ortho_ray_grid(*args)            # auto: tiled (32%16, 16%8)
    s_r, d_r = ortho_ray_grid(*args, tiled=False)
    assert grid_is_tileable(32, 16)
    # same multiset of rays
    key = lambda a: np.lexsort((a[:, 2], a[:, 1], a[:, 0]))
    np.testing.assert_array_equal(s_t[key(s_t)], s_r[key(s_r)])
    # each 128-ray tile spans exactly a 16x8 pixel block (coherence)
    xs = np.unique(s_t[:128, 1]).size
    zs = np.unique(s_t[:128, 2]).size
    assert (xs, zs) in ((16, 8), (8, 16))
    # device synthesis matches the host grid exactly
    grid = OrthoGrid(center=(0.0, 0.0, 0.0), direction=(1.0, 0.0, 0.0),
                     up=(0.0, 0.0, 1.0), width=2.0, height=1.5,
                     res_x=32, res_y=16, tiled=True)
    s_dev, d_dev = grid.rays_at(jnp.arange(grid.n_rays, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(s_dev), s_t)
    np.testing.assert_array_equal(np.asarray(d_dev), d_t)
