"""Standard scenes mirroring the reference's fixtures.

Each scene = a preprocessed Bezier lens + a collimated ray grid + a screen
plane, ready for `render_lens_image`:

* sphere lens   <- makeUnitSphere fixture (reference/mesh.h:100)
* ellipsoid     <- makeEllipsoid 1,4,2 axes (reference/test.cpp:497)
* dimpled solid <- the intersection-test fixture (reference/test.cpp:241-245)
* robot.stl     <- the free-form mesh fixture (reference/test.cpp:473-494)
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..bezier import BezierPatches, build_from_trimesh
from ..harness.measure import preprocess
from ..mesh.core import (
    TriMesh,
    make_dimpled_solid,
    make_ellipsoid,
    make_unit_sphere,
)
from ..render.camera import ortho_ray_grid


def robot_stl_path() -> str:
    """Path of the robot.stl fixture (reference/test.cpp:473-494's free-form
    mesh).  The 7,584-byte binary STL is vendored in-package
    (cbtr_tpu/data/robot.stl) so the repo is self-contained; the
    CBTR_ROBOT_STL env var overrides it (e.g. to point at an upstream
    checkout for byte-identity checks)."""
    import os

    override = os.environ.get("CBTR_ROBOT_STL", "")
    if override:
        return override
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "robot.stl")


LENS_CENTER = np.array([5.0, 0.0, 0.0], np.float32)
SCREEN_X = 10.0
ROBOT_BEAM_WIDTH = 1.8      # collimated-beam edge for the robot fixture
SPHERE_BEAM_WIDTH = 1.6     # ... for the unit-sphere fixture
ELLIPSOID_BEAM_WIDTH = 3.0  # ... for the ellipsoid/dimpled fixtures


def scene_ortho_grid(res: int, beam_width: float = ROBOT_BEAM_WIDTH):
    """Device-side OrthoGrid matching _finish's host-side ray grid —
    identical ray layout (incl. the 16x8-block tile order when the
    resolution admits it), synthesized on device (render/camera.py
    OrthoGrid; used by parallel.multihost.render_multihost_ortho to avoid
    uploading the global ray array)."""
    from ..render.camera import OrthoGrid, grid_is_tileable

    return OrthoGrid(
        center=(0.0, 0.0, 0.0), direction=(1.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0), width=beam_width, height=beam_width,
        res_x=res, res_y=res, tiled=grid_is_tileable(res, res),
    )


class LensScene(NamedTuple):
    patches: BezierPatches
    start: jnp.ndarray          # [N,3]
    direction: jnp.ndarray      # [N,3]
    screen_plane: jnp.ndarray   # [4]
    refractive_index: float
    fellow: np.ndarray          # original neighbour tables (refinement input)
    fellow_starts: np.ndarray


def _finish(mesh: TriMesh, res: int, beam_width: float,
            refractive_index: float) -> LensScene:
    mesh.translate(LENS_CENTER)
    mesh = preprocess(mesh)
    patches = build_from_trimesh(mesh)
    start, direction = ortho_ray_grid(
        center=(0.0, 0.0, 0.0),
        direction=(1.0, 0.0, 0.0),
        up=(0.0, 0.0, 1.0),
        width=beam_width,
        height=beam_width,
        res_x=res,
        res_y=res,
    )
    # screen: plane x = SCREEN_X, normal -x so incoming rays see it
    screen = jnp.asarray([1.0, 0.0, 0.0, SCREEN_X], jnp.float32)
    return LensScene(
        patches=patches,
        start=jnp.asarray(start),
        direction=jnp.asarray(direction),
        screen_plane=screen,
        refractive_index=refractive_index,
        fellow=mesh.fellow_triangles,
        fellow_starts=mesh.fellow_common_side_starts,
    )


def sphere_lens_scene(res: int = 128, sectors: int = 15, belts: int = 7,
                      refractive_index: float = 1.3) -> LensScene:
    return _finish(preprocess(make_unit_sphere(sectors, belts)), res,
                   SPHERE_BEAM_WIDTH, refractive_index)


def ellipsoid_lens_scene(res: int = 128, sectors: int = 15, belts: int = 5,
                         refractive_index: float = 1.3) -> LensScene:
    mesh = preprocess(make_ellipsoid(sectors, belts, (1.0, 4.0, 2.0)))
    return _finish(mesh, res, ELLIPSOID_BEAM_WIDTH, refractive_index)


def dimpled_lens_scene(res: int = 128, sectors: int = 21, belts: int = 15,
                       refractive_index: float = 1.3) -> LensScene:
    mesh = preprocess(make_dimpled_solid(sectors, belts, (1.0, 4.0, 2.0)))
    return _finish(mesh, res, ELLIPSOID_BEAM_WIDTH, refractive_index)


def robot_lens_scene(res: int = 128, refractive_index: float = 1.3,
                     path: Optional[str] = None,
                     refine: bool = False, split: int = 0) -> LensScene:
    """The free-form robot.stl fixture as a lens (450 patches; refine=True
    runs one adaptive thick-patch split pass first — the workflow
    reference/test.cpp:473-494 stops short of; split=k uniformly divides
    every triangle k^2-fold first (Mesh::splitTriangles,
    reference/mesh.cpp:389-395) — split=4 gives 7200 patches, the
    large-P streaming-kernel regime)."""
    path = path or robot_stl_path()
    mesh = TriMesh().read(path)
    mesh = preprocess(mesh)
    # normalize to unit-ish scale around origin before lens placement
    center = mesh.tris.reshape(-1, 3).mean(axis=0)
    mesh.translate(-center)
    scale = float(np.abs(mesh.tris).max())
    mesh.scale(1.0 / scale)
    mesh = preprocess(mesh)
    if split:
        mesh.split_triangles(split)
        mesh = preprocess(mesh)
    if refine:
        from ..bezier import split_thick_patches

        patches = build_from_trimesh(mesh)
        tris, _ = split_thick_patches(
            patches, mesh.fellow_triangles, mesh.fellow_common_side_starts
        )
        mesh = preprocess(TriMesh(tris))
    return _finish(mesh, res, ROBOT_BEAM_WIDTH, refractive_index)
