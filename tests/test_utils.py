"""Checkpoint round-trip + throughput meter tests."""
import numpy as np
import jax.numpy as jnp

from cbtr_tpu.bezier import build_from_trimesh
from cbtr_tpu.harness import preprocess
from cbtr_tpu.mesh.core import make_unit_sphere
from cbtr_tpu.models.lens_model import LensParams
from cbtr_tpu.utils import (
    RateMeter,
    load_params,
    load_patches,
    save_params,
    save_patches,
)
from cbtr_tpu.utils.checkpoint import latest_checkpoint


def test_patches_roundtrip(tmp_path):
    patches = build_from_trimesh(preprocess(make_unit_sphere(5, 2)))
    path = str(tmp_path / "patches.npz")
    save_patches(path, patches)
    loaded = load_patches(path)
    for a, b in zip(patches, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_roundtrip_and_latest(tmp_path):
    params = LensParams(
        control_points=jnp.ones((4, 10, 3), jnp.float32),
        refractive_index=jnp.float32(1.31),
    )
    for step in (3, 11, 7):
        save_params(str(tmp_path / f"ckpt_{step}.npz"), params, step=step)
    best = latest_checkpoint(str(tmp_path))
    assert best is not None and best.endswith("ckpt_11.npz")
    loaded, step = load_params(best, LensParams)
    assert step == 11
    np.testing.assert_allclose(
        np.asarray(loaded.control_points), np.ones((4, 10, 3))
    )
    assert float(loaded.refractive_index) == np.float32(1.31)


def test_rate_meter():
    m = RateMeter(unit="rays")
    m.tick(100)
    r = m.tick(100)
    assert r > 0
    assert m.total == 200
    assert "rays/s" in str(m)
