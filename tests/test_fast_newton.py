"""Opt-in fast-math Newton (config.fast_newton).

Default OFF keeps the division-exact op mix; ON swaps the Pallas sweep's
divides for the bit-trick reciprocal (pallas_sweep._fast_recip).  The flag
is trace-time-captured, so the ON semantics run in a fresh subprocess —
the same pattern as the strict-secant parity test.
"""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_off():
    from cbtr_tpu.config import DEFAULT as CFG

    assert CFG.fast_newton is False


def test_fast_recip_accuracy():
    """< 1e-5 relative error across 24 decades and both signs — tight enough
    that the 4-iteration Newton root search converges to the same ~1e-6
    surface tolerance as with exact divides."""
    from cbtr_tpu.ops.pallas_sweep import _fast_recip

    x = np.concatenate(
        [np.logspace(-12, 12, 20001, dtype=np.float32),
         -np.logspace(-12, 12, 20001, dtype=np.float32)]
    )
    r = np.asarray(_fast_recip(jnp.asarray(x)))
    rel = np.abs(r * x - 1.0)
    assert rel.max() < 1e-5, rel.max()


_FAST_SCRIPT = r"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from cbtr_tpu.config import DEFAULT as CFG
object.__setattr__(CFG, "fast_newton", True)
assert CFG.fast_newton is True

import jax.numpy as jnp
from cbtr_tpu.models import sphere_lens_scene
from cbtr_tpu.ops.intersect import intersect_rays, WHAT_INTERSECT

scene = sphere_lens_scene(res=8, sectors=9, belts=4)
rng = np.random.default_rng(7)
n = 512
start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
start[:, 0] -= 3.0
target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
d = target - start
d /= np.linalg.norm(d, axis=-1, keepdims=True)
start, d = jnp.asarray(start), jnp.asarray(d)

# fast-math Pallas sweep (interpret) vs the exact-divide XLA backend
a = intersect_rays(scene.patches, start, d, backend="pallas")
b = intersect_rays(scene.patches, start, d, backend="xla")
ha = np.asarray(a.what == WHAT_INTERSECT)
hb = np.asarray(b.what == WHAT_INTERSECT)
agree = float(np.mean(ha == hb))
assert agree >= 0.998, f"hit agreement {agree}"
both = ha & hb
np.testing.assert_allclose(
    np.asarray(a.distance)[both], np.asarray(b.distance)[both],
    rtol=1e-3, atol=1e-3,
)
# the differentiable recompute stays exact-divide: gradients finite
from cbtr_tpu.models.lens_model import lens_loss, params_from_scene
params = params_from_scene(scene)
g = jax.grad(
    lambda p: lens_loss(p, scene.patches, start, d, scene.screen_plane,
                        jnp.zeros((16, 16), jnp.float32), resolution=16)
)(params)
assert np.isfinite(np.asarray(g.control_points)).all()
print("FAST_NEWTON_OK", agree, float(hb.sum()))
"""


def test_fast_newton_subprocess_agreement():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["CBTR_SWEEP"] = "pallas"  # force the Pallas (interpret) sweep on CPU
    proc = subprocess.run(
        [sys.executable, "-c", _FAST_SCRIPT],
        capture_output=True, text=True, timeout=560, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FAST_NEWTON_OK" in proc.stdout, proc.stdout
