"""Opt-in bf16 sweep experiment (config.bf16_sweep).

Default OFF keeps the exact-f32 sweep; ON runs the Pallas sweep tile's
Bernstein-interpolate / derivative ACCUMULATIONS in bfloat16 (the sub-f32
compute-rate experiment the round-5 verdict asked to measure honestly; a
full-bf16 tile does not compile — Mosaic rejects the bf16 compare layout).
bf16's 8-bit mantissa sits far below the acceptance epsilons, so agreement
may degrade — the test pins the flag's plumbing, an agreement floor, and
that the differentiable recompute stays exact-f32 (finite gradients).
The hardware rate/agreement verdict ships in BENCH_r05's bf16_sweep row.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_default_off():
    from cbtr_tpu.config import DEFAULT as CFG

    assert CFG.bf16_sweep is False


_BF16_SCRIPT = r"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from cbtr_tpu.config import DEFAULT as CFG
object.__setattr__(CFG, "bf16_sweep", True)
assert CFG.bf16_sweep is True

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

# bf16-accumulation Pallas sweep (interpret) vs the exact-f32 XLA backend:
# agreement MAY degrade (8-bit mantissa vs 1e-5 epsilons); pin a floor so
# a silent total breakage fails.
a = intersect_rays(scene.patches, start, d, backend="pallas")
b = intersect_rays(scene.patches, start, d, backend="xla")
ha = np.asarray(a.what == WHAT_INTERSECT)
hb = np.asarray(b.what == WHAT_INTERSECT)
agree = float(np.mean(ha == hb))
assert agree >= 0.95, f"hit agreement {agree} below the bf16 floor"
both = ha & hb
same_winner = np.asarray(a.patch)[both] == np.asarray(b.patch)[both]
assert same_winner.mean() >= 0.9, f"winner agreement {same_winner.mean()}"
# where the winner agrees the recompute is the identical exact-f32
# arithmetic -> distances match tightly
np.testing.assert_allclose(
    np.asarray(a.distance)[both][same_winner],
    np.asarray(b.distance)[both][same_winner], rtol=1e-4, atol=1e-4,
)
# the differentiable recompute stays exact-f32: finite gradients
from cbtr_tpu.models.lens_model import lens_loss, params_from_scene
params = params_from_scene(scene)
g = jax.grad(
    lambda p: lens_loss(p, scene.patches, start, d, scene.screen_plane,
                        jnp.zeros((16, 16), jnp.float32), resolution=16)
)(params)
assert np.isfinite(np.asarray(g.control_points)).all()
print("BF16_SWEEP_OK", agree, float(hb.sum()))
"""


def test_bf16_sweep_subprocess_band():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["CBTR_SWEEP"] = "pallas"  # force the Pallas (interpret) sweep on CPU
    proc = subprocess.run(
        [sys.executable, "-c", _BF16_SCRIPT],
        capture_output=True, text=True, timeout=560, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BF16_SWEEP_OK" in proc.stdout, proc.stdout
