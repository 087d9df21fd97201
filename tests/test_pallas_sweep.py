"""Pallas sweep kernel vs the XLA sweep (interpret mode on CPU).

The kernel is the TPU production path for the O(rays x patches) stage; here
it runs under `interpret=True` so the exact same kernel code is validated
without hardware.  Codes may differ on a negligible fraction of pairs where
float associativity flips a threshold comparison; the end-to-end RayHit must
agree on hit/miss and distances.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cbtr_tpu.bezier import build_from_trimesh
from cbtr_tpu.harness import preprocess
from cbtr_tpu.mesh.core import make_unit_sphere
from cbtr_tpu.ops import intersect_rays
from cbtr_tpu.ops.intersect import sweep_codes_xla, WHAT_INTERSECT
from cbtr_tpu.ops.pallas_sweep import sweep_codes_pallas


@pytest.fixture(scope="module")
def scene():
    return build_from_trimesh(preprocess(make_unit_sphere(7, 3)))


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(7)
    n = 64
    start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    start[:, 0] -= 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(start), jnp.asarray(d)


def test_sweep_codes_match(scene, rays):
    start, d = rays
    code_x, dist_x = sweep_codes_xla(scene, start, d)
    code_p, dist_p = sweep_codes_pallas(scene, start, d, interpret=True)
    assert code_p.shape == code_x.shape
    agree = np.mean(np.asarray(code_p == code_x))
    assert agree > 0.995, f"code agreement only {agree}"
    both_hit = np.asarray((code_x & 7) == WHAT_INTERSECT) & np.asarray(
        (code_p & 7) == WHAT_INTERSECT
    )
    np.testing.assert_allclose(
        np.asarray(dist_p)[both_hit], np.asarray(dist_x)[both_hit],
        rtol=1e-4, atol=1e-4,
    )


def test_end_to_end_backends_agree(scene):
    """Hit-set agreement at the bench's own bar (>= 99.9%, mirroring the
    on-device assertion bench.py makes on 4096 rays): a 1-ray regression on
    this 1024-ray sample now fails instead of hiding inside a loose 98%."""
    rng = np.random.default_rng(3)
    n = 1024
    start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    start[:, 0] -= 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    start, d = jnp.asarray(start), jnp.asarray(d)

    a = intersect_rays(scene, start, d, backend="xla")
    b = intersect_rays(scene, start, d, backend="pallas")
    hit_a = np.asarray(a.what == WHAT_INTERSECT)
    hit_b = np.asarray(b.what == WHAT_INTERSECT)
    assert np.mean(hit_a == hit_b) >= 0.999, (
        f"hit-set agreement {np.mean(hit_a == hit_b)}"
    )
    both = hit_a & hit_b
    np.testing.assert_allclose(
        np.asarray(a.distance)[both], np.asarray(b.distance)[both],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(a.point)[both], np.asarray(b.point)[both],
        rtol=1e-4, atol=1e-4,
    )


def test_fused_select_matches_staged_pipeline(scene, rays):
    """The fused sweep+select kernel must return EXACTLY the winner the
    staged pipeline (Pallas sweep codes -> ops.intersect.select_candidates)
    computes — same any_hit, same patch, same distance (identical float
    path: the select math is deterministic on identical codes)."""
    from cbtr_tpu.ops.intersect import select_candidates
    from cbtr_tpu.ops.pallas_sweep import sweep_select_pallas

    start, d = rays
    code, dist = sweep_codes_pallas(scene, start, d, interpret=True)
    any_a, win_a, key_a = select_candidates(code, dist, scene.neighbours)
    any_b, win_b, key_b = sweep_select_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_a), np.asarray(any_b))
    hit = np.asarray(any_a)
    assert hit.sum() >= 16, "fixture too weak"
    np.testing.assert_array_equal(
        np.asarray(win_a)[hit], np.asarray(win_b)[hit]
    )
    np.testing.assert_array_equal(
        np.asarray(key_a)[hit], np.asarray(key_b)[hit]
    )


def test_fused_select_pad_and_miss_rays(scene):
    """Unaligned ray counts (padding lanes) and all-miss tiles (the
    whole-mesh-sphere early exit) stay correct in the fused kernel."""
    from cbtr_tpu.ops.pallas_sweep import sweep_select_pallas

    rng = np.random.default_rng(5)
    n = 67  # pads to 128
    start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    start[:, 0] -= 3.0
    d = np.tile(np.array([-1.0, 0.0, 0.0], np.float32), (n, 1))
    d[:32] = rng.normal(size=(32, 3)).astype(np.float32)
    t = rng.normal(size=(32, 3)).astype(np.float32) * 0.4 - start[:32]
    d[:32] = t / np.linalg.norm(t, axis=-1, keepdims=True)
    any_hit, win, key = sweep_select_pallas(
        scene, jnp.asarray(start), jnp.asarray(d), interpret=True
    )
    assert any_hit.shape == (n,)
    a = np.asarray(any_hit)
    assert a[:32].sum() >= 16          # aimed rays hit
    assert not a[32:].any()            # -x rays all miss (early-exit tiles)
    assert (np.asarray(win)[a] < scene.num_patches).all()


def test_sweep_smem_overflow_chunks_rays(scene, rays, monkeypatch):
    """When the scalar-prefetch lists would blow the SMEM budget,
    sweep_codes_pallas chunks the ray axis (the 2D streaming-grid fallback
    was deleted in round 5) — identical codes/distances."""
    import cbtr_tpu.ops.pallas_sweep as PS

    start, d = rays
    code_a, dist_a = sweep_codes_pallas(scene, start, d, interpret=True)
    monkeypatch.setattr(PS, "_SMEM_LIST_BUDGET", 0)  # every list 'overflows'
    PS._sweep_call._clear_cache()
    code_b, dist_b = sweep_codes_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(code_a), np.asarray(code_b))
    hit = np.asarray((code_a & 7) == WHAT_INTERSECT)
    np.testing.assert_allclose(
        np.asarray(dist_a)[hit], np.asarray(dist_b)[hit], rtol=1e-5, atol=1e-6
    )
    PS._sweep_call._clear_cache()


def test_winner_kernel_matches_staged_select(scene, rays):
    """The winner kernel (in-kernel running argmin + voter-side retry via
    permuted neighbour tables) must return the same winner as the staged
    pipeline: same any_hit, same patch, bit-equal distance (the voter-side
    recompute runs the identical arithmetic on an exact copy of the
    neighbour's table row)."""
    from cbtr_tpu.ops.intersect import select_candidates
    from cbtr_tpu.ops.pallas_sweep import sweep_winner_pallas

    start, d = rays
    code, dist = sweep_codes_pallas(scene, start, d, interpret=True)
    any_a, win_a, key_a = select_candidates(code, dist, scene.neighbours)
    any_b, win_b, key_b = sweep_winner_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_a), np.asarray(any_b))
    hit = np.asarray(any_a)
    assert hit.sum() >= 16, "fixture too weak"
    np.testing.assert_array_equal(np.asarray(win_a)[hit], np.asarray(win_b)[hit])
    np.testing.assert_array_equal(np.asarray(key_a)[hit], np.asarray(key_b)[hit])


def test_winner_kernel_patch_chunking(scene, rays, monkeypatch):
    """Chunking the patch axis must not change any winner: retries are
    resolved at the voter from permuted rows, so chunk boundaries cannot cut
    a retry edge."""
    import cbtr_tpu.ops.pallas_sweep as PS

    start, d = rays
    any_a, win_a, key_a = PS.sweep_winner_pallas(scene, start, d, interpret=True)
    monkeypatch.setattr(PS, "_WINNER_MAX_P", 64)  # force ceil(P/64) chunks
    assert scene.num_patches > 64
    any_b, win_b, key_b = PS.sweep_winner_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_a), np.asarray(any_b))
    hit = np.asarray(any_a)
    np.testing.assert_array_equal(np.asarray(win_a)[hit], np.asarray(win_b)[hit])
    np.testing.assert_array_equal(np.asarray(key_a)[hit], np.asarray(key_b)[hit])


def test_winner_kernel_ray_autochunk(scene, monkeypatch):
    """Ray counts beyond the SMEM-safe cap are chunked internally (no caller
    chunking needed) with identical results, including unaligned tails."""
    import cbtr_tpu.ops.pallas_sweep as PS

    rng = np.random.default_rng(11)
    n = 300  # pads to 384 = 3 tiles, then chunks at a forced cap of 128
    start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    start[:, 0] -= 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    start, d = jnp.asarray(start), jnp.asarray(d)

    any_a, win_a, key_a = PS.sweep_winner_pallas(scene, start, d, interpret=True)
    monkeypatch.setattr(PS, "safe_ray_cap",
                        lambda p, bp=None, kernel="auto": 128)
    any_b, win_b, key_b = PS.sweep_winner_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(any_a), np.asarray(any_b))
    hit = np.asarray(any_a)
    assert hit.sum() >= 16
    np.testing.assert_array_equal(np.asarray(win_a)[hit], np.asarray(win_b)[hit])
    np.testing.assert_array_equal(np.asarray(key_a)[hit], np.asarray(key_b)[hit])


def test_intersect_rays_winner_path_end_to_end(scene, monkeypatch):
    """intersect_rays routes P > _FUSED_MAX_P onto the winner kernel; the
    RayHit must agree with the XLA backend at the bench bar."""
    import cbtr_tpu.ops.pallas_sweep as PS

    monkeypatch.setattr(PS, "_FUSED_MAX_P", 0)  # force the winner path
    rng = np.random.default_rng(13)
    n = 512
    start = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    start[:, 0] -= 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - start
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    start, d = jnp.asarray(start), jnp.asarray(d)

    a = intersect_rays(scene, start, d, backend="xla")
    b = intersect_rays(scene, start, d, backend="pallas")
    hit_a = np.asarray(a.what == WHAT_INTERSECT)
    hit_b = np.asarray(b.what == WHAT_INTERSECT)
    assert np.mean(hit_a == hit_b) >= 0.999
    both = hit_a & hit_b
    np.testing.assert_allclose(
        np.asarray(a.distance)[both], np.asarray(b.distance)[both],
        rtol=1e-4, atol=1e-4,
    )


def test_sweep_patch_chunking_agrees(scene, rays, monkeypatch):
    """Chunking the patch axis (P > _RESIDENT_MAX_P) must concatenate to
    identical codes/distances — per-pair codes are patch-independent."""
    import cbtr_tpu.ops.pallas_sweep as PS

    start, d = rays
    assert scene.num_patches > 32
    code_a, dist_a = sweep_codes_pallas(scene, start, d, interpret=True)
    monkeypatch.setattr(PS, "_RESIDENT_MAX_P", 32)  # force >= 2 patch chunks
    PS._sweep_call._clear_cache()
    code_b, dist_b = sweep_codes_pallas(scene, start, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(code_a), np.asarray(code_b))
    hit = np.asarray((code_a & 7) == WHAT_INTERSECT)
    np.testing.assert_allclose(
        np.asarray(dist_a)[hit], np.asarray(dist_b)[hit], rtol=1e-5, atol=1e-6
    )
    PS._sweep_call._clear_cache()
