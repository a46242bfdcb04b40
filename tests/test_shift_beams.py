"""Unit properties of the pairwise beam reconnection shifts
(gradient_gather.beam_gradient_gather / beam3d_gradient_gather).

Identity property: when the four "offset" camera segments are the BASE
segments themselves, the reconnection shift maps every beam to itself
(same direction, same parameters), so every per-pair ratio is exactly 1:
S_i == W_i and the pair MIS weight is 1/2 wherever the shift succeeds.
This pins the shift math the way the reference pins its shift ops
(shift_volume_beams.h:273-311 Jacobians; a broken ratio shows up as
S != W under a zero shift long before an FD test notices)."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gatherpoint, gradient_gather, sppm
from tests.test_sppm import make_box_scene

CFG = GradientConfig(max_depth=5, null_bounces=3, max_cam_depth=5,
                     surface_photons=2048, volume_photons=2048,
                     grid_hash_size=1 << 12, volume_samples=1,
                     beam_tile=256, use_manifold=False)


def _setup(seed=7):
    scene = make_box_scene(w=8, h=8)
    key = jax.random.PRNGKey(seed)
    k_light, k_cam, k_g = jax.random.split(key, 3)
    photons, beams = sppm.shoot_photons(scene, CFG, 2048, k_light)
    n = scene.width * scene.height
    px = jnp.arange(n, dtype=jnp.int32) % scene.width
    py = jnp.arange(n, dtype=jnp.int32) // scene.width
    _, cam_beams = gatherpoint.trace(scene, CFG, k_cam, px, py)
    cd = jax.tree_util.tree_map(
        lambda a: a.reshape((-1,) + a.shape[2:]), cam_beams)
    cb = dict(valid=cd.valid, o=cd.o, d=cd.d, length=cd.length,
              med=cd.med, thr=cd.thr, pdf_prod=cd.pdf_prod)
    order = jnp.argsort(~cb["valid"])[:2 * n]
    cb = {k: v[order] for k, v in cb.items()}
    border = jnp.zeros((4, cb["o"].shape[0]), bool)
    r_vol = sppm.base_volume_radius(scene, CFG)
    return scene, cb, beams, border, r_vol, k_g


def test_beam1d_zero_shift_identity():
    scene, cb, beams, border, r_vol, _ = _setup()
    p, S, W, visits, shok, _ = gradient_gather.beam_gradient_gather(
        scene, cb, [cb] * 4, beams, 2048, r_vol, border)
    p, S, W = map(np.asarray, (p, S, W))
    assert np.isfinite(p).all() and p.sum() > 0
    assert int(visits) > 0
    assert int(shok) > 0, "no reconnection ever succeeded"
    # identity shift: S must equal W bitwise-close on every direction
    np.testing.assert_allclose(S, W, rtol=1e-4, atol=1e-7)
    # and the weighted base must be >= half of primal only where pairs
    # succeeded; globally S <= primal (weights <= 1)
    assert (S.sum(axis=0) <= 4 * p + 1e-6).all()
@pytest.mark.slow
def test_beam3d_zero_shift_identity():
    scene, cb, beams, border, r_vol, k_g = _setup()
    p, S, W, visits, shok, _ = gradient_gather.beam3d_gradient_gather(
        scene, cb, [cb] * 4, beams, 2048, r_vol, k_g, border,
        n_samples=1)
    p, S, W = map(np.asarray, (p, S, W))
    assert np.isfinite(p).all() and p.sum() > 0
    assert int(visits) > 0
    assert int(shok) > 0
    np.testing.assert_allclose(S, W, rtol=1e-4, atol=1e-7)
@pytest.mark.slow
def test_plane0d_zero_shift_identity():
    from gvpm_tpu.integrators import estimators
    scene, cb, beams, border, r_vol, k_g = _setup()
    planes = estimators.make_planes(scene, beams, k_g)
    p, S, W, visits, shok, _ = gradient_gather.plane_gradient_gather(
        scene, cb, [cb] * 4, planes, 2048, border)
    p, S, W = map(np.asarray, (p, S, W))
    assert np.isfinite(p).all() and p.sum() > 0
    assert int(visits) > 0
    assert int(shok) > 0
    np.testing.assert_allclose(S, W, rtol=1e-4, atol=1e-7)


def test_photon_admissibility_flags():
    """cameraSphere / minDepth / nullShift flags actually gate the pass
    (VERDICT r1: 'no config field without a reader')."""
    from gvpm_tpu.integrators import gvpm
    scene = make_box_scene(w=8, h=8)
    base = GradientConfig(max_depth=4, null_bounces=2, max_cam_depth=4,
                          surface_photons=2048, volume_photons=2048,
                          grid_hash_size=1 << 12, volume_samples=1,
                          use_manifold=False, recon_iters=5)
    out = gvpm.render(scene, base, volume="distance", passes=1, seed=0)
    m0 = float(np.asarray(out["primal"]).mean())
    assert m0 > 0

    # a camera sphere swallowing the whole scene kills every photon
    huge = dataclasses.replace(base, camera_sphere=100.0)
    out_h = gvpm.render(scene, huge, volume="distance", passes=1, seed=0)
    m_h = float(np.asarray(out_h["primal"]).mean())
    assert m_h < 0.5 * m0, (m_h, m0)

    # min_depth beyond max_depth likewise
    deep = dataclasses.replace(base, min_depth=99)
    out_d = gvpm.render(scene, deep, volume="distance", passes=1, seed=0)
    assert float(np.asarray(out_d["primal"]).mean()) < 0.5 * m0

    # nullShift debug mode still renders finite with the same primal
    nsh = dataclasses.replace(base, shift_null=True)
    out_n = gvpm.render(scene, nsh, volume="distance", passes=1, seed=0)
    pn = np.asarray(out_n["primal"])
    assert np.isfinite(pn).all()
    assert abs(pn.mean() / m0 - 1.0) < 1e-3  # primal untouched by shifts
