"""Manifold (ME) shift for photon BEAMS (VERDICT r3 task 5): delta-origin
beams (glass refraction into the medium) get a chain-solved shift instead
of falling to the identity — reference shiftBeamME
(shift_volume_beams.h:440, shift_volume_beams.cpp:748)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gradient_gather, gvpm, sppm
from gvpm_tpu.scenes import caustic_glass

CFG_KW = dict(max_depth=5, null_bounces=3, max_cam_depth=4,
              surface_photons=4096, volume_photons=4096, beams=2048,
              grid_hash_size=1 << 12, volume_samples=1,
              grid_dims=(16, 16, 16), gather_window=512,
              window_q_tile=32, vol_segments_per_pixel=2,
              me_pair_budget=512, beam_seg_tile=0)


@pytest.fixture(scope="module")
def scene():
    return caustic_glass(width=12, height=12)


def _pass(scene, volume, use_manifold, seed=3):
    cfg = GradientConfig(use_manifold=use_manifold, **CFG_KW)
    r_vol = sppm.base_volume_radius(scene, cfg)
    p, gx, gy, st = gvpm.render_pass(scene, cfg, volume, 4096, seed, 1,
                                     1.0, 1.0, r_vol)
    return (np.asarray(p), np.asarray(gx), np.asarray(gy),
            {k: int(v) for k, v in st.items()})


def test_beams_have_me_eligible_origins(scene):
    """The caustic-glass scene must actually produce delta-origin beams
    — otherwise the ME tests below are vacuous."""
    cfg = GradientConfig(**CFG_KW)
    photons, beams = sppm.shoot_photons(
        scene, cfg, 4096, jax.random.key(1))
    elig = gradient_gather._beam_me_elig(scene, beams)
    assert int(jnp.sum(elig)) > 0, "no ME-eligible beams in the scene"


@pytest.mark.parametrize(
    "volume",
    ["beam1d", pytest.param("beam3d", marks=pytest.mark.slow)])
def test_beam_me_fires_and_stays_finite(scene, volume):
    p0, gx0, gy0, st0 = _pass(scene, volume, use_manifold=False)
    p1, gx1, gy1, st1 = _pass(scene, volume, use_manifold=True)
    for a in (p1, gx1, gy1):
        assert np.isfinite(a).all()
    # the primal is untouched by the shift machinery
    np.testing.assert_allclose(p1, p0, rtol=1e-4, atol=1e-7)
    # ME must actually fire: successful shifts strictly increase (the
    # identity pairs it replaces are counted in ok_rc/ok_id, ME adds
    # its own ok_i on pairs that had NO shift before)
    assert st1["shift_ok"] > st0["shift_ok"], (st0, st1)


@pytest.mark.slow
def test_beam1d_me_gradients_track_fd(scene):
    """With ME on, beam1d gradients must still track finite differences
    of the primal at least as well as with ME off (caustic transport)."""
    cfg_kw = dict(CFG_KW, surface_photons=8192, volume_photons=8192)
    corrs = {}
    for me in (False, True):
        cfg = GradientConfig(use_manifold=me, **cfg_kw)
        r_vol = sppm.base_volume_radius(scene, cfg)
        P = jnp.zeros((12, 12, 3))
        GX = jnp.zeros((12, 12, 3))
        for it in range(4):
            p, gx, gy, _ = gvpm.render_pass(scene, cfg, "beam1d", 8192,
                                            7, it, 1.0, 1.0, r_vol)
            P, GX = P + p, GX + gx
        P, GX = np.asarray(P), np.asarray(GX)
        fdx = P[:, 1:] - P[:, :-1]
        corrs[me] = np.corrcoef(GX[:, :-1].ravel(), fdx.ravel())[0, 1]
    assert corrs[True] > 0.2, corrs
    assert corrs[True] > corrs[False] - 0.15, corrs
