"""Gradient-domain beam/plane estimator validation: gvpm gradients with
volume in {beam1d, plane0d} vs finite differences of the primal
(reference check: computeGradientFinite, sppm.cpp:1144; gradient beam
queries BeamGradRadianceQuery shift_volume_beams.h:408 and
PlaneGradRadianceQuery shift_volume_planes.h:57)."""

import numpy as np
import pytest

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm
from tests.test_sppm import make_box_scene

CFG = GradientConfig(max_depth=5, null_bounces=3, max_cam_depth=5,
                     surface_photons=4096, volume_photons=4096,
                     beams=2048, grid_hash_size=1 << 12, volume_samples=2,
                     beam_tile=256, recon_iters=20, recon_irls_iters=1,
                     use_manifold=False)


@pytest.mark.parametrize(
    "volume",
    ["beam1d",
     pytest.param("plane0d", marks=pytest.mark.slow),
     pytest.param("beam3d", marks=pytest.mark.slow)])
def test_beam_plane_gradients_match_fd(volume):
    scene = make_box_scene(w=10, h=10)
    out = gvpm.render(scene, CFG, volume=volume, passes=4, seed=3)
    primal = np.asarray(out["primal"])
    gx = np.asarray(out["gx"])
    gy = np.asarray(out["gy"])
    assert np.isfinite(primal).all()
    assert np.isfinite(gx).all() and np.isfinite(gy).all()
    assert primal.mean() > 0
    fdx = primal[:, 1:] - primal[:, :-1]
    corr = np.corrcoef(gx[:, :-1].ravel(), fdx.ravel())[0, 1]
    assert corr > 0.35, f"{volume} gx/fd correlation {corr:.3f}"
    fdy = primal[1:, :] - primal[:-1, :]
    corr = np.corrcoef(gy[:-1, :].ravel(), fdy.ravel())[0, 1]
    assert corr > 0.35, f"{volume} gy/fd correlation {corr:.3f}"
    # unbiasedness ballpark: mean |g| comparable to mean |fd|
    assert 0.3 < (np.abs(gx[:, :-1]).mean()
                  / max(np.abs(fdx).mean(), 1e-9)) < 3.0


def test_plane_me_delta_chain():
    """plane0d ME branch (shift_volume_planes.h:57 dispatching through
    the manifold machinery, shift_medium.h:39): on a scene whose beams
    originate from a mirror bounce, delta-origin planes must take the
    ME shift (not the identity fallback), stay finite, and keep the
    FD-gradient correlation."""
    from tests.test_manifold import mirror_scene
    from gvpm_tpu.integrators import sppm as _sppm
    scene = mirror_scene()
    cfg = GradientConfig(**{**CFG.__dict__, "use_manifold": True,
                            "beams": 4096})
    r_vol = _sppm.base_volume_radius(scene, cfg)
    p, gx, gy, st = gvpm.render_pass(scene, cfg, "plane0d", 8192,
                                     3, 1, 1.0, 1.0, r_vol)
    p, gx, gy = np.asarray(p), np.asarray(gx), np.asarray(gy)
    assert np.isfinite(p).all() and np.isfinite(gx).all() \
        and np.isfinite(gy).all()
    assert p.mean() > 0
    # the mirror scene stores delta-origin beams -> planes; the ME
    # stage must attempt them (attempted pairs = collected - dropped
    # >= 0 means the stage ran; require at least one successful shift
    # beyond what use_manifold=False produces)
    cfg0 = GradientConfig(**{**CFG.__dict__, "use_manifold": False,
                             "beams": 4096})
    _, _, _, st0 = gvpm.render_pass(scene, cfg0, "plane0d", 8192,
                                    3, 1, 1.0, 1.0, r_vol)
    assert int(st["shift_ok"]) > int(st0["shift_ok"]), \
        "plane ME shifts should add successful shifts"


def test_hosted_chunks_match_fused():
    """Host-dispatched segment chunks (beam_dispatch='host', the r5
    full-scale fault fix) must reproduce the fused single-dispatch
    sweep exactly — same chunk shapes, same math, only the dispatch
    boundary moves. beam1d is deterministic given the pass key, so the
    images must agree to float tolerance."""
    from gvpm_tpu.integrators import sppm as _sppm
    scene = make_box_scene(w=8, h=8)
    n_photons = 4096
    r_vol = _sppm.base_volume_radius(scene, CFG)
    outs = {}
    for disp in ("fused", "host"):
        cfg = GradientConfig(**{**CFG.__dict__,
                                "beam_dispatch": disp,
                                "beam_seg_tile": 32})
        outs[disp] = gvpm.render_pass(scene, cfg, "beam1d", n_photons,
                                      0, 1, 1.0, 1.0, r_vol)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(outs["host"][k]),
                                   np.asarray(outs["fused"][k]),
                                   rtol=1e-5, atol=1e-7)
    assert int(outs["host"][3]["visits"]) == int(outs["fused"][3]["visits"])
