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
