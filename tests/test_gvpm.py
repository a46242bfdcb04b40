"""G-VPM gradient validation: gradients vs finite differences of the
primal (the reference ships exactly this check: computeGradientFinite,
sppm.cpp:1144), plus reconstruction sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm
from tests.test_sppm import make_box_scene

# use_manifold off here: the ME machinery has its own tests
# (test_manifold.py); keeping it out of this config halves compile time
CFG = GradientConfig(max_depth=5, null_bounces=3, max_cam_depth=5,
                     surface_photons=16384, volume_photons=16384,
                     grid_hash_size=1 << 14, volume_samples=2,
                     initial_scale=1.0, grid_max_photons_per_cell=160,
                     recon_iters=40, recon_irls_iters=2,
                     use_manifold=False)


@pytest.fixture(scope="module")
def gvpm_out():
    scene = make_box_scene(w=12, h=12)
    return scene, gvpm.render(scene, CFG, volume="distance", passes=6,
                              seed=11)


def test_gradients_match_finite_differences(gvpm_out):
    _, out = gvpm_out
    primal = np.asarray(out["primal"])
    gx = np.asarray(out["gx"])
    gy = np.asarray(out["gy"])
    assert np.isfinite(primal).all()
    assert np.isfinite(gx).all() and np.isfinite(gy).all()
    # finite differences of the primal
    fdx = primal[:, 1:] - primal[:, :-1]
    fdy = primal[1:, :] - primal[:-1, :]
    # compare where the signal is meaningful; both are noisy MC estimates
    # of the same quantity -> correlation must be clearly positive
    a = gx[:, :-1].ravel()
    b = fdx.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.4, f"gx/fd correlation {corr:.3f}"
    a = gy[:-1, :].ravel()
    b = fdy.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.4, f"gy/fd correlation {corr:.3f}"
    # magnitudes in the same ballpark (MIS-weighted unbiased estimates)
    assert 0.3 < (np.abs(gx[:, :-1]).mean() /
                  max(np.abs(fdx).mean(), 1e-9)) < 3.0


def test_reconstruction_improves_or_matches_primal(gvpm_out):
    scene, out = gvpm_out
    img = np.asarray(out["image"])
    primal = np.asarray(out["primal"])
    assert np.isfinite(img).all()
    # reconstruction must stay anchored to the primal exposure
    assert abs(img.mean() / max(primal.mean(), 1e-9) - 1.0) < 0.25
