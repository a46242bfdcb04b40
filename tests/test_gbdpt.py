"""G-BDPT gradient validation vs finite differences of the primal
(reference: gbdpt/; FD check mirrors computeGradientFinite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import gbdpt
from tests.test_more_integrators import _box


# the 5x-traced strategy loops are a multi-GB XLA-CPU compile on this
# 2-CPU box — default CI runs the cheap machinery checks only
@pytest.mark.slow
def test_gbdpt_gradients_match_fd():
    scene = _box(12, 12)
    cfg = VolPathConfig(spp=6, max_depth=4, null_bounces=2)
    out = gbdpt.render(scene, cfg, seed=2, recon_iters=30)
    primal = np.asarray(out["primal"])
    gx = np.asarray(out["gx"])
    gy = np.asarray(out["gy"])
    assert np.isfinite(primal).all() and primal.mean() > 0
    assert np.isfinite(gx).all() and np.isfinite(gy).all()
    assert np.isfinite(np.asarray(out["image"])).all()
    fdx = primal[:, 1:] - primal[:, :-1]
    corr = np.corrcoef(gx[:, :-1].ravel(), fdx.ravel())[0, 1]
    assert corr > 0.35, f"gx/fd correlation {corr:.3f}"
    fdy = primal[1:, :] - primal[:-1, :]
    corr = np.corrcoef(gy[:-1, :].ravel(), fdy.ravel())[0, 1]
    assert corr > 0.35, f"gy/fd correlation {corr:.3f}"


@pytest.mark.slow
def test_reconnect_beats_pss_variance():
    """The path-space camera-subpath shift (createShiftedLightPath
    analog) must cut per-sample gradient variance vs the PSS identity
    replay — offset paths stay correlated with the base past the first
    vertex (VERDICT r3 task 6)."""
    scene = _box(12, 12)
    cfg = VolPathConfig(spp=1, max_depth=4, null_bounces=2)
    K = 8
    gs, gp = [], []
    for it in range(K):
        _, gx, _ = gbdpt.render_pass(scene, cfg, 5, it)
        gs.append(np.asarray(gx))
        _, gx2, _ = gbdpt.render_pass(scene, cfg, 5, it, shift="pss")
        gp.append(np.asarray(gx2))
    v_rc = np.stack(gs).var(axis=0).mean()
    v_pss = np.stack(gp).var(axis=0).mean()
    assert np.isfinite(v_rc) and np.isfinite(v_pss)
    assert v_rc < 0.9 * v_pss, (v_rc, v_pss)
