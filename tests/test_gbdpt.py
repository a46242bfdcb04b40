"""G-BDPT gradient validation vs finite differences of the primal
(reference: gbdpt/; FD check mirrors computeGradientFinite)."""

import numpy as np
import jax.numpy as jnp

from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import gbdpt
from tests.test_more_integrators import _box


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
