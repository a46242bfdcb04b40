"""G-PT: gradients are exact finite differences in expectation
(identity-PSS shift), and reconstruction matches the primal."""

import jax.numpy as jnp
import numpy as np

from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import gpt
from tests.test_sppm import make_box_scene


def test_gpt_gradients_and_recon():
    scene = make_box_scene(w=16, h=16)
    cfg = VolPathConfig(spp=24, max_depth=5)
    out = gpt.render(scene, cfg, seed=13)
    primal = np.asarray(out["primal"])
    gx = np.asarray(out["gx"])
    gy = np.asarray(out["gy"])
    img = np.asarray(out["image"])
    assert np.isfinite(primal).all() and np.isfinite(img).all()
    # identity-PSS shift: gradient == E[f(u,j) - f(u,i)], so it must
    # correlate strongly with finite differences of the primal (same u!)
    fdx = primal[:, 1:] - primal[:, :-1]
    corr = np.corrcoef(gx[:, :-1].ravel(), fdx.ravel())[0, 1]
    assert corr > 0.5, corr
    fdy = primal[1:, :] - primal[:-1, :]
    corr = np.corrcoef(gy[:-1, :].ravel(), fdy.ravel())[0, 1]
    assert corr > 0.5, corr
    # reconstruction anchored to primal
    assert abs(img.mean() / primal.mean() - 1.0) < 0.2
