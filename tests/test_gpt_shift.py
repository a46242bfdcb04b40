"""Path-space-shift G-PT (gpt_shift): gradients match finite differences
of the INDIRECT primal in expectation (very-direct light is excluded from
gradients, gpt.cpp -direct buffer), and the reconnection machinery beats
the PSS identity shift (gpt.py) on per-sample gradient variance — the
whole reason the reference's shift state machine exists (gpt.cpp:298).
"""

import numpy as np
import pytest

from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import gpt, gpt_shift
from tests.test_sppm import make_box_scene


@pytest.fixture(scope="module")
def box12():
    return make_box_scene(with_medium=True, w=12, h=12)


def _accumulate(scene, cfg, seed=13):
    acc = [0.0, 0.0, 0.0, 0.0]
    for it in range(cfg.spp):
        p, gx, gy, d = gpt_shift.render_pass(scene, cfg, seed, it)
        acc = [acc[0] + p, acc[1] + gx, acc[2] + gy, acc[3] + d]
    return [np.asarray(a) / cfg.spp for a in acc]


def test_fd_correlation_and_scale(box12):
    # noise in gx inflates the regression denominator, so the slope check
    # needs a decently converged estimate (still ~15 s: passes are ~0.2 s)
    cfg = VolPathConfig(spp=64, max_depth=5)
    p, gx, gy, d = _accumulate(box12, cfg)
    assert np.isfinite(p).all() and np.isfinite(gx).all()
    ind = p - d
    fdx = ind[:, 1:] - ind[:, :-1]
    fdy = ind[1:, :] - ind[:-1, :]
    cx = np.corrcoef(gx[:, :-1].ravel(), fdx.ravel())[0, 1]
    cy = np.corrcoef(gy[:-1, :].ravel(), fdy.ravel())[0, 1]
    assert cx > 0.35, cx
    assert cy > 0.35, cy
    # consistency of scale: regression slope fd ~ a*gx must be near 1
    # (a factor-2 error here is exactly the double-counted-MIS failure)
    a = (gx[:, :-1] * fdx).sum() / (gx[:, :-1] ** 2).sum()
    assert 0.6 < a < 1.6, a
@pytest.mark.slow
def test_beats_pss_identity_variance(box12):
    """Reconnection keeps offset paths correlated with the base path, so
    per-sample gradient variance must be well below the PSS identity
    shift, which decorrelates at the first BSDF/phase sample."""
    cfg = VolPathConfig(spp=1, max_depth=5)
    K = 10
    gs, gp = [], []
    for it in range(K):
        _, gx, _, _ = gpt_shift.render_pass(box12, cfg, 13, it)
        gs.append(np.asarray(gx))
        _, gx2, _ = gpt.render_pass(box12, cfg, 13, it)
        gp.append(np.asarray(gx2))
    v_shift = np.stack(gs).var(axis=0).mean()
    v_pss = np.stack(gp).var(axis=0).mean()
    assert v_shift < v_pss / 2.0, (v_shift, v_pss)
@pytest.mark.slow
def test_render_wrapper_recon(box12):
    cfg = VolPathConfig(spp=6, max_depth=5)
    out = gpt_shift.render(box12, cfg, seed=7)
    img = np.asarray(out["image"])
    primal = np.asarray(out["primal"])
    assert np.isfinite(img).all()
    assert abs(img.mean() / primal.mean() - 1.0) < 0.25
