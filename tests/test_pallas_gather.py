"""Fused Pallas gather kernel vs the ranked-cull driver.

The kernel (ops/pallas_gather.py) evaluates EVERY stencil row inside
the window, while the cull driver subsamples to its B/K budgets — so
with budgets sized above the true candidate counts both drivers must
agree to float tolerance on a small scene. Runs in interpret mode on
the CPU mesh (the kernel body is identical; only the DMA path differs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import gvpm, sppm
from gvpm_tpu.scenes import box_medium


def _cfg(driver, **kw):
    return GradientConfig(
        max_depth=4, null_bounces=2, max_cam_depth=4,
        surface_photons=1 << 10, volume_photons=1 << 10,
        grid_max_photons_per_cell=32, volume_samples=1,
        vol_segments_per_pixel=2,
        grid_dims=(16, 16, 16), gather_driver=driver,
        gather_budget=256, cull_k=128, window_q_tile=64,
        # window >= capped row count: no clipping, so the two drivers
        # must agree pair-for-pair (visits exactly equal)
        grid_surface_rows=1024, grid_volume_rows=1024,
        pallas_q_tile=64, pallas_window=1024,
        use_manifold=False, **kw)


@pytest.fixture(scope="module")
def passes():
    scene = box_medium(width=16, height=16)
    out = {}
    for driver in ("cull", "pallas"):
        cfg = _cfg(driver)
        r_vol = sppm.base_volume_radius(scene, cfg)
        out[driver] = gvpm.render_pass(scene, cfg, "distance", 1 << 10,
                                       0, 1, 1.0, 1.0, r_vol)
    return out


def test_pallas_matches_cull_primal(passes):
    p_c, p_p = passes["cull"][0], passes["pallas"][0]
    assert bool(jnp.isfinite(p_p).all())
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_c),
                               rtol=2e-4, atol=5e-6)


def test_pallas_matches_cull_gradients(passes):
    for k in (1, 2):
        g_c, g_p = passes["cull"][k], passes["pallas"][k]
        assert bool(jnp.isfinite(g_p).all())
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_c),
                                   rtol=2e-4, atol=5e-6)


def test_pallas_visit_count(passes):
    # every real ball hit must be counted (no subsampling in the kernel)
    v_c = int(passes["cull"][3]["visits"])
    v_p = int(passes["pallas"][3]["visits"])
    assert v_p == v_c
