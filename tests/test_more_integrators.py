"""Cross-validation of pssmlt / photonmapper / ppm / vpl against the
volpath ground truth on a surface-only cornell box (the reference's
cross-integrator test strategy, data/tests/test_bidir*)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.scene import SceneBuilder
from gvpm_tpu.core.config import PhotonConfig, VolPathConfig
from gvpm_tpu.integrators import photonmapper, pssmlt, volpath, vpl


def _box(w=12, h=12):
    b = SceneBuilder()
    white = b.diffuse([0.7] * 3)
    red = b.diffuse([0.7, 0.2, 0.2])
    light = b.area_light([20.0] * 3)
    b.rectangle([0, 0, 0], [0, 0, 1], [1, 0, 0], white)
    b.rectangle([0, 1, 0], [1, 0, 0], [0, 0, 1], white)
    b.rectangle([0, 0, 1], [0, 1, 0], [1, 0, 0], white)
    b.rectangle([0, 0, 0], [0, 1, 0], [0, 0, 1], red)
    b.rectangle([1, 0, 0], [0, 0, 1], [0, 1, 0], red)
    b.rectangle([0.35, 0.998, 0.35], [0.3, 0, 0], [0, 0, 0.3], white,
                emitter=light)
    b.camera(origin=[0.5, 0.5, -1.2], target=[0.5, 0.5, 0.5], fov=45)
    return b.build(width=w, height=h)


@pytest.fixture(scope="module")
def ref():
    scene = _box()
    img = volpath.render(
        scene, VolPathConfig(spp=24, max_depth=5, null_bounces=2), seed=1)
    return scene, float(jnp.mean(img))


def test_photonmapper_matches_volpath(ref):
    scene, mref = ref
    cfg = PhotonConfig(max_depth=5, null_bounces=2, max_cam_depth=5,
                       surface_photons=1 << 14, volume_photons=1 << 14,
                       grid_hash_size=1 << 13,
                       grid_max_photons_per_cell=64)
    out = photonmapper.render(scene, cfg, seed=0, passes=3)
    m = float(jnp.mean(out["image"]))
    assert jnp.isfinite(out["image"]).all()
    assert 0.7 < m / mref < 1.35, (m, mref)


@pytest.mark.slow
def test_ppm_matches_volpath(ref):
    scene, mref = ref
    cfg = PhotonConfig(max_depth=5, null_bounces=2, max_cam_depth=5,
                       surface_photons=1 << 14, volume_photons=1 << 14,
                       grid_hash_size=1 << 13,
                       grid_max_photons_per_cell=64)
    out = photonmapper.render_ppm(scene, cfg, seed=0, passes=3)
    m = float(jnp.mean(out["image"]))
    assert 0.7 < m / mref < 1.35, (m, mref)


@pytest.mark.slow
def test_vpl_matches_volpath(ref):
    scene, mref = ref
    cfg = PhotonConfig(max_depth=4, null_bounces=2, max_cam_depth=4)
    out = vpl.render(scene, cfg, seed=0, passes=3, vpls_per_pass=64,
                     clamp_dist=0.05)
    m = float(jnp.mean(out["image"]))
    assert jnp.isfinite(out["image"]).all()
    # VPL clamping loses some near-field energy: one-sided tolerance
    assert 0.6 < m / mref < 1.2, (m, mref)
@pytest.mark.slow
def test_bdpt_matches_volpath(ref):
    from gvpm_tpu.integrators import bdpt
    scene, mref = ref
    cfg = VolPathConfig(spp=8, max_depth=4, null_bounces=2)
    img = bdpt.render(scene, cfg, seed=0)
    m = float(jnp.mean(img))
    assert jnp.isfinite(img).all()
    assert 0.7 < m / mref < 1.35, (m, mref)


@pytest.mark.slow
def test_erpt_matches_volpath(ref):
    from gvpm_tpu.integrators import erpt
    scene, mref = ref
    cfg = VolPathConfig(spp=1, max_depth=5, null_bounces=2)
    img = erpt.render(scene, cfg, seed=0, n_chains=2048, n_mutations=24)
    m = float(jnp.mean(img))
    assert jnp.isfinite(img).all()
    assert 0.7 < m / mref < 1.35, (m, mref)
@pytest.mark.slow
def test_pssmlt_matches_volpath(ref):
    scene, mref = ref
    cfg = VolPathConfig(spp=1, max_depth=5, null_bounces=2)
    img = pssmlt.render(scene, cfg, seed=0, n_chains=2048,
                        n_mutations=48)
    m = float(jnp.mean(img))
    assert jnp.isfinite(img).all()
    assert 0.7 < m / mref < 1.35, (m, mref)


@pytest.mark.slow
def test_mlt_matches_volpath(ref):
    """MLT (lens/chain/small/large kernel mixture) is unbiased after
    normalization: mean matches volpath (mlt.cpp cross-check vs bdpt,
    data/tests strategy)."""
    from gvpm_tpu.integrators import mlt
    scene, mref = ref
    cfg = VolPathConfig(spp=1, max_depth=5, null_bounces=2)
    img = mlt.render(scene, cfg, seed=0, n_chains=2048, n_mutations=48)
    m = float(jnp.mean(img))
    assert jnp.isfinite(img).all()
    assert 0.7 < m / mref < 1.35, (m, mref)
