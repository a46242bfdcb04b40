"""Thinlens sensor + filtered-film rendering tests
(reference: src/sensors/thinlens.cpp, src/rfilters/*)."""

import jax.numpy as jnp
import pytest

from gvpm_tpu.scene import SceneBuilder
from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import volpath


def _two_plane_scene(aperture):
    b = SceneBuilder()
    lit = b.diffuse([0.8] * 3)
    light = b.area_light([30.0] * 3)
    # near plane (out of focus) and far plane (in focus)
    b.rectangle([-0.15, -0.5, 1.0], [0.3, 0, 0], [0, 1, 0], lit)
    b.rectangle([-2, -0.5, 3.0], [4, 0, 0], [0, 2, 0], lit)
    b.rectangle([-1, 1.4, 1.5], [2, 0, 0], [0, 0, 1], lit, emitter=light)
    b.camera(origin=[0, 0.2, 0], target=[0, 0.2, 3.0], fov=40,
             aperture_radius=aperture, focus_distance=3.0)
    return b.build(width=24, height=24)
@pytest.mark.slow
def test_thinlens_blurs_out_of_focus():
    cfg = VolPathConfig(spp=12, max_depth=3, null_bounces=2)
    sharp = volpath.render(_two_plane_scene(0.0), cfg, seed=0)
    blurred = volpath.render(_two_plane_scene(0.25), cfg, seed=0)
    assert jnp.isfinite(sharp).all() and jnp.isfinite(blurred).all()
    # out-of-focus near plane: its silhouette edge softens => the
    # horizontal gradient magnitude through the edge drops
    gx_sharp = jnp.abs(jnp.diff(sharp.mean(-1), axis=1)).max()
    gx_blur = jnp.abs(jnp.diff(blurred.mean(-1), axis=1)).max()
    assert gx_blur < gx_sharp


def test_gaussian_rfilter_render_close_to_box():
    cfg_box = VolPathConfig(spp=8, max_depth=3, null_bounces=2)
    cfg_g = VolPathConfig(spp=8, max_depth=3, null_bounces=2,
                          rfilter="gaussian")
    s = _two_plane_scene(0.0)
    a = volpath.render(s, cfg_box, seed=0)
    g = volpath.render(s, cfg_g, seed=0)
    assert jnp.isfinite(g).all()
    ma, mg = float(jnp.mean(a)), float(jnp.mean(g))
    assert abs(mg / ma - 1.0) < 0.1
