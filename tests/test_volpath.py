"""Analytic end-to-end validation of the volumetric path tracer
(mirrors the reference's analytic test scenes, data/tests/test_bidir*.xml)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import VolPathConfig
from gvpm_tpu.integrators import volpath
from gvpm_tpu.scene import SceneBuilder


def _light_panel_scene(sigma_a=None, sigma_s=None, g=0.0):
    """Camera staring straight at a large emissive panel 2m away,
    optionally through a medium-filled box."""
    b = SceneBuilder()
    light = b.area_light([5.0, 4.0, 3.0])
    white = b.diffuse([0.0, 0.0, 0.0])  # black so only direct light counts
    # emissive panel at z=2 facing -z (edge1 x edge2 = -z)
    b.rectangle([-2, -2, 2.0], [0, 4, 0], [4, 0, 0], white, emitter=light)
    if sigma_a is not None:
        m = b.homogeneous(sigma_a=sigma_a, sigma_s=sigma_s or [0, 0, 0], g=g)
        b.medium_box([-3, -3, 0.5], [3, 3, 1.5], m)
    b.camera(origin=[0, 0, 0], target=[0, 0, 1], fov=20)
    return b.build(width=16, height=16)


def test_direct_light_radiance():
    scene = _light_panel_scene()
    img = volpath.render(scene, VolPathConfig(spp=4, max_depth=3), seed=1)
    # every pixel sees the panel: radiance == emitted radiance
    np.testing.assert_allclose(np.asarray(img),
                               np.broadcast_to([5.0, 4.0, 3.0], img.shape),
                               rtol=1e-3)


def test_absorbing_medium_beer_lambert():
    sa = [0.5, 1.0, 2.0]
    scene = _light_panel_scene(sigma_a=sa)
    # medium-vs-surface sampling RR (weight 0.5 for absorbing media,
    # Medium::configure) adds variance: need real spp for the estimate
    img = volpath.render(scene, VolPathConfig(spp=192, max_depth=6), seed=2)
    center = np.asarray(img[7:9, 7:9]).mean(axis=(0, 1))
    # central rays pass ~1m of medium; small fov => near-axial paths
    expect = np.array([5.0, 4.0, 3.0]) * np.exp(-np.array(sa) * 1.0)
    np.testing.assert_allclose(center, expect, rtol=0.08)


def test_scattering_medium_energy():
    # purely scattering medium: total energy must not exceed no-medium case
    scene_clear = _light_panel_scene()
    scene_scat = _light_panel_scene(sigma_a=[0.0, 0.0, 0.0],
                                    sigma_s=[1.0, 1.0, 1.0])
    cfg = VolPathConfig(spp=16, max_depth=8)
    img0 = volpath.render(scene_clear, cfg, seed=3)
    img1 = volpath.render(scene_scat, cfg, seed=3)
    e0 = float(jnp.sum(img0))
    e1 = float(jnp.sum(img1))
    assert e1 < e0 * 1.02           # out-scatter only removes from the beam
    assert e1 > e0 * 0.5            # but scattering keeps most energy inflight


def open_cornell(b, white):
    """Five-wall cornell box (front face open for the camera)."""
    b.rectangle([0, 0, 0], [0, 0, 1], [1, 0, 0], white)        # floor +y
    b.rectangle([0, 1, 0], [1, 0, 0], [0, 0, 1], white)        # ceiling -y
    b.rectangle([0, 0, 1], [0, 1, 0], [1, 0, 0], white)        # back -z
    b.rectangle([0, 0, 0], [0, 1, 0], [0, 0, 1], white)        # left +x
    b.rectangle([1, 0, 0], [0, 0, 1], [0, 1, 0], white)        # right -x


@pytest.mark.slow
def test_cornell_smoke():
    b = SceneBuilder()
    white = b.diffuse([0.75, 0.75, 0.75])
    red = b.diffuse([0.75, 0.25, 0.25])
    light = b.area_light([15.0, 15.0, 15.0])
    open_cornell(b, white)
    b.rectangle([0.3, 0.998, 0.3], [0.4, 0, 0], [0, 0, 0.4], red,
                emitter=light)
    b.camera(origin=[0.5, 0.5, -0.8], target=[0.5, 0.5, 0.5], fov=50)
    scene = b.build(width=32, height=32)
    img = volpath.render(scene, VolPathConfig(spp=8, max_depth=5), seed=4)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.mean() > 0.01  # light reaches the film
