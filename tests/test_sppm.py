"""SPPM integrator validation: cross-check against the volumetric path
tracer (the reference's own strategy: integrators validate each other on
analytic scenes, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import PhotonConfig, VolPathConfig
from gvpm_tpu.integrators import sppm, volpath
from gvpm_tpu.scene import SceneBuilder


def make_box_scene(with_medium=True, w=16, h=16):
    b = SceneBuilder()
    white = b.diffuse([0.7, 0.7, 0.7])
    light = b.area_light([20.0, 20.0, 20.0])
    # open cornell (front missing)
    b.rectangle([0, 0, 0], [0, 0, 1], [1, 0, 0], white)
    b.rectangle([0, 1, 0], [1, 0, 0], [0, 0, 1], white)
    b.rectangle([0, 0, 1], [0, 1, 0], [1, 0, 0], white)
    b.rectangle([0, 0, 0], [0, 1, 0], [0, 0, 1], white)
    b.rectangle([1, 0, 0], [0, 0, 1], [0, 1, 0], white)
    b.rectangle([0.35, 0.998, 0.35], [0.3, 0, 0], [0, 0, 0.3], white,
                emitter=light)
    if with_medium:
        m = b.homogeneous(sigma_a=[0.05] * 3, sigma_s=[0.35] * 3, g=0.0)
        b.medium_box([0.02, 0.02, 0.02], [0.98, 0.98, 0.98], m)
    b.camera(origin=[0.5, 0.5, -1.2], target=[0.5, 0.5, 0.5], fov=42)
    return b.build(width=w, height=h)


CFG = PhotonConfig(max_depth=5, null_bounces=3, max_cam_depth=5,
                   surface_photons=16384, volume_photons=16384,
                   grid_hash_size=1 << 14, volume_samples=2,
                   initial_scale=1.0, grid_max_photons_per_cell=160)


@pytest.fixture(scope="module")
def reference_image():
    scene = make_box_scene()
    img = volpath.render(scene, VolPathConfig(spp=48, max_depth=5), seed=7)
    return scene, np.asarray(img)


def test_bre_knn_radii_match_global(reference_image):
    """Per-photon kNN radii (bre.cpp:29-93) keep BRE energy consistent
    with the global-radius variant."""
    import dataclasses
    scene, ref = reference_image
    cfg = dataclasses.replace(CFG, bre_knn=16)
    out = sppm.render(scene, cfg, volume="bre", passes=3, seed=3)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    ratio = img.mean() / ref.mean()
    assert 0.7 < ratio < 1.3, f"bre_knn energy ratio {ratio:.3f}"


@pytest.mark.parametrize("volume", ["distance", "bre", "beam1d"])
def test_sppm_matches_volpath(reference_image, volume):
    scene, ref = reference_image
    out = sppm.render(scene, CFG, volume=volume, passes=6, seed=3)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    # global energy agreement (density estimation bias + MC noise budget)
    ratio = img.mean() / ref.mean()
    assert 0.75 < ratio < 1.25, f"{volume}: energy ratio {ratio:.3f}"
    # pixel-level: means over 4x4 tiles agree loosely
    t_img = img.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    t_ref = ref.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    rel = np.abs(t_img - t_ref) / (t_ref + 0.05)
    assert np.median(rel) < 0.35, f"{volume}: median tile err {np.median(rel):.3f}"


def test_sppm_no_medium_matches_volpath():
    scene = make_box_scene(with_medium=False)
    ref = np.asarray(volpath.render(
        scene, VolPathConfig(spp=32, max_depth=5), seed=9))
    out = sppm.render(scene, CFG, volume="none", passes=6, seed=5)
    img = np.asarray(out["image"])
    ratio = img.mean() / ref.mean()
    assert 0.75 < ratio < 1.25, f"energy ratio {ratio:.3f}"
