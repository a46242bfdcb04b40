"""Dielectric sidedness: refraction must use the relative IOR of the
side the ray ARRIVES from, and total internal reflection must occur
beyond the critical angle.

Round-1 regression: every transport caller flipped the shading frame to
face the viewer before sample_bsdf, losing the inside/outside sign — so
glass EXITS refracted with eta instead of 1/eta and TIR never happened.
The callers now pass the true-normal frame (bsdf.py's lobes are
sign-aware).
"""

import jax.numpy as jnp
import numpy as np

from gvpm_tpu.render.bsdf import sample_bsdf
from gvpm_tpu.scene import SceneBuilder


def _glass_scene(eta=1.5):
    b = SceneBuilder()
    glass = b.dielectric(int_ior=eta)
    b.sphere([0.0, 0.0, 0.0], 1.0, glass)
    b.camera(origin=[0, 0, -3], target=[0, 0, 0], fov=40)
    return b.build(width=4, height=4), glass


def _sample(scene, bi, wi, u0):
    wi = jnp.asarray([wi])
    u = jnp.asarray([[u0, 0.5, 0.5]])
    bs = sample_bsdf(scene, jnp.asarray([bi]), wi, u)
    return np.asarray(bs.wo)[0], np.asarray(bs.weight)[0]


def test_entry_refraction_snell():
    scene, g = _glass_scene()
    # arriving from OUTSIDE at 45 degrees: sin_t = sin(45)/1.5
    s = np.sin(np.deg2rad(45.0))
    wi = [s, 0.0, np.cos(np.deg2rad(45.0))]   # z>0: outside
    wo, _ = _sample(scene, g, wi, u0=0.999)   # force the refract branch
    assert wo[2] < 0.0                         # transmitted
    sin_t = np.linalg.norm(wo[:2])
    np.testing.assert_allclose(sin_t, s / 1.5, rtol=1e-5)


def test_exit_refraction_snell():
    scene, g = _glass_scene()
    # arriving from INSIDE at 30 degrees (< critical 41.8): exit uses 1/eta
    s = np.sin(np.deg2rad(30.0))
    wi = [s, 0.0, -np.cos(np.deg2rad(30.0))]  # z<0: inside
    wo, _ = _sample(scene, g, wi, u0=0.999)
    assert wo[2] > 0.0                         # transmitted to outside
    sin_t = np.linalg.norm(wo[:2])
    np.testing.assert_allclose(sin_t, s * 1.5, rtol=1e-5)


def test_total_internal_reflection():
    scene, g = _glass_scene()
    # inside beyond the critical angle (sin>1/1.5): MUST reflect whatever
    # the lobe-choice uniform says
    ang = np.deg2rad(55.0)
    wi = [np.sin(ang), 0.0, -np.cos(ang)]
    for u0 in (0.01, 0.999):
        wo, w = _sample(scene, g, wi, u0)
        assert wo[2] < 0.0, (u0, wo)           # stays inside
        np.testing.assert_allclose(wo[2], wi[2], rtol=1e-5)
        assert w.max() > 0.0
