import jax
import jax.numpy as jnp
import numpy as np

from gvpm_tpu.core import math as m
from gvpm_tpu.core import warp


def test_coordinate_system_orthonormal():
    key = jax.random.key(0)
    n = m.normalize(jax.random.normal(key, (128, 3)))
    s, t = m.coordinate_system(n)
    np.testing.assert_allclose(m.dot(s, t), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.dot(s, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(m.length(s), 1.0, atol=1e-5)
    np.testing.assert_allclose(m.length(t), 1.0, atol=1e-5)
    # round trip local<->world
    v = m.normalize(jax.random.normal(jax.random.key(1), (128, 3)))
    vl = m.to_local(n, s, t, v)
    vw = m.to_world(n, s, t, vl)
    np.testing.assert_allclose(np.asarray(vw), np.asarray(v), atol=1e-5)


def test_fresnel_dielectric_limits():
    F, cos_t = m.fresnel_dielectric(jnp.array([1.0]), jnp.array([1.5]))
    np.testing.assert_allclose(F, ((0.5 / 2.5) ** 2), atol=1e-5)
    # TIR from inside beyond critical angle
    F, _ = m.fresnel_dielectric(jnp.array([-0.1]), jnp.array([1.5]))
    np.testing.assert_allclose(F, 1.0)


def test_refract_energy():
    wi = m.normalize(jnp.array([[0.3, 0.1, 0.9]]))
    wt, tir = m.refract_local(wi, jnp.array([1.5]))
    assert not bool(tir[0])
    np.testing.assert_allclose(m.length(wt), 1.0, atol=1e-5)
    # Snell: sin_t = sin_i / eta
    sin_i = jnp.sqrt(wi[0, 0] ** 2 + wi[0, 1] ** 2)
    sin_t = jnp.sqrt(wt[0, 0] ** 2 + wt[0, 1] ** 2)
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_warp_sphere_uniform():
    u = jax.random.uniform(jax.random.key(2), (4096, 2))
    d = warp.square_to_uniform_sphere(u)
    np.testing.assert_allclose(np.asarray(m.length(d)), 1.0, atol=1e-5)
    assert abs(float(jnp.mean(d[:, 2]))) < 0.05


def test_warp_cosine_pdf_integrates():
    # Monte Carlo: integral of pdf over hemisphere == 1
    u = jax.random.uniform(jax.random.key(3), (200000, 2))
    d = warp.square_to_uniform_hemisphere(u)
    pdf = warp.square_to_cosine_hemisphere_pdf(d)
    est = float(jnp.mean(pdf) * 2 * jnp.pi)
    assert abs(est - 1.0) < 0.02


def test_hg_pdf_normalized():
    for g in (0.0, 0.3, -0.7):
        u = jax.random.uniform(jax.random.key(4), (200000, 2))
        d = warp.square_to_uniform_sphere(u)
        pdf = warp.hg_pdf(d[:, 2], g)
        est = float(jnp.mean(pdf) * 4 * jnp.pi)
        assert abs(est - 1.0) < 0.02, g


def test_hg_sampling_matches_pdf():
    u = jax.random.uniform(jax.random.key(5), (100000, 2))
    d, pdf = warp.square_to_hg(u, 0.5)
    np.testing.assert_allclose(np.asarray(m.length(d)), 1.0, atol=1e-4)
    # mean cosine of HG = g
    assert abs(float(jnp.mean(d[:, 2])) - 0.5) < 0.01


def test_ray_aabb():
    o = jnp.array([[-2.0, 0.5, 0.5], [0.5, 0.5, 0.5], [-2.0, 5.0, 0.5]])
    d = jnp.array([[1.0, 0.0, 0.0]] * 3)
    hit, near, far = m.ray_aabb(o, d, jnp.zeros(3), jnp.ones(3))
    assert bool(hit[0]) and bool(hit[1]) and not bool(hit[2])
    np.testing.assert_allclose(near[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(far[1], 0.5, atol=1e-5)
