"""Unit tests for core.numerics (reference: src/libcore spline/quad/
brent/vmf — test_quad.cpp, test_la.cpp analogs)."""

import jax.numpy as jnp
import numpy as np

from gvpm_tpu.core import numerics as nm


def test_catmull_rom_interpolates_nodes():
    nodes = jnp.array([0.0, 0.7, 1.5, 2.2, 3.0])
    vals = jnp.array([1.0, -0.5, 2.0, 0.3, 1.2])
    y = nm.eval_catmull_rom(nodes, vals, nodes)
    np.testing.assert_allclose(np.asarray(y), np.asarray(vals), atol=1e-5)


def test_catmull_rom_reproduces_linear():
    # cubic Hermite with CR slopes is exact on linear functions
    nodes = jnp.array([0.0, 1.0, 2.5, 4.0])
    vals = 2.0 * nodes + 1.0
    x = jnp.linspace(0.0, 4.0, 33)
    y = nm.eval_catmull_rom(nodes, vals, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(2 * x + 1),
                               rtol=1e-4, atol=1e-4)


def test_gauss_legendre_exact_polynomials():
    x, w = nm.gauss_legendre(8)
    # exact for degree <= 15: ∫_{-1}^{1} x^6 = 2/7
    got = float(jnp.sum(w * x ** 6))
    assert abs(got - 2.0 / 7.0) < 1e-5
    assert abs(float(jnp.sum(w)) - 2.0) < 1e-5


def test_integrate_gl_sin():
    val = float(nm.integrate_gl(jnp.sin, 0.0, jnp.pi, n=16))
    assert abs(val - 2.0) < 1e-5


def test_brent_batched_roots():
    # roots of x^2 - c for a batch of c
    c = jnp.array([0.25, 2.0, 9.0])
    x, ok = nm.brent(lambda x: x * x - c, jnp.zeros(3), jnp.full((3,), 10.0))
    np.testing.assert_allclose(np.asarray(x), np.sqrt(np.asarray(c)),
                               rtol=1e-4)
    assert bool(ok.all())


def test_vmf_normalized_and_sampling():
    kappa = 5.0
    # pdf integrates to 1 over the sphere
    mu = jnp.linspace(-1.0, 1.0, 4097)
    pdf = nm.vmf_pdf(kappa, mu)
    integral = float(jnp.trapezoid(pdf, mu) * 2 * jnp.pi)
    assert abs(integral - 1.0) < 1e-3
    # sampled cos_theta mean matches analytic coth(k) - 1/k
    u = jnp.linspace(1e-4, 1.0 - 1e-4, 20001)
    ct = nm.vmf_sample(kappa, u)
    mean = float(jnp.mean(ct))
    analytic = 1.0 / jnp.tanh(kappa) - 1.0 / kappa
    assert abs(mean - float(analytic)) < 2e-3
    # isotropic limit
    assert abs(float(nm.vmf_pdf(0.0, 0.3)) - 1.0 / (4 * np.pi)) < 1e-6


def test_vmf_for_peak_roundtrip():
    kappa = nm.vmf_for_peak(jnp.array([0.5, 2.0, 10.0]))
    peak = nm.vmf_pdf(kappa, jnp.ones(3))
    np.testing.assert_allclose(np.asarray(peak), [0.5, 2.0, 10.0],
                               rtol=1e-3)
