"""Misc numerics: splines, quadrature, root finding, von Mises-Fisher.

reference: src/libcore/{spline.cpp,quad.cpp,brent.cpp,vmf.cpp} — the
utility numerics layer of libcore (SURVEY.md §2.1 "Misc numerics").
Everything here is batched + jittable: scalar Newton/Brent loops become
fixed-iteration `lax` loops over whole arrays (the TPU replacement for
the reference's per-call scalar solvers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Catmull-Rom splines (spline.cpp evalCubicInterp1D / sampleCatmullRom)
# ---------------------------------------------------------------------------


def catmull_rom_weights(nodes, x):
    """Cubic Catmull-Rom basis at x over non-uniform `nodes` [K].

    Returns (idx [N], w [N,4]) such that f(x) ~= sum_j w[:,j] *
    values[idx + j - 1] (spline.cpp:catmullRomWeights)."""
    x = jnp.asarray(x)
    K = nodes.shape[0]
    i = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, K - 2)
    x0 = nodes[i]
    x1 = nodes[i + 1]
    width = x1 - x0
    t = jnp.clip((x - x0) / jnp.maximum(width, 1e-20), 0.0, 1.0)
    t2 = t * t
    t3 = t2 * t

    w0 = jnp.zeros_like(t)
    w1 = 2 * t3 - 3 * t2 + 1
    w2 = -2 * t3 + 3 * t2
    w3 = jnp.zeros_like(t)

    # derivative terms with one-sided differences at the boundary
    has_prev = i > 0
    has_next = i + 2 < K
    xm1 = nodes[jnp.maximum(i - 1, 0)]
    xp2 = nodes[jnp.minimum(i + 2, K - 1)]

    d0 = t3 - 2 * t2 + t
    d1 = t3 - t2
    # left derivative
    fac_l = width / jnp.maximum(x1 - xm1, 1e-20)
    w0 = w0 + jnp.where(has_prev, -d0 * fac_l, 0.0)
    w2 = w2 + jnp.where(has_prev, d0 * fac_l, 0.0)
    w1 = w1 + jnp.where(has_prev, 0.0, -d0)
    w2 = w2 + jnp.where(has_prev, 0.0, d0)
    # right derivative
    fac_r = width / jnp.maximum(xp2 - x0, 1e-20)
    w1 = w1 + jnp.where(has_next, -d1 * fac_r, -d1)
    w3 = w3 + jnp.where(has_next, d1 * fac_r, 0.0)
    w2 = w2 + jnp.where(has_next, 0.0, d1)
    return i, jnp.stack([w0, w1, w2, w3], axis=-1)


def eval_catmull_rom(nodes, values, x):
    """Evaluate the Catmull-Rom interpolant through (nodes, values) at x
    (spline.cpp:evalCubicInterp1D, non-uniform variant)."""
    i, w = catmull_rom_weights(nodes, x)
    K = nodes.shape[0]
    idx = jnp.stack([jnp.maximum(i - 1, 0), i, i + 1,
                     jnp.minimum(i + 2, K - 1)], axis=-1)
    return jnp.sum(w * values[idx], axis=-1)


# ---------------------------------------------------------------------------
# Gauss-Legendre quadrature (quad.cpp gaussLegendre)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n",))
def gauss_legendre(n: int):
    """Nodes + weights of n-point Gauss-Legendre on [-1, 1]
    (quad.cpp:gaussLegendre — Newton iteration on P_n roots)."""
    k = jnp.arange(1, n + 1, dtype=jnp.float64 if jax.config.jax_enable_x64
                   else jnp.float32)
    # Tricomi initial guess
    x = jnp.cos(jnp.pi * (k - 0.25) / (n + 0.5))

    def legendre(x):
        # returns (P_n(x), P_n'(x)) by upward recurrence
        p0 = jnp.ones_like(x)
        p1 = x

        def body(i, carry):
            p0, p1 = carry
            p2 = ((2 * i + 1) * x * p1 - i * p0) / (i + 1)
            return p1, p2

        p0, p1 = lax.fori_loop(1, n, body, (p0, p1))
        # after loop: p1 = P_n, p0 = P_{n-1}
        dp = n * (x * p1 - p0) / jnp.maximum(x * x - 1.0, -1.0 + 1e-12)
        dp = jnp.where(jnp.abs(x) < 1.0 - 1e-9, dp, dp)
        return p1, dp

    def newton(_, x):
        p, dp = legendre(x)
        return x - p / dp

    x = lax.fori_loop(0, 8, newton, x)
    _, dp = legendre(x)
    w = 2.0 / ((1.0 - x * x) * dp * dp)
    return x, w


def integrate_gl(f, a, b, n: int = 16):
    """∫_a^b f(x) dx by n-point Gauss-Legendre; f must be vectorized."""
    x, w = gauss_legendre(n)
    xm = 0.5 * (a + b)
    xr = 0.5 * (b - a)
    return xr * jnp.sum(w * f(xm + xr * x))


# ---------------------------------------------------------------------------
# Brent root finding (brent.cpp BrentSolver) — batched bisection/secant
# ---------------------------------------------------------------------------


def brent(f, lo, hi, iters: int = 64):
    """Roots of f on bracketing intervals [lo, hi] (batched).

    reference brent.cpp:BrentSolver::solve. TPU version: fixed-iteration
    hybrid secant/bisection (Dekker form of Brent) over whole arrays —
    convergence per-lane is masked, all lanes run `iters` steps."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.broadcast_to(jnp.asarray(hi, jnp.float32), lo.shape)
    flo = f(lo)
    fhi = f(hi)

    def body(i, st):
        a, b, fa, fb = st
        # secant proposal, fall back to bisection when out of bracket;
        # force a bisection every other step so false-position stalls
        # (one endpoint pinned) still halve the bracket
        denom = fb - fa
        x_sec = b - fb * (b - a) / jnp.where(jnp.abs(denom) > 1e-30,
                                             denom, 1e-30)
        x_bis = 0.5 * (a + b)
        use_sec = ((x_sec > jnp.minimum(a, b))
                   & (x_sec < jnp.maximum(a, b)) & (i % 2 == 1))
        x = jnp.where(use_sec, x_sec, x_bis)
        fx = f(x)
        left = fa * fx <= 0.0
        a2 = jnp.where(left, a, x)
        fa2 = jnp.where(left, fa, fx)
        b2 = jnp.where(left, x, b)
        fb2 = jnp.where(left, fx, fb)
        return a2, b2, fa2, fb2

    a, b, fa, fb = lax.fori_loop(0, iters, body, (lo, hi, flo, fhi))
    x = 0.5 * (a + b)
    return x, jnp.abs(f(x)) < 1e-5


# ---------------------------------------------------------------------------
# von Mises-Fisher (vmf.cpp VonMisesFisherDistr)
# ---------------------------------------------------------------------------


def vmf_pdf(kappa, cos_theta):
    """vMF density on S^2 wrt solid angle (vmf.cpp:eval)."""
    kappa = jnp.asarray(kappa)
    iso = jnp.full(jnp.broadcast_shapes(jnp.shape(kappa),
                                        jnp.shape(cos_theta)),
                   1.0 / (4 * jnp.pi))
    c = kappa / (2 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa)))
    pdf = c * jnp.exp(kappa * (cos_theta - 1.0))
    return jnp.where(kappa < 1e-6, iso, pdf)


def vmf_sample(kappa, u):
    """Sample cos_theta ~ vMF(kappa) from uniforms u (vmf.cpp:sample,
    numerically-stable log1p form)."""
    kappa = jnp.asarray(kappa)
    u = jnp.asarray(u)
    ct = 1.0 + jnp.log1p(jnp.expm1(-2.0 * kappa) * u) \
        / jnp.maximum(kappa, 1e-20)
    return jnp.where(kappa < 1e-6, 1.0 - 2.0 * u, jnp.clip(ct, -1.0, 1.0))


def vmf_for_peak(peak_value, iters: int = 40):
    """kappa whose vMF peak density equals `peak_value`
    (vmf.cpp:forPeakValue — Brent inversion)."""
    def g(kappa):
        return vmf_pdf(kappa, jnp.ones_like(kappa)) - peak_value

    peak_value = jnp.asarray(peak_value, jnp.float32)
    lo = jnp.full_like(peak_value, 1e-5)
    hi = jnp.full_like(peak_value, 1e5)
    k, _ = brent(g, lo, hi, iters=iters)
    return k
