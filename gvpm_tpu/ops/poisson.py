"""Screened-Poisson image reconstruction: jitted CG with IRLS for L1.

Replaces the reference's poisson_solver module wholesale — the Solver IRLS
outer loop over preconditioned CG with an implicit matrix
(poisson_solver/Solver.cpp:353-490) and its nine BLAS-1/stencil kernels
across Naive/OpenMP/CUDA backends (Backend.hpp:67-94, BackendCUDA.cu) —
with ~100 lines of pure JAX running on-device: the stencil matvec is two
shifted subtractions, the reductions are jnp.vdot, and XLA fuses the lot.

Problem:  min_I  alpha * w0 |I - I0|^p  +  |Dx I - Gx|^p + |Dy I - Gy|^p
with p=2 (preset L2D) or p=1 via IRLS reweighting (preset L1D); alpha is
`reconstructAlpha` = 0.2 in the paper configs (gvpm.cpp:610-615).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def dx(img):
    """Forward difference along x; output [H, W-1, C]."""
    return img[:, 1:] - img[:, :-1]


def dy(img):
    return img[1:, :] - img[:-1, :]


def dxT(gx):
    """Adjoint of dx: negative divergence, output [H, W, C]."""
    z = jnp.zeros_like(gx[:, :1])
    return jnp.concatenate([-gx, z], axis=1) \
        + jnp.concatenate([z, gx], axis=1)


def dyT(gy):
    z = jnp.zeros_like(gy[:1, :])
    return jnp.concatenate([-gy, z], axis=0) \
        + jnp.concatenate([z, gy], axis=0)


def _matvec(I, alpha2, wx, wy, w0):
    return alpha2 * w0 * I + dxT(wx * dx(I)) + dyT(wy * dy(I))


def _cg(A, b, x0, iters):
    """Conjugate gradient with fixed iteration count (jit-friendly)."""
    r = b - A(x0)
    p = r
    rz = jnp.vdot(r, r)

    def body(_, carry):
        x, r, p, rz = carry
        Ap = A(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rz_new = jnp.vdot(r, r)
        beta = jnp.where(rz > 1e-30, rz_new / rz, 0.0)
        p = r + beta * p
        return (x, r, p, rz_new)

    x, _, _, _ = lax.fori_loop(0, iters, body, (x0, r, p, rz))
    return x


@functools.partial(jax.jit, static_argnames=("iters", "irls_iters", "l1"))
def solve(primal, gx, gy, alpha=0.2, iters=50, irls_iters=4, l1=True,
          irls_eps=1e-4):
    """Reconstruct an image from throughput + gradients.

    primal: [H,W,C]; gx: x-gradients (I[x+1]-I[x], stored full-size with
    last column ignored); gy likewise. Returns [H,W,C].
    """
    H, W, C = primal.shape
    gx_in = gx[:, :W - 1]
    gy_in = gy[:H - 1, :]
    alpha2 = alpha * alpha

    ones_x = jnp.ones_like(gx_in)
    ones_y = jnp.ones_like(gy_in)
    ones_0 = jnp.ones_like(primal)

    def rhs(wx, wy, w0):
        return alpha2 * w0 * primal + dxT(wx * gx_in) + dyT(wy * gy_in)

    I = primal
    n_outer = irls_iters if l1 else 1
    for _ in range(n_outer):
        if l1:
            wx = 1.0 / (jnp.abs(dx(I) - gx_in) + irls_eps)
            wy = 1.0 / (jnp.abs(dy(I) - gy_in) + irls_eps)
            w0 = 1.0 / (jnp.abs(I - primal) + irls_eps)
        else:
            wx, wy, w0 = ones_x, ones_y, ones_0
        A = lambda v: _matvec(v, alpha2, wx, wy, w0)  # noqa: E731
        I = _cg(A, rhs(wx, wy, w0), I, iters)
    return I
