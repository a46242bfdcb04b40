"""Screened-Poisson reconstruction: exact-gradient recovery + L1 outlier
robustness (reference: poisson_solver/Solver.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from gvpm_tpu.ops import poisson


def _make_target(key, H=32, W=32, C=3):
    # smooth target image
    y, x = jnp.mgrid[0:H, 0:W]
    img = jnp.stack([
        jnp.sin(x / 7.0) * 0.5 + 0.5,
        jnp.cos(y / 5.0) * 0.5 + 0.5,
        ((x + y) / (H + W)).astype(jnp.float32),
    ], axis=-1)
    return img


def test_l2_exact_gradients_recover_image():
    img = _make_target(jax.random.key(0))
    gx = jnp.pad(poisson.dx(img), ((0, 0), (0, 1), (0, 0)))
    gy = jnp.pad(poisson.dy(img), ((0, 1), (0, 0), (0, 0)))
    noisy = img + 0.3 * jax.random.normal(jax.random.key(1), img.shape)
    rec = poisson.solve(noisy, gx, gy, alpha=0.2, iters=120, l1=False)
    # with exact gradients the reconstruction must be much closer to the
    # clean image than the noisy primal was
    err_rec = float(jnp.mean((rec - img) ** 2))
    err_noisy = float(jnp.mean((noisy - img) ** 2))
    assert err_rec < err_noisy * 0.12
    # mean (DC term) anchored by the primal within noise tolerance
    assert abs(float(jnp.mean(rec - img))) < 0.05


def test_l1_robust_to_gradient_outliers():
    img = _make_target(jax.random.key(2))
    gx = jnp.pad(poisson.dx(img), ((0, 0), (0, 1), (0, 0)))
    gy = jnp.pad(poisson.dy(img), ((0, 1), (0, 0), (0, 0)))
    # corrupt a few gradients with huge outliers (firefly analog)
    gx = gx.at[10, 10].add(30.0)
    gy = gy.at[20, 5].add(-25.0)
    rec_l2 = poisson.solve(img, gx, gy, alpha=0.2, iters=120, l1=False)
    rec_l1 = poisson.solve(img, gx, gy, alpha=0.2, iters=80,
                           irls_iters=6, l1=True)
    err_l2 = float(jnp.mean((rec_l2 - img) ** 2))
    err_l1 = float(jnp.mean((rec_l1 - img) ** 2))
    assert err_l1 < err_l2 * 0.5  # L1 suppresses outliers much better
    assert np.isfinite(np.asarray(rec_l1)).all()
