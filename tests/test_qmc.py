"""QMC sequence tests (reference: src/tests/test_samplers.cpp — known
radical-inverse values, stratification properties)."""

import numpy as np
import jax
import jax.numpy as jnp

from gvpm_tpu.core import qmc


def test_radical_inverse_base2_known_values():
    # test_samplers.cpp checks radicalInverse(2, ·): 1->0.5, 2->0.25,
    # 3->0.75, 4->0.125 ...
    i = jnp.arange(8)
    v = np.asarray(qmc.radical_inverse(2, i))
    np.testing.assert_allclose(
        v, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-6)


def test_radical_inverse_base3():
    v = np.asarray(qmc.radical_inverse(3, jnp.arange(4)))
    np.testing.assert_allclose(v, [0.0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_sobol_dim0_is_van_der_corput():
    i = jnp.arange(16)
    s = np.asarray(qmc.sobol(jnp.zeros_like(i), i))
    r = np.asarray(qmc.radical_inverse(2, i))
    np.testing.assert_allclose(s, r, atol=1e-6)


def test_sobol_02_stratification():
    """Sobol dims (0,1) form a (0,2)-sequence: any 4x4 stratification of
    the first 16 points has exactly one point per cell."""
    i = jnp.arange(16)
    x = np.asarray(qmc.sobol(jnp.zeros_like(i), i))
    y = np.asarray(qmc.sobol(jnp.ones_like(i), i))
    cells = (np.floor(x * 4).astype(int), np.floor(y * 4).astype(int))
    occupancy = np.zeros((4, 4), int)
    np.add.at(occupancy, cells, 1)
    assert (occupancy == 1).all()


def test_owen_scrambled_ld_keeps_stratification():
    pts = np.asarray(qmc.ld_2d(jnp.arange(16), jnp.full((16,), 7)))
    for axis in range(2):
        occupancy = np.zeros(16, int)
        np.add.at(occupancy, np.floor(pts[:, axis] * 16).astype(int), 1)
        assert (occupancy == 1).all(), axis


def test_scrambles_decorrelate_pixels():
    i = jnp.arange(64)
    a = np.asarray(qmc.ld_2d(i, jnp.full((64,), 1)))
    b = np.asarray(qmc.ld_2d(i, jnp.full((64,), 2)))
    assert np.abs(a - b).max() > 0.1


def test_halton_mean_and_range():
    for dim in (0, 1, 2, 5):
        v = np.asarray(qmc.halton(dim, jnp.arange(1, 513)))
        assert (v >= 0).all() and (v < 1).all()
        assert abs(v.mean() - 0.5) < 0.05, dim


def test_hammersley_first_dim():
    v = np.asarray(qmc.hammersley(0, jnp.arange(8), 8))
    np.testing.assert_allclose(v, (np.arange(8) + 0.5) / 8)


def test_stratified_one_per_cell():
    key = jax.random.key(0)
    pts = np.asarray(qmc.stratified_2d(key, jnp.arange(16), 16))
    occupancy = np.zeros((4, 4), int)
    np.add.at(occupancy,
              (np.floor(pts[:, 0] * 4).astype(int),
               np.floor(pts[:, 1] * 4).astype(int)), 1)
    assert (occupancy == 1).all()


def test_pixel_samples_all_samplers_shapes():
    key = jax.random.key(3)
    pix = jnp.arange(32)
    si = jnp.full((32,), 2)
    for name in ("independent", "stratified", "ld", "sobol", "halton",
                 "hammersley"):
        u = qmc.pixel_samples(name, key, pix, si, spp=8)
        assert u.shape == (32, 2), name
        u = np.asarray(u)
        assert (u >= 0).all() and (u <= 1).all(), name
