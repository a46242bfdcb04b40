"""Reconstruction-filter tests (reference: src/rfilters/*.cpp,
imageblock.cpp weight normalization)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gvpm_tpu.render import film


@pytest.mark.parametrize("name", list(film.FILTERS.keys()))
def test_constant_field_preserved(name):
    """Splatting a constant radiance at random film positions must
    develop to that constant (partition-of-unity after weight division)."""
    H = W = 8
    key = jax.random.key(0)
    n = 4096
    px = jax.random.uniform(key, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * H
    val = jnp.full((n, 3), 2.5)
    img, wsum = film.splat_filtered(film.new_film(H, W),
                                    jnp.zeros((H, W)), px, py, val,
                                    rfilter=name)
    out = np.asarray(film.develop_filtered(img, wsum))
    # interior pixels only (border pixels lose filter taps)
    inner = out[2:-2, 2:-2]
    assert np.allclose(inner, 2.5, atol=0.05), (name, inner.min(),
                                                inner.max())


def test_filters_positive_center_weight():
    for name, (radius, fw) in film.FILTERS.items():
        w0 = float(fw(jnp.asarray(0.0)))
        assert w0 > 0, name
        wr = float(fw(jnp.asarray(radius + 0.6)))
        assert wr == 0.0, name


def test_footprint_ordering():
    """A delta splat's footprint grows with filter radius: box (0.5) is
    the most localized; wider-radius filters spread further."""
    H = W = 9
    one = jnp.ones((1, 3))
    px = jnp.asarray([4.5])
    py = jnp.asarray([4.5])
    spread = {}
    for name in ("box", "tent", "gaussian", "lanczos"):
        img, wsum = film.splat_filtered(film.new_film(H, W),
                                        jnp.zeros((H, W)), px, py, one,
                                        rfilter=name)
        w = np.asarray(wsum)
        w = np.abs(w) / np.abs(w).sum()
        yy, xx = np.mgrid[0:H, 0:W]
        spread[name] = (w * ((xx - 4) ** 2 + (yy - 4) ** 2)).sum()
    assert spread["box"] <= spread["tent"] + 1e-6
    assert all(spread["box"] <= v + 1e-6 for v in spread.values())
