"""Native host library: OBJ parse, SAH BVH build, Morton ordering."""

import os
import tempfile

import numpy as np
import pytest

from gvpm_tpu.native import bind

pytestmark = pytest.mark.skipif(not bind.available(),
                                reason="native toolchain unavailable")

OBJ = """
# cube-ish
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1 4//1
f -4 -3 -2
"""


def test_obj_loader():
    with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                     delete=False) as f:
        f.write(OBJ)
        path = f.name
    try:
        v, fc, vn = bind.load_obj(path)
        assert v.shape == (4, 3)
        # quad fans into 2 tris + the extra tri line = 3 faces
        assert fc.shape == (3, 3)
        np.testing.assert_array_equal(fc[0], [0, 1, 2])
        np.testing.assert_array_equal(fc[1], [0, 2, 3])
        np.testing.assert_array_equal(fc[2], [0, 1, 2])
        assert vn is None or vn.shape == (4, 3)
        # cross-check with the python fallback parser
        from gvpm_tpu.utils import meshio
        import gvpm_tpu.native.bind as b2
        avail = b2.available
        b2.available = lambda: False
        try:
            v2, f2, _ = meshio.load_obj(path)
        finally:
            b2.available = avail
        np.testing.assert_allclose(v, v2)
        np.testing.assert_array_equal(fc, f2)
    finally:
        os.unlink(path)


def test_bvh_build_and_coverage():
    rng = np.random.default_rng(0)
    n = 500
    centers = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.2, (n, 1)).astype(np.float32)
    lo = centers - half
    hi = centers + half
    bvh = bind.build_bvh(lo, hi, leaf_size=4)
    assert bvh["node_lo"].shape[0] == bvh["left"].shape[0]
    # every primitive appears exactly once in the permutation
    assert sorted(bvh["order"].tolist()) == list(range(n))
    # leaves partition the primitive range
    leaves = bvh["left"] == -1
    spans = sorted((int(f), int(f + c)) for f, c in
                   zip(bvh["first"][leaves], bvh["count"][leaves]))
    pos = 0
    for a, b in spans:
        assert a == pos
        pos = b
    assert pos == n
    # parent boxes contain children
    for i in range(bvh["left"].shape[0]):
        l, r = bvh["left"][i], bvh["right"][i]
        if l >= 0:
            for ch in (l, r):
                assert (bvh["node_lo"][i] <= bvh["node_lo"][ch] + 1e-5).all()
                assert (bvh["node_hi"][i] >= bvh["node_hi"][ch] - 1e-5).all()


def test_morton_locality():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (2048, 3)).astype(np.float32)
    order = bind.morton_order(pts, np.zeros(3), np.ones(3))
    assert sorted(order.tolist()) == list(range(2048))
    # Morton ordering shortens the total tour length vs random order
    tour = np.linalg.norm(np.diff(pts[order], axis=0), axis=1).sum()
    tour_rand = np.linalg.norm(np.diff(pts, axis=0), axis=1).sum()
    assert tour < 0.5 * tour_rand
