import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.scene import SceneBuilder, camera, intersect


@pytest.fixture(scope="module")
def box_scene():
    b = SceneBuilder()
    white = b.diffuse([0.8, 0.8, 0.8])
    light = b.area_light([10.0, 10.0, 10.0])
    b.cube([0, 0, 0], [1, 1, 1], white, inward=True)
    b.rectangle([0.4, 0.999, 0.4], [0.2, 0, 0], [0, 0, 0.2], white,
                emitter=light)
    b.sphere([0.5, 0.3, 0.5], 0.15, white)
    b.camera(origin=[0.5, 0.5, -1.5], target=[0.5, 0.5, 0.5], fov=45)
    return b.build(width=64, height=64)


def test_intersect_box(box_scene):
    # ray from inside the box toward the back wall at z=1; the sphere at
    # (0.5,0.3,0.5) r=0.15 is missed at y=0.5
    o = jnp.array([[0.5, 0.5, 0.05]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect(box_scene, o, d)
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 0.95, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.p[0]), [0.5, 0.5, 1.0],
                               atol=1e-3)
    # normal of the z=1 inward face points toward -z
    assert float(hit.ng[0, 2]) < -0.9


def test_intersect_sphere(box_scene):
    o = jnp.array([[0.5, 0.3, 0.05]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect(box_scene, o, d)
    assert bool(hit.valid[0])
    np.testing.assert_allclose(float(hit.t[0]), 0.45 - 0.15, atol=1e-3)
    assert int(hit.prim[0]) >= box_scene.n_tris  # sphere id


def test_camera_roundtrip(box_scene):
    px = jnp.array([10.0, 32.0, 55.0])
    py = jnp.array([5.0, 32.0, 60.0])
    u = jnp.full((3, 2), 0.5)
    o, d, spread = camera.generate_rays(box_scene, px, py, u)
    p = o + d * 2.0
    qx, qy, inside, _ = camera.project(box_scene, p)
    np.testing.assert_allclose(np.asarray(qx), np.asarray(px) + 0.5,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(qy), np.asarray(py) + 0.5,
                               atol=1e-2)
    assert bool(jnp.all(inside))
    assert float(jnp.min(spread)) > 0


def test_importance_weight_integrates_to_pixels(box_scene):
    """sum over uniformly sampled directions of We/pdf == W*H (pixel count
    covered by the frustum) — validates the splatting normalization."""
    key = jax.random.key(0)
    n = 400000
    u = jax.random.uniform(key, (n, 2))
    from gvpm_tpu.core import warp
    d = warp.square_to_uniform_sphere(u)
    w = camera.importance_weight(box_scene, d)
    _, _, inside, _ = camera.project(
        box_scene, box_scene.cam_to_world[:3, 3] + d)
    est = float(jnp.sum(jnp.where(inside, w, 0.0)) / n * 4 * jnp.pi)
    expect = box_scene.width * box_scene.height
    # per-pixel importance integrates to number of pixels
    assert abs(est / expect - 1.0) < 0.05


def test_occlusion(box_scene):
    a = jnp.array([[0.5, 0.3, -0.5], [0.1, 0.9, 0.1]])
    bpt = jnp.array([[0.5, 0.3, 1.5], [0.9, 0.9, 0.9]])
    from gvpm_tpu.scene import occluded
    blocked = occluded(box_scene, a, bpt)
    assert bool(blocked[0])       # passes through sphere (and walls)
    assert not bool(blocked[1])   # clear diagonal inside the box
