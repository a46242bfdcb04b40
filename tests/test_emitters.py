"""Delta/infinite emitter tests (reference: src/emitters/{point,spot,
directional,constant}.cpp) — analytic direct lighting, white furnace,
and cross-integrator validation of photon emission."""

import numpy as np
import jax.numpy as jnp
import pytest

from gvpm_tpu.scene import SceneBuilder
from gvpm_tpu.core.config import VolPathConfig, PhotonConfig
from gvpm_tpu.integrators import volpath, simple, lighttrace


def _floor_scene(add_light):
    b = SceneBuilder()
    fl = b.diffuse([0.6] * 3)
    b.rectangle([-5, 0, -5], [10, 0, 0], [0, 0, 10], fl)
    add_light(b)
    b.camera(origin=[0, 1.5, -3], target=[0, 0, 0], fov=60)
    return b.build(width=24, height=24)


def test_point_light_cross_integrator():
    """Eye-path (volpath), one-bounce (direct), and light-path
    (lighttrace) estimates of a point-lit floor must agree."""
    s = _floor_scene(lambda b: b.point_light([0, 2, 0], [10.0] * 3))
    cfg = VolPathConfig(spp=8, max_depth=3, null_bounces=2)
    img = volpath.render(s, cfg, seed=0)
    assert jnp.isfinite(img).all() and float(jnp.mean(img)) > 0
    d_img = simple.render_direct(s, spp=8)
    lt = lighttrace.render(
        s, PhotonConfig(max_depth=3, null_bounces=2,
                        surface_photons=1 << 14, volume_photons=1 << 14),
        passes=4)
    m = float(jnp.mean(img))
    assert abs(float(jnp.mean(d_img)) / m - 1) < 0.15
    assert abs(float(jnp.mean(lt)) / m - 1) < 0.25
@pytest.mark.slow
def test_directional_light_analytic():
    """Directional light straight down on a diffuse floor:
    L = albedo/pi * E everywhere on the floor."""
    s = _floor_scene(lambda b: b.directional_light([0, -1, 0], [2.0] * 3))
    img = volpath.render(s, VolPathConfig(spp=8, max_depth=3,
                                          null_bounces=2), seed=0)
    expect = 0.6 / np.pi * 2.0
    assert abs(float(img[10, 8, 0]) - expect) < 0.05


def test_spot_light_cone():
    """Spot light: energy inside the cone, zero well outside."""
    s = _floor_scene(lambda b: b.spot_light([0, 2, 0], [0, 0, 0],
                                            [10.0] * 3, cutoff_deg=30))
    img = simple.render_direct(s, spp=8)
    assert jnp.isfinite(img).all()
    assert float(jnp.max(img)) > 0
    # floor extends well beyond the cone footprint: corners must be dark
    assert float(jnp.min(jnp.mean(img, axis=-1))) < 1e-3


def test_constant_env_furnace():
    """White diffuse sphere under constant env L=1: every camera ray
    returns 1 (white-furnace closure)."""
    b = SceneBuilder()
    wh = b.diffuse([1.0] * 3)
    b.sphere([0, 0, 0], 1.0, wh)
    b.constant_env([1.0] * 3)
    b.camera(origin=[0, 0, -4], target=[0, 0, 0], fov=40)
    s = b.build(width=16, height=16)
    img = volpath.render(s, VolPathConfig(spp=16, max_depth=12,
                                          null_bounces=2), seed=0)
    assert abs(float(jnp.mean(img)) - 1.0) < 0.08


def test_mitsuba_loader_point_and_constant(tmp_path):
    xml = """<scene version="0.5.0">
      <emitter type="point">
        <point name="position" x="0" y="2" z="0"/>
        <spectrum name="intensity" value="10"/>
      </emitter>
      <emitter type="constant">
        <spectrum name="radiance" value="0.25"/>
      </emitter>
      <shape type="rectangle">
        <bsdf type="diffuse"/>
      </shape>
      <sensor type="perspective">
        <film type="hdrfilm">
          <integer name="width" value="8"/>
          <integer name="height" value="8"/>
        </film>
      </sensor>
    </scene>"""
    p = tmp_path / "s.xml"
    p.write_text(xml)
    from gvpm_tpu.scene import mitsuba
    scene, meta = mitsuba.load(str(p))
    assert scene.de_type.shape[0] == 1
    assert float(scene.env_radiance[0]) == 0.25
    gp = np.asarray(scene.light_group_p)
    assert gp[1] > 0 and gp[2] > 0 and abs(gp.sum() - 1) < 1e-5


# ---------------------------------------------------------------------------
# environment map (emitters/envmap.cpp)


def _aniso_map():
    """Strongly anisotropic lat-long HDR map: one hot region."""
    He, We = 16, 32
    img = np.full((He, We, 3), 0.02, np.float32)
    img[3:6, 8:12] = (25.0, 18.0, 5.0)      # bright warm patch high up
    img[10:12, 24:28] = (0.0, 4.0, 9.0)     # dimmer cool patch low
    return img


def test_envmap_pdf_matches_sampler():
    """sample_env_dir's returned pdf equals pdf_env_sa at the sampled
    direction, and the pdf integrates to 1 over the sphere."""
    import jax
    from gvpm_tpu.core import warp
    from gvpm_tpu.render.emitter import pdf_env_sa, sample_env_dir
    b = SceneBuilder()
    b.envmap(_aniso_map())
    b.rectangle([-1, -3, -1], [2, 0, 0], [0, 0, 2], b.diffuse([0.5] * 3))
    b.camera(origin=[0, 0, -1], target=[0, 0, 0])
    s = b.build(width=4, height=4)
    n = 1 << 15
    u2 = jax.random.uniform(jax.random.key(0), (n, 2))
    d, pdf = sample_env_dir(s, u2)
    assert bool(jnp.all(jnp.abs(jnp.linalg.norm(d, axis=-1) - 1) < 1e-4))
    pdf_eval = pdf_env_sa(s, d) / jnp.maximum(s.light_group_p[2], 1e-20)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_eval),
                               rtol=1e-3)
    # normalization: E_uniform[pdf] * 4pi == 1
    du = warp.square_to_uniform_sphere(
        jax.random.uniform(jax.random.key(1), (1 << 17, 2)))
    mass = float(jnp.mean(pdf_env_sa(s, du)
                          / jnp.maximum(s.light_group_p[2], 1e-20))
                 * 4.0 * jnp.pi)
    assert abs(mass - 1.0) < 0.02, mass
@pytest.mark.slow
def test_envmap_nee_matches_bsdf_sampling():
    """NEE importance sampling of the map agrees with BSDF-only
    sampling of the same scene (unbiasedness of pdf/CDF tables)."""
    def build(nee):
        b = SceneBuilder()
        b.envmap(_aniso_map())
        fl = b.diffuse([0.6] * 3)
        b.rectangle([-5, 0, -5], [10, 0, 0], [0, 0, 10], fl)
        b.camera(origin=[0, 1.5, -3], target=[0, 0, 0], fov=60)
        return b.build(width=16, height=16)

    s = build(True)
    img_nee = volpath.render(
        s, VolPathConfig(spp=24, max_depth=3, null_bounces=2, nee=True),
        seed=0)
    img_brut = volpath.render(
        s, VolPathConfig(spp=96, max_depth=3, null_bounces=2, nee=False),
        seed=1)
    m_nee = float(jnp.mean(img_nee))
    m_brut = float(jnp.mean(img_brut))
    assert m_nee > 0 and np.isfinite(m_nee)
    assert abs(m_nee / m_brut - 1.0) < 0.2, (m_nee, m_brut)


def test_envmap_constant_matches_constant_env():
    """A uniform map must reproduce the constant-env renderer path."""
    def build(use_map):
        b = SceneBuilder()
        if use_map:
            b.envmap(np.ones((8, 16, 3), np.float32), scale=(0.8, 0.9, 1.0))
        else:
            b.constant_env((0.8, 0.9, 1.0))
        fl = b.diffuse([0.6] * 3)
        b.rectangle([-5, 0, -5], [10, 0, 0], [0, 0, 10], fl)
        b.camera(origin=[0, 1.5, -3], target=[0, 0, 0], fov=60)
        return b.build(width=12, height=12)

    cfg = VolPathConfig(spp=16, max_depth=3, null_bounces=2)
    a = volpath.render(build(True), cfg, seed=0)
    c = volpath.render(build(False), cfg, seed=0)
    ratio = float(jnp.mean(a)) / float(jnp.mean(c))
    assert abs(ratio - 1.0) < 0.1, ratio


def test_envmap_photon_emission():
    """Photon emission from the map: light tracer agrees with volpath."""
    b = SceneBuilder()
    b.envmap(_aniso_map())
    fl = b.diffuse([0.6] * 3)
    b.rectangle([-5, 0, -5], [10, 0, 0], [0, 0, 10], fl)
    b.camera(origin=[0, 1.5, -3], target=[0, 0, 0], fov=60)
    s = b.build(width=16, height=16)
    img = volpath.render(
        s, VolPathConfig(spp=24, max_depth=3, null_bounces=2), seed=0)
    lt = lighttrace.render(
        s, PhotonConfig(max_depth=3, null_bounces=2,
                        surface_photons=1 << 15, volume_photons=1 << 15),
        passes=6)
    m = float(jnp.mean(img))
    assert abs(float(jnp.mean(lt)) / m - 1) < 0.3, (float(jnp.mean(lt)), m)
