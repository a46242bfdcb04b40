"""Mitsuba XML scene loader: parse the reference's scene format."""

import os
import tempfile

import numpy as np
import pytest

from gvpm_tpu.scene import mitsuba

XML = """<?xml version="1.0"?>
<scene version="0.5.0">
    <default name="photons" value="10000"/>
    <integrator type="gvpm">
        <integer name="maxDepth" value="8"/>
        <integer name="volumePhotonCount" value="$photons"/>
        <float name="alpha" value="0.7"/>
        <string name="volTechnique" value="distance"/>
    </integrator>
    <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="toWorld">
            <lookat origin="0.5, 0.5, -1.2" target="0.5, 0.5, 0.5"
                    up="0, 1, 0"/>
        </transform>
        <film type="hdrfilm">
            <integer name="width" value="64"/>
            <integer name="height" value="48"/>
        </film>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.7, 0.7, 0.7"/>
    </bsdf>
    <medium type="homogeneous" id="fog">
        <spectrum name="sigmaS" value="0.4"/>
        <spectrum name="sigmaA" value="0.05"/>
        <phase type="hg"><float name="g" value="0.3"/></phase>
    </medium>
    <shape type="rectangle">
        <transform name="toWorld">
            <scale value="0.5"/>
            <rotate x="1" angle="90"/>
            <translate x="0.5" y="0.0" z="0.5"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="sphere">
        <point name="center" value="0.5, 0.3, 0.5"/>
        <float name="radius" value="0.15"/>
        <bsdf type="conductor"/>
    </shape>
    <shape type="cube">
        <transform name="toWorld">
            <scale value="0.48"/>
            <translate x="0.5" y="0.5" z="0.5"/>
        </transform>
        <bsdf type="null"/>
        <ref name="interior" id="fog"/>
    </shape>
    <shape type="rectangle">
        <transform name="toWorld">
            <scale value="0.15"/>
            <rotate x="1" angle="90"/>
            <translate x="0.5" y="0.99" z="0.5"/>
        </transform>
        <emitter type="area">
            <spectrum name="radiance" value="15"/>
        </emitter>
    </shape>
</scene>
"""


@pytest.fixture(scope="module")
def loaded():
    with tempfile.NamedTemporaryFile("w", suffix=".xml",
                                     delete=False) as f:
        f.write(XML)
        path = f.name
    try:
        return mitsuba.load(path, defaults={"photons": 5000})
    finally:
        os.unlink(path)


def test_film_and_integrator(loaded):
    scene, meta = loaded
    assert scene.width == 64 and scene.height == 48
    integ = meta["integrator"]
    assert integ["type"] == "gvpm"
    assert integ["maxDepth"] == 8
    assert integ["volumePhotonCount"] == 5000  # -D override beat default
    assert integ["volTechnique"] == "distance"


def test_geometry(loaded):
    scene, _ = loaded
    # floor rect (2) + cube (12) + light rect (2) = 16 tris, 1 sphere
    assert scene.n_tris == 16
    assert scene.n_spheres == 1
    assert float(scene.sph_radius[0]) == pytest.approx(0.15)
    np.testing.assert_allclose(np.asarray(scene.sph_center[0]),
                               [0.5, 0.3, 0.5], atol=1e-6)


def test_transforms(loaded):
    scene, _ = loaded
    # floor rectangle: unit square scaled 0.5, rotated about x, moved to
    # y=0 plane centered at (0.5, 0, 0.5)
    p0 = np.asarray(scene.tri_p0[0])
    assert abs(p0[1]) < 1e-5
    assert -0.01 <= p0[0] <= 1.01


def test_media_and_emitter(loaded):
    scene, _ = loaded
    assert scene.med_sigma_s.shape[0] >= 1
    np.testing.assert_allclose(np.asarray(scene.med_sigma_s[0]),
                               0.4, atol=1e-6)
    assert float(scene.med_g[0]) == pytest.approx(0.3)
    assert scene.em_prim.shape[0] == 2  # light rect = 2 emissive tris
    # camera position from lookat
    np.testing.assert_allclose(np.asarray(scene.cam_to_world[:3, 3]),
                               [0.5, 0.5, -1.2], atol=1e-6)


def test_renders(loaded):
    scene, _ = loaded
    import jax.numpy as jnp
    from gvpm_tpu.core.config import VolPathConfig
    from gvpm_tpu.integrators import volpath
    img = volpath.render(scene, VolPathConfig(spp=2, max_depth=4), seed=0)
    assert bool(jnp.isfinite(img).all())
    assert float(img.mean()) > 0.0
