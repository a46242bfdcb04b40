"""Built-in scene registry: the benchmark scene family.

The paper's scene data ships outside the reference repo (downloadable,
README.md:12-13); these procedural stand-ins cover the same structural
cases the generator matrix exercises (scripts/scene/generatorGVPM.py):
a surface-dominant box, a homogeneous-medium box with varying albedo /
anisotropy, a caustic-through-glass setup, and a spot-beam ("LASER"
style) medium scene.
"""

from __future__ import annotations

from .scene import SceneBuilder


def _open_box(b, white=None):
    w = white if white is not None else b.diffuse([0.73, 0.73, 0.73])
    red = b.diffuse([0.63, 0.065, 0.05])
    green = b.diffuse([0.14, 0.45, 0.091])
    b.rectangle([0, 0, 0], [0, 0, 1], [1, 0, 0], w)         # floor
    b.rectangle([0, 1, 0], [1, 0, 0], [0, 0, 1], w)         # ceiling
    b.rectangle([0, 0, 1], [0, 1, 0], [1, 0, 0], w)         # back
    b.rectangle([0, 0, 0], [0, 1, 0], [0, 0, 1], red)       # left
    b.rectangle([1, 0, 0], [0, 0, 1], [0, 1, 0], green)     # right
    return w


def box_surface(width=256, height=256):
    """Surface-only cornell box (config 1 baseline geometry)."""
    b = SceneBuilder()
    _open_box(b)
    light = b.area_light([17.0, 12.0, 4.0])
    b.rectangle([0.34, 0.998, 0.34], [0.32, 0, 0], [0, 0, 0.32],
                b.diffuse([0, 0, 0]), emitter=light)
    mirror = b.conductor()
    b.sphere([0.3, 0.18, 0.6], 0.18, mirror)
    glass = b.dielectric(int_ior=1.5)
    b.sphere([0.72, 0.16, 0.35], 0.16, glass)
    b.camera(origin=[0.5, 0.5, -1.35], target=[0.5, 0.5, 0.5], fov=40)
    return b.build(width=width, height=height)


def box_medium(width=256, height=256, sigma_s=0.4, sigma_a=0.05, g=0.0):
    """Homogeneous-medium box (BASELINE configs 1-2)."""
    b = SceneBuilder()
    _open_box(b)
    light = b.area_light([20.0, 17.0, 9.0])
    b.rectangle([0.34, 0.998, 0.34], [0.32, 0, 0], [0, 0, 0.32],
                b.diffuse([0, 0, 0]), emitter=light)
    m = b.homogeneous(sigma_a=[sigma_a] * 3, sigma_s=[sigma_s] * 3, g=g)
    b.medium_box([0.02, 0.02, 0.02], [0.98, 0.98, 0.98], m)
    mirror = b.conductor()
    b.sphere([0.32, 0.2, 0.62], 0.2, mirror)
    b.camera(origin=[0.5, 0.5, -1.35], target=[0.5, 0.5, 0.5], fov=40)
    return b.build(width=width, height=height)


def caustic_glass(width=256, height=256):
    """Glass sphere focusing light into a medium (caustic/ME case)."""
    b = SceneBuilder()
    _open_box(b)
    light = b.area_light([40.0, 38.0, 33.0])
    b.rectangle([0.42, 0.998, 0.42], [0.16, 0, 0], [0, 0, 0.16],
                b.diffuse([0, 0, 0]), emitter=light)
    m = b.homogeneous(sigma_a=[0.02] * 3, sigma_s=[0.25] * 3, g=0.4)
    b.medium_box([0.02, 0.02, 0.02], [0.98, 0.98, 0.98], m)
    glass = b.dielectric(int_ior=1.5)
    b.sphere([0.5, 0.62, 0.5], 0.16, glass)
    b.camera(origin=[0.5, 0.45, -1.35], target=[0.5, 0.45, 0.5], fov=38)
    return b.build(width=width, height=height)


def laser_beam(width=256, height=256):
    """Narrow emitter driving a bright shaft through dense fog
    (LASER-scene analog: plane/beam estimator stress case)."""
    b = SceneBuilder()
    dark = b.diffuse([0.2, 0.2, 0.22])
    _open_box(b, white=dark)
    light = b.area_light([900.0, 850.0, 800.0])
    # small tilted emitter near the upper-left corner aiming into the fog
    b.rectangle([0.06, 0.9, 0.3], [0.03, 0.0, 0.015],
                [0.0, 0.02, -0.025], b.diffuse([0, 0, 0]), emitter=light)
    m = b.homogeneous(sigma_a=[0.03] * 3, sigma_s=[0.9] * 3, g=0.7)
    b.medium_box([0.02, 0.02, 0.02], [0.98, 0.98, 0.98], m)
    b.camera(origin=[0.5, 0.5, -1.35], target=[0.5, 0.5, 0.5], fov=40)
    return b.build(width=width, height=height)


REGISTRY = {
    "box-surface": box_surface,
    "box-medium": box_medium,
    "box-medium-hg": lambda **kw: box_medium(g=0.5, **kw),
    "caustic-glass": caustic_glass,
    "laser": laser_beam,
}


def get(name, **kw):
    return REGISTRY[name](**kw)
