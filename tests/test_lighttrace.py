"""Light tracer vs path tracer: the bidirectional consistency check
(reference: data/tests/test_bidir* cross-validation strategy)."""

import jax.numpy as jnp
import numpy as np

from gvpm_tpu.core.config import PhotonConfig, VolPathConfig
from gvpm_tpu.integrators import lighttrace, volpath
from tests.test_sppm import make_box_scene


def test_lighttrace_matches_volpath():
    scene = make_box_scene(w=12, h=12)
    ref = np.asarray(volpath.render(
        scene, VolPathConfig(spp=16, max_depth=5), seed=21))
    cfg = PhotonConfig(max_depth=5, null_bounces=3,
                       surface_photons=16384, volume_photons=16384)
    img = np.asarray(lighttrace.render(scene, cfg, seed=22, passes=4))
    assert np.isfinite(img).all()
    ratio = img.mean() / ref.mean()
    assert 0.8 < ratio < 1.2, f"energy ratio {ratio:.3f}"
    # tile-level structural agreement
    t_img = img.reshape(4, 3, 4, 3, 3).mean(axis=(1, 3))
    t_ref = ref.reshape(4, 3, 4, 3, 3).mean(axis=(1, 3))
    rel = np.abs(t_img - t_ref) / (t_ref + 0.05)
    assert np.median(rel) < 0.3, np.median(rel)
