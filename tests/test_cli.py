"""CLI smoke: render a builtin scene end-to-end and write outputs."""

import os

import numpy as np

from gvpm_tpu import cli
from gvpm_tpu.utils import image as imglib


def test_cli_volpath(tmp_path):
    dest = str(tmp_path / "out")
    rc = cli.main(["box-medium", "-i", "volpath", "--spp", "2",
                   "--max-depth", "4", "--width", "16", "--height", "16",
                   "-o", dest])
    assert rc == 0
    img = imglib.read_pfm(dest + ".pfm")
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0
    assert os.path.exists(dest + ".png")
    assert os.path.exists(dest + "_meta.json")


def test_scene_registry():
    from gvpm_tpu import scenes
    for name in scenes.REGISTRY:
        s = scenes.get(name, width=8, height=8)
        assert s.n_tris > 0
        assert s.em_prim.shape[0] > 0, name


def test_checkpoint_resume(tmp_path):
    """--checkpoint round-trips: a run killed mid-way resumes and matches
    an uninterrupted run exactly (same seeds per pass)."""
    import jax.numpy as jnp
    import numpy as np
    from gvpm_tpu.core.config import PhotonConfig
    from gvpm_tpu.integrators import sppm
    from tests.test_sppm import make_box_scene

    scene = make_box_scene(w=8, h=8)
    cfg = PhotonConfig(max_depth=4, max_cam_depth=4, surface_photons=2048,
                       volume_photons=2048, grid_hash_size=1 << 12,
                       volume_samples=1)
    ck = str(tmp_path / "state.npz")
    full = sppm.render(scene, cfg, passes=4, seed=5)["image"]
    # run only 2 passes (checkpoint_every=2 -> saved at pass 2), then
    # "crash" and resume to 4
    sppm.render(scene, cfg, passes=2, seed=5, checkpoint_path=ck,
                checkpoint_every=2)
    out = sppm.render(scene, cfg, passes=4, seed=5, checkpoint_path=ck,
                      checkpoint_every=2)["image"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-7)
