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
