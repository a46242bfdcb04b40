"""Dense planar gradient gathers == fold-based reference implementations.

gvpm.py keeps the original fold-based gathers (surface_gradient_gather,
volume_gradient_gather, volume_gradient_bre) precisely as the readable
spec; gradient_gather.py is the TPU-fast planar rewrite. They must agree
to float tolerance on identical inputs (photon maps, camera paths, grid).
max_per_cell is set high enough that no cell overflows, so the different
grid cell sizes (dense uses cell=2r with the 8/27 stencils) cannot change
which photons are visited.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core import rng
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import (gatherpoint, gradient_gather, gvpm,
                                  ptracer, sppm)
from gvpm_tpu.ops import hashgrid
from tests.test_sppm import make_box_scene

CFG = GradientConfig(max_depth=4, max_cam_depth=4, surface_photons=2048,
                     volume_photons=2048, grid_hash_size=1 << 12,
                     volume_samples=1, grid_max_photons_per_cell=96)


@pytest.fixture(scope="module")
def setup():
    scene = make_box_scene(w=8, h=8)
    n = 64
    k_cam = rng.pass_key(3, 0, rng.STREAM_CAMERA)
    k_light = rng.pass_key(3, 0, rng.STREAM_LIGHT)
    py, px = jnp.mgrid[0:8, 0:8]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    base, cam_beams = gatherpoint.trace(scene, CFG, k_cam, px, py)
    sgps, scbs = [], []
    for dx, dy in gvpm.OFFSETS:
        g, cbm = gatherpoint.trace(scene, CFG, k_cam, px + dx, py + dy)
        sgps.append(g)
        scbs.append(cbm)
    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    border = jnp.stack([xi == 7, xi == 0, yi == 7, yi == 0])
    photons, _ = sppm.shoot_photons(scene, CFG, 2048, k_light)

    def flat_cb(c):
        cd = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), c)
        return dict(valid=cd.valid, o=cd.o, d=cd.d, length=cd.length,
                    med=cd.med, thr=cd.thr, pdf_prod=cd.pdf_prod)

    cb = flat_cb(cam_beams)
    scb_list = [flat_cb(c) for c in scbs]
    n_steps = cam_beams.valid.shape[0]
    lane = jnp.tile(jnp.arange(n, dtype=jnp.int32), n_steps)
    border_lane = jnp.stack([jnp.tile(border[i], n_steps)
                             for i in range(4)])
    return dict(scene=scene, base=base, sgps=sgps, border=border,
                photons=photons, cb=cb, scb_list=scb_list, lane=lane,
                border_lane=border_lane)


def _close(a, b, name, rtol=2e-4, atol=2e-6):
    a, b = np.asarray(a), np.asarray(b)
    assert np.isfinite(a).all() and np.isfinite(b).all(), name
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=name)
@pytest.mark.slow
def test_surface_dense_matches_fold(setup):
    s = setup
    pp = s["photons"]["p"]
    surf_valid = s["photons"]["vtype"] == ptracer.VERT_SURFACE
    # fixed small radius: at an 8x8 film the ray-differential radii are
    # ~0.25, cells saturate max_per_cell, and the two grid layouts then
    # compensate overflow with DIFFERENT random photon subsets — the
    # comparison needs zero overflow to be exact
    base = s["base"].replace(radius=jnp.full_like(s["base"].radius, 0.05))
    s = dict(s, base=base)
    r = s["base"].radius
    cell = jnp.maximum(jnp.max(jnp.where(s["base"].valid, r, 0.0)), 1e-5)
    grid27 = hashgrid.build(pp, surf_valid, s["scene"].world_lo, cell,
                            hash_size=CFG.grid_hash_size)
    packed = gradient_gather.pack_photons(s["scene"], s["photons"])
    grid8, packed8 = hashgrid.build_sorted(
        pp, surf_valid, s["scene"].world_lo, 2.0 * cell,
        packed, hash_size=CFG.grid_hash_size)
    p0, S0, W0 = gvpm.surface_gradient_gather(
        s["scene"], s["base"], s["sgps"], grid27, pp, s["photons"],
        2048, s["border"], max_per_cell=96)
    p1, S1, W1, visits, shift_ok, _ = gradient_gather.surface_gather(
        s["scene"], s["base"], s["sgps"], grid8, packed8,
        2048, s["border"], max_per_cell=96)
    _close(p0, p1, "primal")
    _close(S0, S1, "S")
    _close(W0, W1, "W")
    assert int(jnp.sum(visits)) > 0
@pytest.mark.slow
def test_volume_dense_matches_fold(setup):
    s = setup
    pp = s["photons"]["p"]
    med_valid = s["photons"]["vtype"] == ptracer.VERT_MEDIUM
    r_vol = 0.04
    key = rng.pass_key(3, 0, rng.STREAM_GATHER)
    grid27 = hashgrid.build(pp, med_valid, s["scene"].medium_lo, r_vol,
                            hash_size=CFG.grid_hash_size)
    packed = gradient_gather.pack_photons(s["scene"], s["photons"])
    grid8, packed8 = hashgrid.build_sorted(
        pp, med_valid, s["scene"].medium_lo, 2.0 * r_vol,
        packed, hash_size=CFG.grid_hash_size)
    p0, S0, W0 = gvpm.volume_gradient_gather(
        s["scene"], s["cb"], s["scb_list"], grid27, pp, s["photons"],
        2048, r_vol, key, s["lane"], s["border_lane"], n_samples=1,
        max_per_cell=96)
    p1, S1, W1, visits, shift_ok, _ = gradient_gather.volume_gather(
        s["scene"], s["cb"], s["scb_list"], grid8, packed8,
        2048, r_vol, key, s["border_lane"], n_samples=1,
        max_per_cell=96)
    _close(p0, p1, "primal")
    _close(S0, S1, "S")
    _close(W0, W1, "W")
    assert int(jnp.sum(visits)) > 0
@pytest.mark.slow
def test_bre_dense_matches_fold(setup):
    s = setup
    pp = s["photons"]["p"]
    med_valid = s["photons"]["vtype"] == ptracer.VERT_MEDIUM
    r_vol = 0.04
    grid = hashgrid.build(pp, med_valid, s["scene"].medium_lo,
                          2.0 * r_vol, hash_size=CFG.grid_hash_size)
    packed = gradient_gather.pack_photons(s["scene"], s["photons"])
    grid8, packed8 = hashgrid.build_sorted(
        pp, med_valid, s["scene"].medium_lo, 2.0 * r_vol,
        packed, hash_size=CFG.grid_hash_size)
    p0, S0, W0 = gvpm.volume_gradient_bre(
        s["scene"], s["cb"], s["scb_list"], grid, pp, s["photons"],
        2048, r_vol, s["border_lane"], max_steps=24, max_per_cell=96)
    # dense marches in 2*r steps (fold in r steps): half the step count
    # covers the identical [0, 24*r] camera range, so the two sides
    # visit exactly the same photon feet
    p1, S1, W1, visits, shift_ok = gradient_gather.bre_gather(
        s["scene"], s["cb"], s["scb_list"], grid8, packed8,
        2048, r_vol, s["border_lane"], max_steps=12, max_per_cell=96)
    _close(p0, p1, "primal")
    _close(S0, S1, "S")
    _close(W0, W1, "W")
    assert int(jnp.sum(visits)) > 0
@pytest.mark.slow
def test_surface_window_matches_dense(setup):
    """cellgrid windowed driver == hashgrid dense driver (same photons,
    window large enough that nothing clips)."""
    from gvpm_tpu.ops import cellgrid
    s = setup
    pp = s["photons"]["p"]
    surf_valid = s["photons"]["vtype"] == ptracer.VERT_SURFACE
    base = s["base"].replace(radius=jnp.full_like(s["base"].radius, 0.05))
    r = base.radius
    cell = jnp.maximum(jnp.max(jnp.where(base.valid, r, 0.0)), 1e-5)
    packed = gradient_gather.pack_photons(s["scene"], s["photons"])
    grid8, packed8 = hashgrid.build_sorted(
        pp, surf_valid, s["scene"].world_lo, 2.0 * cell,
        packed, hash_size=CFG.grid_hash_size)
    p0, S0, W0, v0, _, _ = gradient_gather.surface_gather(
        s["scene"], base, s["sgps"], grid8, packed8,
        2048, s["border"], max_per_cell=96)
    gridc, packedc = cellgrid.build_cells(
        pp, surf_valid, s["scene"].world_lo, s["scene"].world_hi,
        2.0 * cell, (16, 16, 16), packed)
    p1, S1, W1, v1, _, _ = gradient_gather.surface_gather(
        s["scene"], base, s["sgps"], gridc, packedc,
        2048, s["border"], window=1 << 15, window_q_tile=32)
    _close(p0, p1, "primal")
    _close(S0, S1, "S")
    _close(W0, W1, "W")
    assert int(jnp.sum(v0)) == int(jnp.sum(v1)) > 0
@pytest.mark.slow
def test_volume_window_matches_dense(setup):
    from gvpm_tpu.ops import cellgrid
    s = setup
    pp = s["photons"]["p"]
    med_valid = s["photons"]["vtype"] == ptracer.VERT_MEDIUM
    r_vol = 0.04
    key = rng.pass_key(3, 0, rng.STREAM_GATHER)
    packed = gradient_gather.pack_photons(s["scene"], s["photons"])
    grid8, packed8 = hashgrid.build_sorted(
        pp, med_valid, s["scene"].medium_lo, 2.0 * r_vol,
        packed, hash_size=CFG.grid_hash_size)
    p0, S0, W0, v0, _, _ = gradient_gather.volume_gather(
        s["scene"], s["cb"], s["scb_list"], grid8, packed8,
        2048, r_vol, key, s["border_lane"], n_samples=1,
        max_per_cell=96)
    gridc, packedc = cellgrid.build_cells(
        pp, med_valid, s["scene"].medium_lo, s["scene"].medium_hi,
        2.0 * r_vol, (16, 16, 16), packed)
    p1, S1, W1, v1, _, _ = gradient_gather.volume_gather(
        s["scene"], s["cb"], s["scb_list"], gridc, packedc,
        2048, r_vol, key, s["border_lane"], n_samples=1,
        window=1 << 15, window_q_tile=32)
    _close(p0, p1, "primal")
    _close(S0, S1, "S")
    _close(W0, W1, "W")
    assert int(jnp.sum(v0)) == int(jnp.sum(v1)) > 0
