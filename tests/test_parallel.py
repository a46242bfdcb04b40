"""Multi-chip sharded rendering on the virtual 8-device CPU mesh:
correctness + device-count invariance (the TPU-native version of the
reference's deterministic mode, gvpm_proc.cpp:352-378)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core.config import PhotonConfig
from gvpm_tpu.integrators import sppm
from gvpm_tpu.parallel import dist, mesh as meshmod
from tests.test_sppm import make_box_scene

CFG = PhotonConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                   surface_photons=8192, volume_photons=8192,
                   grid_hash_size=1 << 12, volume_samples=1,
                   grid_max_photons_per_cell=160)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_pass_runs_and_is_finite():
    scene = make_box_scene(w=16, h=16)
    mesh = meshmod.make_mesh(8)
    r_vol = sppm.base_volume_radius(scene, CFG)
    img = dist.render_pass_sharded(mesh, scene, CFG, "distance", 8192,
                                   0, 0, 1.0, 1.0, r_vol)
    arr = np.asarray(img)
    assert arr.shape == (16, 16, 3)
    assert np.isfinite(arr).all()
    assert arr.mean() > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_device_count_changes_only_sampling_not_energy():
    """2-device and 8-device runs draw different photon keys but must
    agree statistically (same estimator, same totals)."""
    scene = make_box_scene(w=16, h=16)
    r_vol = sppm.base_volume_radius(scene, CFG)
    means = []
    for n_dev in (2, 8):
        mesh = meshmod.make_mesh(n_dev)
        acc = jnp.zeros((16, 16, 3))
        for it in range(3):
            acc = acc + dist.render_pass_sharded(
                mesh, scene, CFG, "distance", 8192, 0, it, 1.0, 1.0,
                r_vol)
        means.append(float(acc.mean()) / 3)
    assert abs(means[0] / means[1] - 1.0) < 0.25, means


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gvpm_sharded_gradient_pass():
    """The gradient pass shards: finite row-sharded primal + gradients,
    and NEAR-EXACT device-count invariance — photon walks are keyed by
    global path index, camera walks by pixel id, gather samples by
    (pixel, step) id (rng.lane_uniform), so 2- and 8-device runs
    evaluate the same estimator on the same sample points; only
    photon-map ORDER (grid tie-breaking, fp summation order) differs
    (VERDICT r3 task 7: tolerance <= 2%)."""
    from gvpm_tpu.core.config import GradientConfig
    scene = make_box_scene(w=16, h=16)
    gcfg = GradientConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                          surface_photons=8192, volume_photons=8192,
                          grid_hash_size=1 << 12, volume_samples=1,
                          grid_max_photons_per_cell=160,
                          use_manifold=False)
    r_vol = sppm.base_volume_radius(scene, gcfg)
    imgs = []
    for n_dev in (2, 8):
        mesh = meshmod.make_mesh(n_dev)
        p, gx, gy, stats = dist.gvpm_render_pass_sharded(
            mesh, scene, gcfg, "distance", 8192, 0, 0, 1.0, 1.0, r_vol)
        for a in (p, gx, gy):
            assert np.isfinite(np.asarray(a)).all()
        assert int(stats["visits"]) > 0
        imgs.append(np.asarray(p))
    m0, m1 = imgs[0].mean(), imgs[1].mean()
    assert abs(m0 / m1 - 1.0) < 0.02, (m0, m1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gvpm_ring_matches_all_gather():
    """Gradient-pass ring partitioning == all-gather (VERDICT r3 task
    7): linear photon terms telescope, the photon-independent emission
    term is 1/n_dev-scaled per step."""
    from gvpm_tpu.core.config import GradientConfig
    scene = make_box_scene(w=16, h=16)
    mesh = meshmod.make_mesh(4)
    # no-clipping, no-overflow config: window covers the whole table
    # and cull_k every ball — clip/overflow compensations are computed
    # from the RESIDENT PARTITION and are the two (documented)
    # nonlinearities that break exact ring==all-gather equality
    gcfg = GradientConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                          surface_photons=8192, volume_photons=8192,
                          grid_hash_size=1 << 12, volume_samples=1,
                          grid_max_photons_per_cell=512,
                          gather_window=1 << 15,
                          cull_k=256, use_manifold=False)
    r_vol = sppm.base_volume_radius(scene, gcfg)
    p_a, gx_a, gy_a, st_a = dist.gvpm_render_pass_sharded(
        mesh, scene, gcfg, "distance", 8192, 0, 0, 1.0, 1.0, r_vol)
    p_r, gx_r, gy_r, st_r = dist.gvpm_render_pass_sharded_ring(
        mesh, scene, gcfg, "distance", 8192, 0, 0, 1.0, 1.0, r_vol)
    for a, b in ((p_a, p_r), (gx_a, gx_r), (gy_a, gy_r)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5)
    assert int(st_r["visits"]) == int(st_a["visits"])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_rejects_bre_knn():
    """kNN radii from a partition-local map are biased — the ring path
    must reject them loudly (ADVICE r3)."""
    scene = make_box_scene(w=16, h=16)
    mesh = meshmod.make_mesh(4)
    cfg = PhotonConfig(max_depth=4, surface_photons=1024,
                       volume_photons=1024, bre_knn=8)
    with pytest.raises(ValueError):
        dist.render_pass_sharded_ring(
            mesh, scene, cfg, "bre", 1024, 0, 0, 1.0, 1.0, 0.1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_ring_pass_matches_all_gather():
    """Ring-rotated photon partitions == all-gathered map (exactly: the
    same gather sample key each ring step makes the partition sums
    telescope into the full-map estimate). This is the >HBM photon-map
    path (SURVEY 2.8; VERDICT r3 task 7)."""
    scene = make_box_scene(w=16, h=16)
    mesh = meshmod.make_mesh(4)
    # no-overflow config: with every stencil row under the candidate
    # budget, partition sums must equal the full-map gather EXACTLY —
    # any budget overflow subsamples DIFFERENT photons per layout
    cfg = PhotonConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                       surface_photons=8192, volume_photons=8192,
                       grid_hash_size=1 << 12, volume_samples=1,
                       grid_max_photons_per_cell=512)
    r_vol = sppm.base_volume_radius(scene, cfg)
    img_ag = dist.render_pass_sharded(mesh, scene, cfg, "distance",
                                      8192, 0, 0, 1.0, 1.0, r_vol)
    img_rg = dist.render_pass_sharded_ring(mesh, scene, cfg, "distance",
                                           8192, 0, 0, 1.0, 1.0, r_vol)
    a, b = np.asarray(img_ag), np.asarray(img_rg)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5)
