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
def test_photon_soa_bitwise_equal_across_device_counts():
    """The reference's deterministic mode is EXACT (gvpm_proc.cpp:
    352-378): results must not depend on the worker count. Photon walks
    are keyed by global path index (rng streams take path_offset +
    lane), so the per-shard SoAs, reassembled into global path order,
    reproduce the single-device shoot: BITWISE for every discrete field
    (types, prims, provenance — the random branches all match), and to
    1-2 ulp for float fields (different shard widths are different XLA
    programs; fusion may reassociate an fma — measured 3/172032
    elements at 6e-8 on this backend, which is the honest limit of
    cross-compilation determinism)."""
    scene = make_box_scene(w=16, h=16)
    from gvpm_tpu.core import rng
    k = rng.pass_key(0, 0, rng.STREAM_LIGHT)
    n = 8192
    ph1, bm1 = sppm.shoot_photons(scene, CFG, n, k, path_offset=0)
    for n_dev in (2, 8):
        per = n // n_dev
        parts = [sppm.shoot_photons(scene, CFG, per, k,
                                    path_offset=d * per)[0]
                 for d in range(n_dev)]
        for f in ph1:
            a1 = np.asarray(ph1[f])
            # [S*per(,3)] step-major per shard -> [S, per] -> concat
            # along paths -> global [S, n] -> flatten
            S = a1.shape[0] // n
            blocks = []
            for d, p in enumerate(parts):
                blk = np.asarray(p[f]).reshape((S, per) + a1.shape[1:])
                if f == "parent_idx":
                    # provenance indices are SHARD-LOCAL flat ids
                    # (s*per + i); remap to the global layout
                    s_ = np.where(blk >= 0, blk // per, 0)
                    i_ = np.where(blk >= 0, blk % per, 0)
                    blk = np.where(blk >= 0, s_ * n + d * per + i_, blk)
                elif f == "path":
                    # shard-local lane id -> global path id
                    blk = np.where(blk >= 0, blk + d * per, blk)
                blocks.append(blk)
            cat = np.concatenate(blocks, axis=1).reshape(a1.shape)
            if np.issubdtype(a1.dtype, np.floating):
                np.testing.assert_allclose(
                    cat, a1, rtol=3e-7, atol=1e-7,
                    err_msg=f"{f} differs at n_dev={n_dev}")
            else:
                np.testing.assert_array_equal(
                    cat, a1, err_msg=f"{f} differs at n_dev={n_dev}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_gvpm_sharded_gradient_pass():
    """The gradient pass shards: finite row-sharded primal + gradients,
    and TIGHT device-count invariance — photon walks are keyed by
    global path index, camera walks by pixel id, gather samples by
    (pixel, step) id (rng.lane_uniform), so 2- and 8-device runs
    evaluate the same estimator on the same sample points. Under a
    no-overflow/no-clipping config the only difference is fp summation
    order across tile boundaries: rtol 1e-3 (VERDICT r4 next #7,
    tightened from the r3 2% bar)."""
    from gvpm_tpu.core.config import GradientConfig
    scene = make_box_scene(w=16, h=16)
    gcfg = GradientConfig(max_depth=4, null_bounces=3, max_cam_depth=4,
                          surface_photons=8192, volume_photons=8192,
                          grid_hash_size=1 << 12, volume_samples=1,
                          grid_max_photons_per_cell=512,
                          gather_window=1 << 15, cull_k=1024,
                          # segment budget >= all slots: the compaction
                          # argsort is shard-local, so a binding budget
                          # would drop DIFFERENT segments per layout
                          vol_segments_per_pixel=4,
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
        imgs.append((np.asarray(p), np.asarray(gx), np.asarray(gy),
                     int(stats["visits"])))
    assert imgs[0][3] == imgs[1][3], "visit counts must match exactly"
    for a, b in zip(imgs[0][:3], imgs[1][:3]):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
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
                          cull_k=1024, use_manifold=False)
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
@pytest.mark.slow
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
