"""Multi-chip SPPM: pixel-sharded gather + all-gathered photon partitions.

The mapping from the reference's parallel decomposition (SURVEY.md §2.8):

  Scheduler photon work-units  -> light paths sharded over mesh devices,
                                  deterministic per-shard fold_in keys
  photon map build (serial)    -> all_gather of photon partitions over
                                  ICI, grid built redundantly per device
                                  (build is cheap: one sort)
  BlockScheduler image blocks  -> pixel rows sharded over devices
  work-result accumulation     -> film slices stay device-local; pass
                                  accumulation is elementwise on the
                                  sharded film

Deterministic by construction: photon keys depend only on (seed, pass,
global path index), so any device count yields identical photons — the
TPU-native version of the reference's `deterministic` mode
(gvpm_proc.cpp:352-378).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core import rng
from ..core.config import PhotonConfig
from ..integrators import sppm
from ..scene.types import Scene
from .mesh import AXIS


def render_pass_sharded(mesh, scene: Scene, cfg: PhotonConfig, volume,
                        n_photons, seed, it, surf_scale, vol_scale,
                        r_vol_base):
    """One progressive pass over the mesh; returns [H,W,3] (sharded rows).

    Requires H % n_devices == 0 and n_photons % n_devices == 0.
    """
    H, W = scene.height, scene.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0 and n_photons % n_dev == 0

    def body(scene_rep, seed_, it_, surf_s, vol_s, r_vol):
        me = lax.axis_index(AXIS)
        # ---- light pass: local photon partition. SAME key on every
        # device + global path offset -> the union of partitions is the
        # identical photon set at any device count (rng.lane_uniform) --
        k_light = rng.pass_key(seed_[0], it_[0], rng.STREAM_LIGHT)
        photons, beams = sppm.shoot_photons(
            scene_rep, cfg, n_photons // n_dev, k_light,
            path_offset=me * (n_photons // n_dev))
        # ---- photon partitions ride ICI to every device ----
        photons = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), photons)
        beams = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), beams)
        # ---- camera pass: local pixel rows; randoms keyed by PIXEL id
        # inside gatherpoint.trace, so no per-device key fold ----
        rows = H // n_dev
        y0 = me * rows
        py, px = jnp.mgrid[0:rows, 0:W]
        px = px.reshape(-1).astype(jnp.float32)
        py = (py + y0).reshape(-1).astype(jnp.float32)
        k_cam = rng.pass_key(seed_[0], it_[0], rng.STREAM_CAMERA)
        k_gather = rng.pass_key(seed_[0], it_[0], rng.STREAM_GATHER)
        img = sppm.gather_images(scene_rep, cfg, volume, photons, beams,
                                 n_photons, k_cam, k_gather, px, py,
                                 surf_s[0], vol_s[0], r_vol[0])
        return img.reshape(rows, W, 3)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P()),
                   out_specs=P(AXIS),
                   check_rep=False)
    args = (jnp.asarray([seed]), jnp.asarray([it]),
            jnp.asarray([surf_scale]), jnp.asarray([vol_scale]),
            jnp.asarray([r_vol_base]))
    return jax.jit(fn)(scene, *args)


def render_pass_sharded_ring(mesh, scene: Scene, cfg: PhotonConfig,
                             volume, n_photons, seed, it, surf_scale,
                             vol_scale, r_vol_base):
    """Ring-pass variant of render_pass_sharded for photon maps that
    exceed one device's HBM (SURVEY §2.8 target; the reference instead
    replicates the kd-tree per node, sched.h:395).

    Photon partitions are NEVER all-gathered: each device keeps 1/n of
    the map, gathers its pixel rows against the resident partition, then
    rotates partitions one hop around the ring (lax.ppermute over ICI) —
    after n_dev steps every partition has visited every device and the
    summed image equals the all-gather version EXACTLY for estimators
    LINEAR in the photon partition (same gather sample points each
    step: the per-pass gather key is reused, so the sum telescopes into
    the full-map estimate). Peak photon memory per device: 1/n_dev of
    the map + one in-flight partition.

    NOT valid with cfg.bre_knn > 0: per-photon kNN radii from the
    partition-LOCAL density are systematically larger than full-map kNN
    radii (the estimator is nonlinear in the partition) — rejected
    loudly below.
    """
    H, W = scene.height, scene.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0 and n_photons % n_dev == 0
    if volume == "bre" and getattr(cfg, "bre_knn", 0):
        raise ValueError(
            "render_pass_sharded_ring: bre_knn radii are computed from "
            "the local photon partition and would be biased; use "
            "render_pass_sharded (all-gather) or bre_knn=0")

    def body(scene_rep, seed_, it_, surf_s, vol_s, r_vol):
        me = lax.axis_index(AXIS)
        k_light = rng.pass_key(seed_[0], it_[0], rng.STREAM_LIGHT)
        photons, beams = sppm.shoot_photons(
            scene_rep, cfg, n_photons // n_dev, k_light,
            path_offset=me * (n_photons // n_dev))
        rows = H // n_dev
        y0 = me * rows
        py, px = jnp.mgrid[0:rows, 0:W]
        px = px.reshape(-1).astype(jnp.float32)
        py = (py + y0).reshape(-1).astype(jnp.float32)
        k_cam = rng.pass_key(seed_[0], it_[0], rng.STREAM_CAMERA)
        k_gather = rng.pass_key(seed_[0], it_[0], rng.STREAM_GATHER)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, _):
            acc, photons, beams = carry
            img = sppm.gather_images(
                scene_rep, cfg, volume, photons, beams, n_photons,
                k_cam, k_gather, px, py, surf_s[0], vol_s[0], r_vol[0],
                emission_scale=1.0 / n_dev)
            photons = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, AXIS, perm), photons)
            beams = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, AXIS, perm), beams)
            return (acc + img, photons, beams), None

        (img, _, _), _ = lax.scan(
            step, (jnp.zeros((rows * W, 3)), photons, beams), None,
            length=n_dev)
        return img.reshape(rows, W, 3)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P()),
                   out_specs=P(AXIS),
                   check_rep=False)
    args = (jnp.asarray([seed]), jnp.asarray([it]),
            jnp.asarray([surf_scale]), jnp.asarray([vol_scale]),
            jnp.asarray([r_vol_base]))
    return jax.jit(fn)(scene, *args)


def render(mesh, scene: Scene, cfg: PhotonConfig = PhotonConfig(),
           volume="distance", seed=0, passes=None):
    """Sharded progressive APA render (host driver)."""
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = max(cfg.volume_photons, cfg.surface_photons)
    n_dev = mesh.devices.size
    n_photons = ((n_photons + n_dev - 1) // n_dev) * n_dev
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    dim = sppm.KERNEL_DIM.get(volume, 3)

    accum = jnp.zeros((scene.height, scene.width, 3))
    surf_scale, vol_scale = 1.0, 1.0
    for it in range(n_passes):
        img = render_pass_sharded(mesh, scene, cfg, volume, n_photons,
                                  seed, it, surf_scale, vol_scale,
                                  r_vol_base)
        accum = accum + img
        ratio = sppm.radius_ratio(it, cfg.alpha)
        surf_scale *= ratio ** 0.5
        if dim > 0:
            vol_scale *= ratio ** (1.0 / dim)
    return dict(image=accum / n_passes, passes=n_passes)


def gvpm_render_pass_sharded(mesh, scene: Scene, cfg, volume, n_photons,
                             seed, it, surf_scale, vol_scale, r_vol_base):
    """One G-VPM gradient pass over the mesh.

    Decomposition (SURVEY.md §2.8 mapping): light paths shard over
    devices with deterministic fold_in keys; photon partitions all_gather
    over ICI; each device runs the full 5-way gradient gather
    (gvpm.pass_buffers) for its pixel ROWS. The per-direction S/W
    buffers come back row-sharded and UNASSEMBLED — gradient assembly
    (computeGradient's cross-pixel differences) runs on the gathered
    film, so row boundaries need no halo exchange.

    Returns (primal, gx, gy [H,W,3], stats dict).
    """
    from ..integrators import gvpm
    H, W = scene.height, scene.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0 and n_photons % n_dev == 0

    def body(scene_rep, seed_, it_, surf_s, vol_s, r_vol):
        me = lax.axis_index(AXIS)
        k_light = rng.pass_key(seed_[0], it_[0], rng.STREAM_LIGHT)
        photons, beams = sppm.shoot_photons(
            scene_rep, cfg, n_photons // n_dev, k_light,
            path_offset=me * (n_photons // n_dev))
        photons = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), photons)
        beams = jax.tree_util.tree_map(
            lambda a: lax.all_gather(a, AXIS, tiled=True), beams)
        rows = H // n_dev
        y0 = me * rows
        py, px = jnp.mgrid[0:rows, 0:W]
        px = px.reshape(-1).astype(jnp.float32)
        py = (py + y0).reshape(-1).astype(jnp.float32)
        xi = px.astype(jnp.int32)
        yi = py.astype(jnp.int32)
        border = jnp.stack([xi == W - 1, xi == 0,
                            yi == H - 1, yi == 0])
        k_cam = rng.pass_key(seed_[0], it_[0], rng.STREAM_CAMERA)
        k_gather = rng.pass_key(seed_[0], it_[0], rng.STREAM_GATHER)
        p_s, S_s, W_s, stats = gvpm.pass_buffers(
            scene_rep, cfg, volume, n_photons, photons, beams, k_cam,
            k_gather, px, py, border, surf_s[0], vol_s[0], r_vol[0])
        st = jnp.stack([stats["visits"], stats["shift_ok"],
                        stats.get("win_dropped", 0),
                        stats.get("k_overflow", 0)])
        st = lax.psum(st, AXIS)
        return (p_s.reshape(rows, W, 3),
                S_s.reshape(4, rows, W, 3),
                W_s.reshape(4, rows, W, 3),
                st[None])

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P()),
                   out_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                              P(AXIS)),
                   check_rep=False)
    args = (jnp.asarray([seed]), jnp.asarray([it]),
            jnp.asarray([surf_scale]), jnp.asarray([vol_scale]),
            jnp.asarray([r_vol_base]))
    p, S, Wb, st = jax.jit(fn)(scene, *args)
    primal, gx, gy = gvpm.assemble_gradients(
        p.reshape(-1, 3), S.reshape(4, -1, 3), Wb.reshape(4, -1, 3),
        H, W)
    return primal, gx, gy, dict(visits=st[0, 0], shift_ok=st[0, 1],
                                win_dropped=st[0, 2],
                                k_overflow=st[0, 3])


def gvpm_render_pass_sharded_ring(mesh, scene: Scene, cfg, volume,
                                  n_photons, seed, it, surf_scale,
                                  vol_scale, r_vol_base):
    """Ring-pass variant of gvpm_render_pass_sharded: the GRADIENT pass
    with photon partitions rotated around the ring instead of
    all-gathered (render_pass_sharded_ring's memory model applied to
    the 5-way shift gather; SURVEY §2.8 — a paper-scale gradient map
    that exceeds one chip's HBM has no all-gather path).

    Linear-in-photons terms (surface/volume gathers, S/W shift buffers)
    telescope over the n_dev steps exactly; the photon-independent
    direct-emission term is scaled by 1/n_dev per step
    (gvpm.pass_buffers emission_scale). Camera paths are retraced per
    step — redundant compute traded for 1/n_dev photon memory.

    Two partition-dependent compensations are NOT linear: window-clip
    rescaling (total/cov from the resident partition's ranges) and
    cull-K overflow (cnt/K). Size gather_window / cull_k so they stay
    inactive (both are counted: win_dropped / k_overflow stats).
    """
    from ..integrators import gvpm
    H, W = scene.height, scene.width
    n_dev = mesh.devices.size
    assert H % n_dev == 0 and n_photons % n_dev == 0

    def body(scene_rep, seed_, it_, surf_s, vol_s, r_vol):
        me = lax.axis_index(AXIS)
        k_light = rng.pass_key(seed_[0], it_[0], rng.STREAM_LIGHT)
        photons, beams = sppm.shoot_photons(
            scene_rep, cfg, n_photons // n_dev, k_light,
            path_offset=me * (n_photons // n_dev))
        rows = H // n_dev
        y0 = me * rows
        py, px = jnp.mgrid[0:rows, 0:W]
        px = px.reshape(-1).astype(jnp.float32)
        py = (py + y0).reshape(-1).astype(jnp.float32)
        xi = px.astype(jnp.int32)
        yi = py.astype(jnp.int32)
        border = jnp.stack([xi == W - 1, xi == 0,
                            yi == H - 1, yi == 0])
        k_cam = rng.pass_key(seed_[0], it_[0], rng.STREAM_CAMERA)
        k_gather = rng.pass_key(seed_[0], it_[0], rng.STREAM_GATHER)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(carry, _):
            acc_p, acc_S, acc_W, acc_st, photons, beams = carry
            p_s, S_s, W_s, stats = gvpm.pass_buffers(
                scene_rep, cfg, volume, n_photons, photons, beams,
                k_cam, k_gather, px, py, border, surf_s[0], vol_s[0],
                r_vol[0], emission_scale=1.0 / n_dev)
            st = jnp.stack([stats["visits"], stats["shift_ok"],
                            stats.get("win_dropped", 0),
                            stats.get("k_overflow", 0)])
            photons = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, AXIS, perm), photons)
            beams = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, AXIS, perm), beams)
            return (acc_p + p_s, acc_S + S_s, acc_W + W_s,
                    acc_st + st, photons, beams), None

        n_pix = rows * W
        init = (jnp.zeros((n_pix, 3)), jnp.zeros((4, n_pix, 3)),
                jnp.zeros((4, n_pix, 3)), jnp.zeros((4,), jnp.int32),
                photons, beams)
        (p_s, S_s, W_s, st, _, _), _ = lax.scan(step, init, None,
                                                length=n_dev)
        st = lax.psum(st, AXIS)
        return (p_s.reshape(rows, W, 3),
                S_s.reshape(4, rows, W, 3),
                W_s.reshape(4, rows, W, 3),
                st[None])

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), P()),
                   out_specs=(P(AXIS), P(None, AXIS), P(None, AXIS),
                              P(AXIS)),
                   check_rep=False)
    args = (jnp.asarray([seed]), jnp.asarray([it]),
            jnp.asarray([surf_scale]), jnp.asarray([vol_scale]),
            jnp.asarray([r_vol_base]))
    p, S, Wb, st = jax.jit(fn)(scene, *args)
    primal, gx, gy = gvpm.assemble_gradients(
        p.reshape(-1, 3), S.reshape(4, -1, 3), Wb.reshape(4, -1, 3),
        H, W)
    return primal, gx, gy, dict(visits=st[0, 0], shift_ok=st[0, 1],
                                win_dropped=st[0, 2],
                                k_overflow=st[0, 3])


def gvpm_render(mesh, scene: Scene, cfg, volume="distance", seed=0,
                passes=None):
    """Sharded progressive G-VPM render + Poisson reconstruction."""
    from ..integrators import gvpm
    from ..ops import poisson
    n_passes = passes if passes is not None else cfg.max_passes
    n_photons = max(cfg.volume_photons, cfg.surface_photons)
    n_dev = mesh.devices.size
    n_photons = ((n_photons + n_dev - 1) // n_dev) * n_dev
    r_vol_base = sppm.base_volume_radius(scene, cfg)
    dim = sppm.KERNEL_DIM.get(volume, 3)

    H, W = scene.height, scene.width
    acc = [jnp.zeros((H, W, 3)) for _ in range(3)]
    surf_scale, vol_scale = 1.0, 1.0
    for it in range(n_passes):
        p, gx, gy, _ = gvpm_render_pass_sharded(
            mesh, scene, cfg, volume, n_photons, seed, it, surf_scale,
            vol_scale, r_vol_base)
        acc = [acc[0] + p, acc[1] + gx, acc[2] + gy]
        ratio = sppm.radius_ratio(it, cfg.alpha)
        surf_scale *= ratio ** 0.5
        if dim > 0:
            vol_scale *= ratio ** (1.0 / dim)
    primal, gx, gy = [a / n_passes for a in acc]
    recon = poisson.solve(primal, gx, gy, alpha=cfg.recon_alpha,
                          iters=cfg.recon_iters,
                          irls_iters=cfg.recon_irls_iters,
                          l1=cfg.recon_l1)
    return dict(image=recon, primal=primal, gx=gx, gy=gy)
