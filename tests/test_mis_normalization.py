"""Pair-MIS normalization properties (VERDICT r2 weak #6).

The symmetric gradient estimator needs w_base + w_offset == 1 for every
successful shift pair (shift_volume_photon.cpp:254-279,647-649): the
offset pixel's shift back to the base pixel sees the reciprocal pdf
ratio, so the balance heuristic must satisfy w(r) + w(1/r) == 1, and the
reconnection shift itself must be an involution (shifting back yields
the reciprocal ratio and the original photon power).
"""

import jax.numpy as jnp
import numpy as np

from gvpm_tpu.core import rng
from gvpm_tpu.core.config import GradientConfig
from gvpm_tpu.integrators import ptracer, shift, sppm
from tests.test_sppm import make_box_scene


def test_mis_weight_pair_normalization():
    r = jnp.logspace(-3.5, 3.5, 41)   # inside the sensor-ratio clamps
    w_fwd = shift.mis_weight(r, 1.0)
    w_rev = shift.mis_weight(1.0 / r, 1.0)
    np.testing.assert_allclose(np.asarray(w_fwd + w_rev), 1.0,
                               rtol=0, atol=1e-6)
    # jacobian folds in the same way on both sides
    w_fwd = shift.mis_weight(r, 2.0, jacobian=0.5)
    w_rev = shift.mis_weight(1.0 / r, 0.5, jacobian=2.0)
    np.testing.assert_allclose(np.asarray(w_fwd + w_rev), 1.0,
                               rtol=0, atol=1e-6)


def _photons():
    cfg = GradientConfig(max_depth=4, null_bounces=3,
                         surface_photons=2048, volume_photons=2048)
    scene = make_box_scene(w=8, h=8)
    pv, _ = sppm.shoot_photons(scene, cfg, 2048,
                               rng.pass_key(9, 0, rng.STREAM_LIGHT))
    keep = pv["reconnectable"] & (pv["vtype"] == ptracer.VERT_MEDIUM)
    idx = jnp.nonzero(keep, size=64, fill_value=0)[0]
    return scene, pv, idx


def test_identity_shift_is_neutral():
    """Zero-offset shift: alpha' == alpha, pdf ratio == 1, weights 1/2."""
    scene, pv, idx = _photons()
    a, pr, ok = shift.reconnect_photon(scene, pv, idx, pv["p"][idx],
                                       target_is_volume=True)
    oknp = np.asarray(ok)
    assert oknp.any()
    # cached scatter_base/pdf_dir_base come from the particle tracer's
    # evaluation order; the re-derivation here differs by f32 rounding
    # (<=0.5% observed) — 1% slack still pins sign/Jacobian structure
    np.testing.assert_allclose(np.asarray(pr)[oknp], 1.0, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(a)[oknp],
                               np.asarray(pv["alpha"][idx])[oknp],
                               rtol=1e-2, atol=1e-7)
    w = shift.mis_weight(pr, 1.0, ok=ok)
    np.testing.assert_allclose(np.asarray(w)[oknp], 0.5, rtol=1e-2)


def test_reconnection_is_involution():
    """Shift p -> p' then p' -> p: pdf ratios are reciprocal and the
    photon power round-trips — the unclamped-ratio involution VERDICT
    demanded a pin for."""
    scene, pv, idx = _photons()
    delta = jnp.asarray([0.013, -0.009, 0.011])
    new_p = pv["p"][idx] + delta
    a_f, pr_f, ok_f = shift.reconnect_photon(scene, pv, idx, new_p,
                                             target_is_volume=True)

    # build the shifted photon's caches: same parent, base direction /
    # scatter / pdf re-derived toward p'
    b = pv["parent_p"][idx]
    w_new = new_p - b
    w_new = w_new / jnp.linalg.norm(w_new, axis=-1, keepdims=True)
    sc_new, pdf_new, _ = shift.parent_scatter(
        scene, pv["parent_type"][idx], pv["parent_wi"][idx],
        pv["parent_ns"][idx], pv["parent_bsdf"][idx],
        pv["parent_med"][idx], w_new)
    pv2 = {k: (v[idx] if hasattr(v, "shape") and v.shape[:1] == pv["p"].shape[:1]
               else v) for k, v in pv.items()}
    pv2["p"] = new_p
    pv2["alpha"] = a_f
    pv2["scatter_base"] = sc_new
    pv2["pdf_dir_base"] = pdf_new
    idx2 = jnp.arange(idx.shape[0])
    a_b, pr_b, ok_b = shift.reconnect_photon(scene, pv2, idx2,
                                             pv["p"][idx],
                                             target_is_volume=True)
    ok = np.asarray(ok_f & ok_b)
    assert ok.any()
    np.testing.assert_allclose(np.asarray(pr_f * pr_b)[ok], 1.0,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(a_b)[ok],
                               np.asarray(pv["alpha"][idx])[ok],
                               rtol=1e-2, atol=1e-7)
