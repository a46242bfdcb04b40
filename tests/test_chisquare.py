"""Chi-square tests: sampled direction histograms vs analytic pdfs.

Re-creation of the reference's statistical validation layer
(src/tests/test_chisquare.cpp: test01_BSDF, test02_PhaseFunction) — bins
the sphere in (cos_theta, phi), compares sampling frequencies against the
pdf integrated per bin by Monte Carlo, and applies a chi-square criterion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvpm_tpu.core import warp
from gvpm_tpu.render.bsdf import eval_bsdf, sample_bsdf
from gvpm_tpu.render.phase import eval_phase, sample_phase
from gvpm_tpu.scene import SceneBuilder

N_SAMPLES = 200_000
N_COS, N_PHI = 10, 16


def _histogram(d, weights=None):
    cos_bin = jnp.clip(((d[:, 2] + 1.0) * 0.5 * N_COS).astype(jnp.int32),
                       0, N_COS - 1)
    phi = jnp.arctan2(d[:, 1], d[:, 0])
    phi_bin = jnp.clip(((phi / jnp.pi + 1.0) * 0.5 * N_PHI).astype(jnp.int32),
                       0, N_PHI - 1)
    idx = cos_bin * N_PHI + phi_bin
    w = jnp.ones(d.shape[0]) if weights is None else weights
    return jnp.zeros(N_COS * N_PHI).at[idx].add(w)


def _chi2_check(sample_fn, pdf_fn, seed=0, threshold=4.0, mass_tol=0.05):
    """sample_fn(key,n)->d [n,3] or (d, accept_mask); pdf_fn(d)->pdf.
    Rejected proposals (mask 0) count as zero, like the reference
    chi-square harness's failed-sample bucket (chisquare.h)."""
    key = jax.random.key(seed)
    d = sample_fn(key, N_SAMPLES)
    d, w = d if isinstance(d, tuple) else (d, None)
    counts = np.asarray(_histogram(d, weights=w))
    # expected counts: MC-integrate pdf per bin with uniform sphere samples
    u = jax.random.uniform(jax.random.key(seed + 99), (N_SAMPLES, 2))
    du = warp.square_to_uniform_sphere(u)
    pdf = pdf_fn(du)
    expected = np.asarray(_histogram(du, weights=pdf * 4.0 * jnp.pi))
    expected = expected / N_SAMPLES * N_SAMPLES  # per-bin expected counts
    mask = expected > 20
    chi2 = ((counts[mask] - expected[mask]) ** 2 / expected[mask]).mean()
    assert chi2 < threshold, f"chi2/bin={chi2:.2f}"
    # total mass agreement
    assert abs(counts.sum() / max(expected.sum(), 1) - 1.0) < mass_tol


def _one_bsdf_scene(kind, **kw):
    b = SceneBuilder()
    getattr(b, kind)(**kw)
    b.rectangle([0, 0, 0], [1, 0, 0], [0, 1, 0], 0)
    b.camera(origin=[0, 0, -1], target=[0, 0, 0])
    return b.build()


WI = jnp.array([0.3, -0.2, 0.933])
WI = WI / jnp.linalg.norm(WI)


@pytest.mark.parametrize("kind,kw", [
    ("diffuse", dict(albedo=[0.8, 0.8, 0.8])),
    ("rough_conductor", dict(alpha=0.3)),
    ("phong", dict(diffuse=(0.4, 0.4, 0.4), specular=(0.4, 0.4, 0.4),
                   exponent=20.0)),
    # looser chi2: the refraction lobe near cos=-1 is Snell-compressed,
    # so the uniform-sphere MC weights of the EXPECTED histogram are
    # heavy-tailed there (per-cos-band agreement is ~1-5%)
    ("rough_dielectric", dict(alpha=0.3, int_ior=1.5, _threshold=12.0)),
])
def test_bsdf_sampling_matches_pdf(kind, kw):
    kw = dict(kw)
    threshold = kw.pop("_threshold", 4.0)
    scene = _one_bsdf_scene(kind, **kw)
    bi = jnp.zeros((N_SAMPLES,), jnp.int32)

    def sample_fn(key, n):
        u3 = jax.random.uniform(key, (n, 3))
        wi = jnp.broadcast_to(WI, (n, 3))
        bs = sample_bsdf(scene, bi, wi, u3)
        # rejected proposals (weight 0) carry zero histogram mass
        return bs.wo, bs.valid.astype(jnp.float32)

    def pdf_fn(d):
        wi = jnp.broadcast_to(WI, (d.shape[0], 3))
        f, pdf = eval_bsdf(scene, bi[:d.shape[0]], wi, d)
        # a proposal at d is accepted iff f(d) > 0 (G/side rejections),
        # so the accepted-sample density is pdf * 1{f > 0}
        return pdf * (jnp.max(f, axis=-1) > 0.0)

    _chi2_check(sample_fn, pdf_fn, threshold=threshold, mass_tol=0.08)


@pytest.mark.parametrize("g,phase", [(0.0, "auto"), (0.5, "auto"),
                                     (-0.3, "auto"), (0.0, "rayleigh")])
def test_phase_sampling_matches_pdf(g, phase):
    b = SceneBuilder()
    m = b.homogeneous(sigma_a=[0.1] * 3, sigma_s=[1.0] * 3, g=g,
                      phase=phase)
    b.rectangle([0, 0, 0], [1, 0, 0], [0, 1, 0], b.diffuse([0.5] * 3))
    b.camera(origin=[0, 0, -1], target=[0, 0, 0])
    scene = b.build()
    mi = jnp.zeros((N_SAMPLES,), jnp.int32) + m
    wi = jnp.broadcast_to(WI, (N_SAMPLES, 3))

    def sample_fn(key, n):
        u2 = jax.random.uniform(key, (n, 2))
        wo, _ = sample_phase(scene, mi, wi, u2)
        return wo

    def pdf_fn(d):
        return eval_phase(scene, mi[:d.shape[0]],
                          jnp.broadcast_to(WI, d.shape), d)

    _chi2_check(sample_fn, pdf_fn)


def test_bsdf_sample_pdf_consistency():
    """pdf returned by sample() must equal eval()'s pdf at the sampled wo."""
    scene = _one_bsdf_scene("rough_conductor", alpha=0.25)
    n = 4096
    bi = jnp.zeros((n,), jnp.int32)
    u3 = jax.random.uniform(jax.random.key(5), (n, 3))
    wi = jnp.broadcast_to(WI, (n, 3))
    bs = sample_bsdf(scene, bi, wi, u3)
    _, pdf_eval = eval_bsdf(scene, bi, wi, bs.wo)
    m = np.asarray(bs.valid & (bs.pdf > 1e-3))
    a = np.asarray(bs.pdf)[m]
    b = np.asarray(pdf_eval)[m]
    np.testing.assert_allclose(a, b, rtol=2e-2)


def test_rough_dielectric_sample_pdf_consistency():
    """Walter-model sample() pdf vs eval() pdf, both lobes
    (roughdielectric.cpp sample/pdf agreement)."""
    scene = _one_bsdf_scene("rough_dielectric", alpha=0.3, int_ior=1.5)
    n = 8192
    bi = jnp.zeros((n,), jnp.int32)
    u3 = jax.random.uniform(jax.random.key(7), (n, 3))
    wi = jnp.broadcast_to(WI, (n, 3))
    bs = sample_bsdf(scene, bi, wi, u3)
    _, pdf_eval = eval_bsdf(scene, bi, wi, bs.wo)
    m = np.asarray(bs.valid & (bs.pdf > 1e-2))
    assert m.sum() > n // 2
    np.testing.assert_allclose(np.asarray(bs.pdf)[m],
                               np.asarray(pdf_eval)[m], rtol=3e-2)
    # both lobes exercised
    co = np.asarray(bs.wo[:, 2])[np.asarray(bs.valid)]
    assert (co > 0).any() and (co < 0).any()


def test_diffuse_white_furnace():
    """E[weight] over sampled lobes == albedo for a diffuse BSDF."""
    scene = _one_bsdf_scene("diffuse", albedo=[0.6, 0.7, 0.8])
    n = 100_000
    bi = jnp.zeros((n,), jnp.int32)
    u3 = jax.random.uniform(jax.random.key(6), (n, 3))
    wi = jnp.broadcast_to(WI, (n, 3))
    bs = sample_bsdf(scene, bi, wi, u3)
    mean_w = np.asarray(jnp.mean(bs.weight, axis=0))
    np.testing.assert_allclose(mean_w, [0.6, 0.7, 0.8], rtol=1e-2)
