"""ERPT: energy redistribution path tracing (Cline et al. 2005).

reference: src/integrators/erpt/{erpt.cpp,erpt_proc.cpp} — a stratified
path-tracing pass seeds many short Metropolis chains; each seed path of
luminance `lum` spawns on average `lum / (e_d * n_mutations)` chains that
redistribute its energy to nearby paths with *local* (small) mutations
only, depositing a fixed quantum e_d per mutation so the image equals the
PT estimate in expectation but with Metropolis-smoothed local structure.

TPU design: the reference mutates in path space (lens/caustic/multi-chain
perturbations, libbidir mut_*.cpp); here chains live in primary sample
space (the Kelemen small-step of pssmlt.py with p_large = 0) so one
wavefront advances every chain in lockstep through the same jitted
f(u) = volpath map. Chain seeding — "spawn floor(lum/(e_d k) + u) chains
per seed" — becomes a luminance-proportional categorical resample of the
stratified seed pool, which has identical expectation and a fixed chain
count (static shapes). Equal-deposition splatting keeps the per-mutation
quantum e_d = b / n_mutations of the paper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import VolPathConfig
from ..core.spectrum import luminance
from ..render import film
from ..scene.types import Scene
from .pssmlt import PSS_DIMS_PER_STEP, _f_eval, _mutate_small


@functools.partial(jax.jit, static_argnames=("cfg", "n_mutations"))
def _redistribute(scene: Scene, cfg: VolPathConfig, u0, e_d, n_mutations,
                  key):
    """Run equal-deposition chains from seed states u0.

    Each mutation deposits e_d worth of luminance split between current
    and proposed states (expected-value weighting), with the seed's
    chromaticity Y/lum (erpt_proc.cpp deposition analog)."""
    H, W = scene.height, scene.width
    n = u0.shape[0]
    Y0, px0, py0, lum0 = _f_eval(scene, cfg, u0)

    def step(carry, k):
        u, Y, px, py, lum, img = carry
        k_small, k_acc = jax.random.split(k)
        u_prop = _mutate_small(u, k_small)
        Yp, pxp, pyp, lump = _f_eval(scene, cfg, u_prop)
        a = jnp.clip(lump / jnp.maximum(lum, 1e-12), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, 0.0, a)
        # fixed-quantum deposition: e_d split by acceptance probability,
        # carrying each state's own chromaticity
        w_cur = e_d * (1.0 - a) / jnp.maximum(lum, 1e-12)
        w_prop = e_d * a / jnp.maximum(lump, 1e-12)
        img = film.splat(img, px, py, Y * w_cur[:, None], mask=lum > 0)
        img = film.splat(img, pxp, pyp, Yp * w_prop[:, None],
                         mask=lump > 0)
        acc = jax.random.uniform(k_acc, (n,)) < a
        u = jnp.where(acc[:, None], u_prop, u)
        Y = jnp.where(acc[:, None], Yp, Y)
        px = jnp.where(acc, pxp, px)
        py = jnp.where(acc, pyp, py)
        lum = jnp.where(acc, lump, lum)
        return (u, Y, px, py, lum, img), None

    img = film.new_film(H, W)
    keys = jax.random.split(key, n_mutations)
    (_, _, _, _, _, img), _ = lax.scan(
        step, (u0, Y0, px0, py0, lum0, img), keys)
    return img


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           n_chains=4096, n_mutations=32, seeds_per_pixel=1):
    """ERPT render; returns [H,W,3].

    Total redistributed energy is normalized so the image equals the
    seeding PT pass in expectation (erpt.cpp's e_d calibration)."""
    H, W = scene.height, scene.width
    n_steps = cfg.max_depth + cfg.null_bounces
    dim = 2 + n_steps * PSS_DIMS_PER_STEP
    k_seed, k_pick, k_run = jax.random.split(
        jax.random.key(seed ^ 0x45525054), 3)

    # stratified seed pass: seeds_per_pixel PT samples per pixel, pixel
    # position stratified over the film (the "PT pass" of the paper)
    n_seed = H * W * seeds_per_pixel
    u_seed = jax.random.uniform(k_seed, (n_seed, dim))
    pix = jnp.tile(jnp.arange(H * W, dtype=jnp.float32), seeds_per_pixel)
    strat_x = ((pix % W) + u_seed[:, 0]) / W
    strat_y = ((pix // W) + u_seed[:, 1]) / H
    u_seed = u_seed.at[:, 0].set(strat_x).at[:, 1].set(strat_y)

    _, _, _, lum_seed = jax.jit(lambda u: _f_eval(scene, cfg, u))(u_seed)
    b = float(jnp.mean(lum_seed))
    if b <= 0.0:
        return jnp.zeros((H, W, 3))

    # chain spawning ∝ seed luminance (same expectation as the paper's
    # stochastic floor(lum/(e_d k) + u) count, but a fixed chain total)
    idx = jax.random.categorical(
        k_pick, jnp.log(jnp.maximum(lum_seed, 1e-20)), shape=(n_chains,))
    u0 = u_seed[idx]

    # per-mutation quantum: the image is b * E_pi[Y/lum] in the chain
    # stationary distribution, so the n_chains * n_mutations deposits
    # must sum to b — same calibration as erpt.cpp's mean-energy e_d,
    # expressed for a fixed chain population
    e_d = b / (n_chains * n_mutations)
    img = _redistribute(scene, cfg, u0, e_d, n_mutations, k_run)
    return img
