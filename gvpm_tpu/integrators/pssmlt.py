"""Primary-sample-space Metropolis light transport (Kelemen-style).

reference: src/integrators/pssmlt/{pssmlt.cpp,pssmlt_sampler.cpp} — a
Markov chain over the unit hypercube of path-tracer random numbers with
small (exponential) / large (independent) mutations, expected-value
splatting of both current and proposed states, and a normalization
constant b estimated from large steps.

TPU design: the reference runs one chain per worker thread; here
N_CHAINS chains advance in lockstep — each mutation evaluates the
deterministic map f(u) (volpath.trace_radiance with u_explicit) for the
whole chain population in one wavefront, and both splats are batched
scatter-adds. Bootstrap resampling (luminance-weighted pick of initial
states) replaces the reference's per-thread seeding and removes startup
bias the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core import rng
from ..core.config import VolPathConfig
from ..core.spectrum import luminance
from ..render import film
from ..scene.camera import generate_rays
from ..scene.types import Scene
from .volpath import PSS_DIMS_PER_STEP, trace_radiance

# Kelemen mutation sizes (pssmlt_sampler.cpp defaults)
S1 = 1.0 / 1024.0
S2 = 1.0 / 64.0


def _f_eval(scene: Scene, cfg: VolPathConfig, u):
    """Deterministic map u in [0,1)^D -> (Y [N,3], px, py, lum [N]).

    Y = H*W * L so that E_large[Y * 1{pix=j}] / N = I_j."""
    H, W = scene.height, scene.width
    n = u.shape[0]
    n_steps = cfg.max_depth + cfg.null_bounces
    px = jnp.clip(u[:, 0], 0.0, 1.0 - 1e-6) * W
    py = jnp.clip(u[:, 1], 0.0, 1.0 - 1e-6) * H
    o, d, _ = generate_rays(scene, jnp.floor(px), jnp.floor(py),
                            jnp.stack([px - jnp.floor(px),
                                       py - jnp.floor(py)], axis=-1))
    ue = u[:, 2:].reshape(n, n_steps, PSS_DIMS_PER_STEP)
    L = trace_radiance(scene, cfg, o, d, scene.cam_medium,
                       jax.random.key(0), u_explicit=ue)
    Y = L * (H * W)
    return Y, px, py, jnp.maximum(luminance(Y), 0.0)


def _mutate_small(u, key):
    """Kelemen exponential mutation with wrap-around
    (pssmlt_sampler.cpp mutate())."""
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, u.shape)
    sign = jnp.where(jax.random.uniform(k2, u.shape) < 0.5, -1.0, 1.0)
    delta = S2 * jnp.exp(-jnp.log(S2 / S1) * r)
    v = u + sign * delta
    return v - jnp.floor(v)  # wrap to [0,1)


@functools.partial(jax.jit, static_argnames=("cfg", "n_mutations",
                                             "p_large"))
def _run_chains(scene: Scene, cfg: VolPathConfig, u0, n_mutations,
                p_large, key):
    """Advance all chains n_mutations steps, expected-value splatting."""
    H, W = scene.height, scene.width
    n = u0.shape[0]
    Y0, px0, py0, lum0 = _f_eval(scene, cfg, u0)

    def step(carry, k):
        u, Y, px, py, lum, img = carry
        k_sel, k_large, k_small, k_acc = jax.random.split(k, 4)
        large = jax.random.uniform(k_sel, (n,)) < p_large
        u_l = jax.random.uniform(k_large, u.shape)
        u_s = _mutate_small(u, k_small)
        u_prop = jnp.where(large[:, None], u_l, u_s)
        Yp, pxp, pyp, lump = _f_eval(scene, cfg, u_prop)
        a = jnp.clip(lump / jnp.maximum(lum, 1e-12), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, 1.0, a)
        # expected-value splats: current with (1-a)/lum, proposal a/lump
        w_cur = (1.0 - a) / jnp.maximum(lum, 1e-12)
        w_prop = a / jnp.maximum(lump, 1e-12)
        img = film.splat(img, px, py, Y * w_cur[:, None],
                         mask=lum > 0)
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
    (u, Y, px, py, lum, img), _ = lax.scan(
        step, (u0, Y0, px0, py0, lum0, img), keys)
    return img


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           n_chains=4096, n_mutations=64, p_large=0.3,
           bootstrap_factor=4):
    """PSSMLT render. Total samples = n_chains * n_mutations (+bootstrap).

    Returns [H,W,3]. The normalization b comes from the bootstrap large
    steps (pssmlt.cpp computeLuminance analog)."""
    H, W = scene.height, scene.width
    n_steps = cfg.max_depth + cfg.null_bounces
    dim = 2 + n_steps * PSS_DIMS_PER_STEP
    k_boot, k_pick, k_run = jax.random.split(
        jax.random.key(seed + 0x9E3779B9 % (1 << 30)), 3)

    # bootstrap: estimate b and draw initial states ~ luminance
    n_boot = bootstrap_factor * n_chains
    u_boot = jax.random.uniform(k_boot, (n_boot, dim))
    _, _, _, lum_boot = jax.jit(
        lambda u: _f_eval(scene, cfg, u))(u_boot)
    b = float(jnp.mean(lum_boot))
    if b <= 0.0:
        return jnp.zeros((H, W, 3))
    idx = jax.random.categorical(
        k_pick, jnp.log(jnp.maximum(lum_boot, 1e-20)), shape=(n_chains,))
    u0 = u_boot[idx]

    img = _run_chains(scene, cfg, u0, n_mutations, p_large, k_run)
    # each mutation deposits ~1 unit of (f/lum) mass per chain
    return img * (b / (n_chains * n_mutations))
