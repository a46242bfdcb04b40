"""Metropolis light transport with structured (path-aware) mutations.

reference: src/integrators/mlt/mlt.cpp + src/libbidir/mut_lens.cpp,
mut_caustic.cpp, mut_mchain.cpp — Veach-style lens / caustic /
multi-chain perturbations over explicit paths, mixed with bidirectional
mutations.

TPU design: the reference mutates pointer-built paths one chain per
thread; here N_CHAINS lockstep chains mutate the primary sample vector
u with STRUCTURED kernels whose support mirrors the path-space
perturbations, and the deterministic map f(u) (volpath.trace_radiance)
re-traces the whole population in one wavefront:

  * lens perturbation — only the image-plane dims (u[0:2]) move, by an
    exponentially-distributed pixel-radius step (mut_lens.cpp:73-88's
    [r1, r2] ladder). All path dims are reused, so specular chains
    re-trace EXACTLY like the reference's lens walk, and diffuse
    vertices re-sample with identical randoms (the PSS analog of its
    reconnection).
  * chain (caustic/multi-chain) perturbation — the dims of ONE randomly
    chosen path step move by a small exponential step, everything else
    held; perturbing the bounce that feeds a specular chain is the PSS
    analog of mut_caustic.cpp's angular perturbation at the caustic
    generator.
  * small — Kelemen exponential over the full vector (the safety net
    that keeps the mixture ergodic on every scene).
  * large — independent restart (bidirectional-mutation analog +
    normalization source, like pssmlt).

Every kernel is symmetric in u, so the Metropolis acceptance is
min(1, lum'/lum); the mixture of symmetric kernels stays symmetric
(kernel choice is state-independent). Expected-value splatting and
luminance normalization follow pssmlt.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import VolPathConfig
from ..render import film
from ..scene.types import Scene
from .pssmlt import _f_eval, _mutate_small
from .volpath import PSS_DIMS_PER_STEP

# kernel mixture (mlt.cpp defaults give lens/caustic/mchain equal play)
P_LARGE = 0.2
P_LENS = 0.3
P_CHAIN = 0.3
# lens perturbation pixel-radius ladder (mut_lens.cpp r1/r2)
LENS_R1 = 0.1
LENS_R2_FRAC = 0.05
# chain perturbation scale (mut_caustic.cpp theta ladder, PSS analog)
CHAIN_S1 = 1.0 / 1024.0
CHAIN_S2 = 1.0 / 16.0


def _mutate_lens(u, key, width, height):
    """Perturb only the image dims by an exponential pixel radius."""
    k_r, k_phi = jax.random.split(key)
    r2 = LENS_R2_FRAC * width
    r = r2 * jnp.exp(-jnp.log(r2 / LENS_R1)
                     * jax.random.uniform(k_r, (u.shape[0],)))
    phi = 2.0 * jnp.pi * jax.random.uniform(k_phi, (u.shape[0],))
    dx = r * jnp.cos(phi) / width
    dy = r * jnp.sin(phi) / height
    ux = u[:, 0] + dx
    uy = u[:, 1] + dy
    ux = ux - jnp.floor(ux)
    uy = uy - jnp.floor(uy)
    return jnp.concatenate([ux[:, None], uy[:, None], u[:, 2:]], axis=1)


def _mutate_chain(u, key, n_steps):
    """Exponential perturbation of ONE path step's dims."""
    k_pick, k_r, k_sign = jax.random.split(key, 3)
    n, dim = u.shape
    step = jax.random.randint(k_pick, (n,), 0, n_steps)
    d_idx = jnp.arange(dim)[None, :]
    lo = 2 + step[:, None] * PSS_DIMS_PER_STEP
    in_block = (d_idx >= lo) & (d_idx < lo + PSS_DIMS_PER_STEP)
    r = jax.random.uniform(k_r, u.shape)
    sign = jnp.where(jax.random.uniform(k_sign, u.shape) < 0.5, -1.0, 1.0)
    delta = CHAIN_S2 * jnp.exp(-jnp.log(CHAIN_S2 / CHAIN_S1) * r)
    v = u + jnp.where(in_block, sign * delta, 0.0)
    return v - jnp.floor(v)


@functools.partial(jax.jit, static_argnames=("cfg", "n_mutations"))
def _run_chains(scene: Scene, cfg: VolPathConfig, u0, n_mutations, key):
    H, W = scene.height, scene.width
    n = u0.shape[0]
    n_steps = cfg.max_depth + cfg.null_bounces
    Y0, px0, py0, lum0 = _f_eval(scene, cfg, u0)

    def step(carry, k):
        u, Y, px, py, lum, img = carry
        k_sel, k_l, k_lens, k_chain, k_small, k_acc = \
            jax.random.split(k, 6)
        sel = jax.random.uniform(k_sel, (n,))
        u_l = jax.random.uniform(k_l, u.shape)
        u_lens = _mutate_lens(u, k_lens, W, H)
        u_chain = _mutate_chain(u, k_chain, n_steps)
        u_small = _mutate_small(u, k_small)
        u_prop = jnp.where(
            (sel < P_LARGE)[:, None], u_l,
            jnp.where((sel < P_LARGE + P_LENS)[:, None], u_lens,
                      jnp.where((sel < P_LARGE + P_LENS + P_CHAIN)[:, None],
                                u_chain, u_small)))
        Yp, pxp, pyp, lump = _f_eval(scene, cfg, u_prop)
        a = jnp.clip(lump / jnp.maximum(lum, 1e-12), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, 1.0, a)
        w_cur = (1.0 - a) / jnp.maximum(lum, 1e-12)
        w_prop = a / jnp.maximum(lump, 1e-12)
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
           n_chains=4096, n_mutations=64, bootstrap_factor=4):
    """MLT render (lens + chain + small + large kernel mixture).

    Returns [H,W,3]; normalization b from bootstrap (mlt.cpp's
    luminance pass)."""
    H, W = scene.height, scene.width
    n_steps = cfg.max_depth + cfg.null_bounces
    dim = 2 + n_steps * PSS_DIMS_PER_STEP
    k_boot, k_pick, k_run = jax.random.split(
        jax.random.key((seed + 0x51ED270) % (1 << 30)), 3)

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

    img = _run_chains(scene, cfg, u0, n_mutations, k_run)
    return img * (b / (n_chains * n_mutations))
