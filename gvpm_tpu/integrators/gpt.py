"""G-PT: gradient-domain path tracing with participating media.

reference: integrators/gpt/gpt.cpp — per pixel, one base path + 4 offset
paths evaluated together (evaluatePoint gpt.cpp:393-441), gradients fed to
a screened-Poisson reconstruction (gpt.cpp:2684-2900) with the 5-buffer
MultiFilm layout (-final/-throughput/-dx/-dy/-direct, gpt.cpp:2713-2717).

TPU design (round 1): the shift map is the IDENTITY IN PRIMARY SAMPLE
SPACE — the offset path consumes the exact same random sequence through
the offset pixel. The Jacobian is 1 and the base/offset strategies are
exchangeable, so the symmetric weight is exactly 1/2 and

    E_u[ f_j(u) - f_i(u) ] = I_j - I_i

is unbiased without path-space MIS. This replaces the reference's
half-vector/reconnection shift state machine (gpt.cpp:502) with a shift
that vectorizes perfectly over the wavefront; path-space reconnection
shifts (lower variance at discontinuities) layer on later — the same
trade the reference exposes via its shift-type config.

Outputs the same buffer set: primal (throughput), dx, dy, direct, and the
L1/L2 reconstructions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import VolPathConfig
from ..ops import poisson
from ..scene.camera import generate_rays
from ..scene.types import Scene
from .volpath import trace_radiance

OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1))
RIGHT, LEFT, DOWN, UP = 0, 1, 2, 3


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_pass(scene: Scene, cfg: VolPathConfig, seed, it):
    """One spp of base + 4 offsets. Returns (primal, gx, gy) [H,W,3]."""
    H, W = scene.height, scene.width
    n = H * W
    key = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    k_pix, k_path = jax.random.split(key)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)
    u = jax.random.uniform(k_pix, (n, 2))

    # ONE wavefront of 5N lanes: base + 4 offsets share the trace (and
    # the per-lane random sequence repeats every N lanes => identical
    # primary samples across the 5 variants = the PSS identity shift)
    all_px = jnp.concatenate([px] + [px + dx for dx, dy in OFFSETS])
    all_py = jnp.concatenate([py] + [py + dy for dx, dy in OFFSETS])
    u5 = jnp.tile(u, (5, 1))
    o, d, _ = generate_rays(scene, all_px, all_py, u5)
    L = trace_radiance(scene, cfg, o, d, scene.cam_medium, k_path,
                       tile_rngs=5)
    L = L.reshape(5, n, 3)
    base = L[0]
    Ls = [L[1 + i] for i in range(4)]

    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    border = [xi == W - 1, xi == 0, yi == H - 1, yi == 0]

    S = []
    Wb = []
    for i in range(4):
        w = jnp.where(border[i], 1.0, 0.5)[..., None]
        S.append(w * Ls[i])
        Wb.append(w * base)

    def img(a):
        return a.reshape(H, W, 3)

    gx = img(S[RIGHT] - Wb[RIGHT])
    gx = gx.at[:, :-1].add(img(Wb[LEFT] - S[LEFT])[:, 1:])
    gy = img(S[DOWN] - Wb[DOWN])
    gy = gy.at[:-1, :].add(img(Wb[UP] - S[UP])[1:, :])
    return img(base), gx, gy


def render(scene: Scene, cfg: VolPathConfig = VolPathConfig(), seed=0,
           callback=None, recon_alpha=0.2, recon_l1=True, recon_iters=50):
    """Progressive G-PT: average primal/gradients over spp, reconstruct."""
    H, W = scene.height, scene.width
    acc = [jnp.zeros((H, W, 3)) for _ in range(3)]
    for it in range(cfg.spp):
        p, gx, gy = render_pass(scene, cfg, seed, it)
        acc = [acc[0] + p, acc[1] + gx, acc[2] + gy]
        if callback is not None:
            callback(it, acc[0] / (it + 1))
    primal, gx, gy = [a / cfg.spp for a in acc]
    recon = poisson.solve(primal, gx, gy, alpha=recon_alpha,
                          iters=recon_iters, l1=recon_l1)
    return dict(image=recon, primal=primal, gx=gx, gy=gy)
