"""G-BDPT: gradient-domain bidirectional path tracing with media.

reference: src/integrators/gbdpt/ (GBDPTRenderer gbdpt_proc.cpp:48 —
base BDPT path per pixel + 4 offset paths by shifting the camera
subpath, hard-coded 4-neighbor set gbdpt_proc.cpp:103,276, per-strategy
Jacobians, Poisson reconstruction in gbdpt.cpp).

TPU design (round 1): the shift map is the IDENTITY IN PRIMARY SAMPLE
SPACE — the offset evaluation replays the exact same random sequence
(camera subpath randoms AND the shared light subpath) through the offset
pixel, so base and offset strategies are exchangeable: Jacobian 1,
symmetric weight 1/2, unbiased gradients without path-space MIS (same
trade as gpt.py; the reference's manifold-shift offset paths are the
variance-reduction upgrade path)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import VolPathConfig
from ..ops import poisson
from . import bdpt
from ..scene.types import Scene

OFFSETS = ((1, 0), (-1, 0), (0, 1), (0, -1))
RIGHT, LEFT, DOWN, UP = 0, 1, 2, 3


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_pass(scene: Scene, cfg: VolPathConfig, seed, it):
    """One spp of base + 4 offsets. Returns (primal, gx, gy) [H,W,3]."""
    from .gvpm import _reject_heterogeneous
    _reject_heterogeneous(scene)
    H, W = scene.height, scene.width
    n = H * W
    k = rng.pass_key(seed, it, rng.STREAM_CAMERA)
    py, px = jnp.mgrid[0:H, 0:W]
    px = px.reshape(-1).astype(jnp.float32)
    py = py.reshape(-1).astype(jnp.float32)

    base = bdpt.radiance(scene, cfg, px, py, k)
    Ls = [bdpt.radiance(scene, cfg, px + dx, py + dy, k)
          for dx, dy in OFFSETS]

    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    border = [xi == W - 1, xi == 0, yi == H - 1, yi == 0]

    S, Wb = [], []
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
           callback=None, recon_alpha=0.2, recon_l1=True,
           recon_iters=50):
    """Progressive G-BDPT: average primal/gradients, reconstruct."""
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
