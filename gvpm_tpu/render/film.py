"""Film accumulation: masked scatter-add splatting + reconstruction
filters.

The reference accumulates into per-block ImageBlocks with reconstruction-
filter borders (src/librender/imageblock.cpp) merged under locks; filters
live in src/rfilters/{box,tent,gaussian,mitchell,catmullrom,lanczos}.cpp.
On TPU the whole film is a dense [H,W,3] array and every splat is a
batched `scatter-add` — race-free by construction. Filtered splats are a
static (2R)^2-tap stencil per sample with a separate weight plane for
normalization (the ImageBlock weight channel)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def splat(image, px, py, value, mask=None):
    """Accumulate value [N,3] at pixel centers (px, py) floats; box filter."""
    H, W = image.shape[0], image.shape[1]
    xi = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, H - 1)
    ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    if mask is not None:
        ok = ok & mask
    v = jnp.where(ok[..., None], value, 0.0)
    return image.at[yi, xi].add(v, mode="drop")


def splat_pixel(image, pix_x, pix_y, value, mask=None):
    """Accumulate at integer pixel coords (already per-pixel buffers)."""
    H, W = image.shape[0], image.shape[1]
    ok = (pix_x >= 0) & (pix_x < W) & (pix_y >= 0) & (pix_y < H)
    if mask is not None:
        ok = ok & mask
    v = jnp.where(ok[..., None], value, 0.0)
    return image.at[jnp.clip(pix_y, 0, H - 1),
                    jnp.clip(pix_x, 0, W - 1)].add(v, mode="drop")


def new_film(height, width, channels=3):
    return jnp.zeros((height, width, channels), jnp.float32)


# --------------------------------------------------------------------------
# reconstruction filters (src/rfilters/*)

# filter name -> (radius in pixels, weight fn of |x| <= radius)
def _gaussian(x, stddev=0.5, radius=2.0):
    a = jnp.exp(-0.5 * (x / stddev) ** 2)
    b = np.exp(-0.5 * (radius / stddev) ** 2)
    return jnp.maximum(a - b, 0.0)


def _tent(x, radius=1.0):
    return jnp.maximum(1.0 - jnp.abs(x) / radius, 0.0)


def _mitchell_1d(x, B, C):
    x = jnp.abs(x)
    x2, x3 = x * x, x * x * x
    inner = ((12 - 9 * B - 6 * C) * x3 + (-18 + 12 * B + 6 * C) * x2
             + (6 - 2 * B)) / 6.0
    outer = ((-B - 6 * C) * x3 + (6 * B + 30 * C) * x2
             + (-12 * B - 48 * C) * x + (8 * B + 24 * C)) / 6.0
    return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))


def _lanczos(x, tau=3.0):
    x = jnp.abs(x)
    px = jnp.pi * jnp.maximum(x, 1e-6)
    val = (jnp.sin(px) / px) * (jnp.sin(px / tau) / (px / tau))
    return jnp.where(x < 1e-6, 1.0, jnp.where(x < tau, val, 0.0))


FILTERS = {
    "box": (0.5, lambda x: jnp.where(jnp.abs(x) <= 0.5, 1.0, 0.0)),
    "tent": (1.0, _tent),
    "gaussian": (2.0, _gaussian),
    "mitchell": (2.0, lambda x: _mitchell_1d(x, 1 / 3, 1 / 3)),
    "catmullrom": (2.0, lambda x: _mitchell_1d(x, 0.0, 0.5)),
    "lanczos": (3.0, _lanczos),
}


def splat_filtered(image, wsum, px, py, value, rfilter="gaussian",
                   mask=None):
    """Filtered splat at continuous film positions (px, py).

    image: [H,W,3]; wsum: [H,W] filter-weight accumulator. Returns
    (image, wsum). Final image = image / max(wsum, eps)[..., None].
    Separable 2D filter evaluated on a static (2R)^2 tap stencil.
    """
    radius, fw = FILTERS[rfilter]
    H, W = image.shape[0], image.shape[1]
    r_int = int(np.ceil(radius - 0.5))
    ok = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    if mask is not None:
        ok = ok & mask
    xi0 = jnp.floor(px - 0.5).astype(jnp.int32)
    yi0 = jnp.floor(py - 0.5).astype(jnp.int32)
    for oy in range(-r_int, r_int + 1):
        for ox in range(-r_int, r_int + 1):
            xt = xi0 + ox
            yt = yi0 + oy
            wx = fw(xt.astype(jnp.float32) + 0.5 - px)
            wy = fw(yt.astype(jnp.float32) + 0.5 - py)
            w = wx * wy
            inb = ok & (xt >= 0) & (xt < W) & (yt >= 0) & (yt < H)
            w = jnp.where(inb, w, 0.0)
            image = image.at[jnp.clip(yt, 0, H - 1),
                             jnp.clip(xt, 0, W - 1)].add(
                w[..., None] * value, mode="drop")
            wsum = wsum.at[jnp.clip(yt, 0, H - 1),
                           jnp.clip(xt, 0, W - 1)].add(w, mode="drop")
    return image, wsum


def develop_filtered(image, wsum, eps=1e-8):
    return image / jnp.maximum(wsum, eps)[..., None]


def relmse(img, ref, eps=1e-3):
    """Relative MSE as used by the reference's comparison scripts
    (scripts/results/msetools.py): mean((a-b)^2 / (ref^2 + eps))."""
    d = img - ref
    return float(jnp.mean(d * d / (ref * ref + eps)))
