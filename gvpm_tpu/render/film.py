"""Film accumulation: masked scatter-add splatting.

The reference accumulates into per-block ImageBlocks with reconstruction-
filter borders (src/librender/imageblock.cpp) merged under locks. On TPU
the whole film is a dense [H,W,3] array and every splat is a batched
`scatter-add` — race-free by construction. A box filter matches the
reference's gather-point accumulation (gvpm uses per-pixel gather points,
i.e. box); tent/gaussian can be layered later via multi-tap splats.
"""

from __future__ import annotations

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


def relmse(img, ref, eps=1e-3):
    """Relative MSE as used by the reference's comparison scripts
    (scripts/results/msetools.py): mean((a-b)^2 / (ref^2 + eps))."""
    d = img - ref
    return float(jnp.mean(d * d / (ref * ref + eps)))
