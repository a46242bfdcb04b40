"""RGB spectrum helpers (reference: src/libcore/spectrum.cpp, 3-channel mode).

A Spectrum is any array whose last axis has size 3. The reference's
compile-time SPECTRUM_SAMPLES is fixed to RGB here; full-spectral rendering
would change only this module.
"""

from __future__ import annotations

import jax.numpy as jnp

N_CHANNELS = 3


def luminance(s):
    """ITU-R Rec. BT.709 luminance (matches Spectrum::getLuminance)."""
    return s[..., 0] * 0.212671 + s[..., 1] * 0.715160 + s[..., 2] * 0.072169


def is_black(s, eps=0.0):
    return jnp.max(jnp.abs(s), axis=-1) <= eps

def average(s):
    return jnp.mean(s, axis=-1)


def max_value(s):
    return jnp.max(s, axis=-1)


def safe_div(a, b, eps=1e-20):
    """a / b with 0 where |b| is degenerate (pdf-ratio guard)."""
    return jnp.where(jnp.abs(b) > eps, a / jnp.where(b == 0, 1.0, b), 0.0)
