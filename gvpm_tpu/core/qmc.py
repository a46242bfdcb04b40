"""Quasi-Monte-Carlo sequences (radical inverse, Halton/Hammersley,
Sobol', scrambled (0,2)-sequences) and the sampler family built on them.

Re-designs the reference's QMC stack — `libcore/qmc.cpp` (radical
inverse / inverse permutations), `samplers/halton.cpp`,
`samplers/hammersley.cpp`, `samplers/sobol.cpp` (+ the 108k-line
generated `sobolseq.cpp` matrix table), `samplers/ldsampler.cpp` and
`samplers/stratified.cpp` — as branch-free bit arithmetic over int32
lanes: every generator is a pure function (dim, index, scramble) -> u in
[0,1), so a whole wavefront of sample indices evaluates in one fused VPU
pass, and per-pixel decorrelation is hash-based Owen scrambling
(Laine–Karras) instead of stored permutation tables.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# first 32 primes: bases of the Halton sequence (qmc.cpp primeBase)
PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
          59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
          127, 131)

_INV_2_32 = float(2.0 ** -32)


def _bits_to_unit(bits):
    """uint32 bits -> float32 in [0,1) (top 24 bits, exactly
    representable)."""
    return (bits >> jnp.uint32(8)).astype(jnp.float32) \
        * jnp.float32(2.0 ** -24)


def radical_inverse(base: int, i):
    """Radical inverse of integer index i in the given base
    (qmc.cpp radicalInverse). Vectorized over i; the digit loop is a
    static unroll of ceil(log_base(2^32)) iterations."""
    i = jnp.asarray(i, jnp.uint32)
    n_digits = int(np.ceil(32.0 / np.log2(base))) + 1
    inv_base = 1.0 / base
    value = jnp.zeros(i.shape, jnp.float32)
    inv = jnp.full(i.shape, inv_base, jnp.float32)
    for _ in range(n_digits):
        digit = (i % base).astype(jnp.float32)
        value = value + digit * inv
        inv = inv * inv_base
        i = i // base
    return jnp.minimum(value, 1.0 - 1e-7)


def reverse_bits32(v):
    v = jnp.asarray(v, jnp.uint32)
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    return (v >> 16) | (v << 16)


def _hash_u32(x):
    """Finalizer-style integer hash (decorrelation for scrambles)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def owen_scramble_bits(bits, seed):
    """Hash-based Owen (nested uniform) scrambling of reversed-bit values
    — Laine–Karras hash; statistically equivalent to tree scrambling.
    `bits` must already be bit-reversed (MSB = first digit)."""
    v = reverse_bits32(bits)
    s = jnp.asarray(seed, jnp.uint32)
    v = v + s
    v = v ^ (v * jnp.uint32(0x6C50B47C))
    v = v ^ (v * jnp.uint32(0xB82F1E52))
    v = v ^ (v * jnp.uint32(0xC7AFE638))
    v = v ^ (v * jnp.uint32(0x8D22F6E6))
    return reverse_bits32(v)


# --------------------------------------------------------------------------
# Sobol' direction numbers (Joe–Kuo D6) for the first 32 dimensions.
# Dimension 0 is van der Corput; higher dims generated at import from the
# primitive polynomial `a` and initial values `m` — replaces the
# reference's generated sobolseq.cpp table with 50 lines of setup.
# (degree, a, m...) per dimension, new-joe-kuo-6.21201 data.
_JOE_KUO = [
    (1, 0, (1,)),
    (2, 1, (1, 3)),
    (3, 1, (1, 3, 1)),
    (3, 2, (1, 1, 1)),
    (4, 1, (1, 1, 3, 3)),
    (4, 4, (1, 3, 5, 13)),
    (5, 2, (1, 1, 5, 5, 17)),
    (5, 4, (1, 1, 5, 5, 5)),
    (5, 7, (1, 1, 7, 11, 19)),
    (5, 11, (1, 1, 5, 1, 1)),
    (5, 13, (1, 1, 1, 3, 11)),
    (5, 14, (1, 3, 5, 5, 31)),
    (6, 1, (1, 3, 3, 9, 7, 49)),
    (6, 13, (1, 1, 1, 15, 21, 21)),
    (6, 16, (1, 3, 1, 13, 27, 49)),
    (6, 19, (1, 1, 1, 15, 7, 5)),
    (6, 22, (1, 3, 1, 15, 13, 25)),
    (6, 25, (1, 1, 5, 5, 19, 61)),
    (7, 1, (1, 3, 7, 11, 23, 15, 103)),
    (7, 4, (1, 3, 7, 13, 13, 15, 69)),
    (7, 7, (1, 1, 3, 13, 7, 35, 63)),
    (7, 8, (1, 3, 5, 9, 1, 25, 53)),
    (7, 14, (1, 3, 1, 13, 9, 35, 107)),
    (7, 19, (1, 3, 1, 5, 27, 61, 31)),
    (7, 21, (1, 1, 5, 11, 19, 41, 61)),
    (7, 28, (1, 3, 5, 3, 3, 13, 69)),
    (7, 31, (1, 1, 7, 13, 1, 19, 1)),
    (7, 32, (1, 3, 7, 5, 13, 19, 59)),
    (7, 37, (1, 1, 3, 9, 25, 29, 41)),
    (7, 41, (1, 3, 5, 13, 23, 1, 55)),
    (7, 42, (1, 3, 7, 3, 13, 59, 17)),
]


def _sobol_matrices(n_dims=32):
    """Direction-number matrix V[dim, bit] (uint32, MSB-aligned)."""
    V = np.zeros((n_dims, 32), np.uint64)
    V[0, :] = [1 << (31 - b) for b in range(32)]  # van der Corput
    for d in range(1, n_dims):
        s, a, m = _JOE_KUO[d - 1]
        v = np.zeros(32, np.uint64)
        for b in range(min(s, 32)):
            v[b] = np.uint64(m[b]) << np.uint64(31 - b)
        for b in range(s, 32):
            v[b] = v[b - s] ^ (v[b - s] >> np.uint64(s))
            for k in range(1, s):
                if (a >> (s - 1 - k)) & 1:
                    v[b] ^= v[b - k]
        V[d, :] = v
    return V.astype(np.uint32)


_SOBOL_V = jnp.asarray(_sobol_matrices())


def sobol_bits(dim, i):
    """Sobol' sample bits for dimension array `dim` and index array `i`
    (broadcast). Matrix-vector product over GF(2) as a 32-step unroll."""
    i = jnp.asarray(i, jnp.uint32)
    dim = jnp.asarray(dim, jnp.int32)
    res = jnp.zeros(jnp.broadcast_shapes(i.shape, dim.shape), jnp.uint32)
    Vd = _SOBOL_V[dim]           # [..., 32]
    for b in range(32):
        take = ((i >> jnp.uint32(b)) & jnp.uint32(1)).astype(bool)
        res = jnp.where(take, res ^ Vd[..., b], res)
    return res


def sobol(dim, i, scramble_seed=None):
    """Sobol' value in [0,1); optional per-lane Owen scrambling."""
    bits = sobol_bits(dim, i)
    if scramble_seed is not None:
        bits = owen_scramble_bits(bits, scramble_seed)
    return _bits_to_unit(bits)


def halton(dim, i, offset=0):
    """Halton sequence value: radical inverse in the dim-th prime base.
    dim must be a static int (< 32); offset shifts the sequence
    (Cranley–Patterson-free per-pixel decorrelation uses index offsets,
    as the reference's halton.cpp does)."""
    return radical_inverse(PRIMES[dim % len(PRIMES)], jnp.add(i, offset))


def hammersley(dim, i, n):
    """Hammersley point set of size n: first dim is i/n."""
    if dim == 0:
        return (jnp.asarray(i, jnp.float32) + 0.5) / n
    return halton(dim - 1, i)


def ld_2d(i, seed):
    """Scrambled (0,2)-sequence pair (ldsampler.cpp analog): Sobol'
    dims 0,1 with independent Owen scrambles per seed lane."""
    s0 = _hash_u32(jnp.asarray(seed, jnp.uint32))
    s1 = _hash_u32(s0 ^ jnp.uint32(0x9E3779B9))
    x = _bits_to_unit(owen_scramble_bits(sobol_bits(0, i), s0))
    y = _bits_to_unit(owen_scramble_bits(sobol_bits(1, i), s1))
    return jnp.stack([x, y], axis=-1)


def stratified_2d(key, index, n_total):
    """Stratified jittered 2D samples: index in [0, n_total) over an
    sx*sy grid with sx=ceil(sqrt(n)) (stratified.cpp analog)."""
    sx = int(np.ceil(np.sqrt(n_total)))
    sy = int(np.ceil(n_total / sx))
    ix = (index % sx).astype(jnp.float32)
    iy = (index // sx).astype(jnp.float32)
    u = jax.random.uniform(key, ix.shape + (2,))
    return jnp.stack([(ix + u[..., 0]) / sx, (iy + u[..., 1]) / sy],
                     axis=-1)


def pixel_samples(sampler: str, key, pixel_index, sample_index, spp):
    """Unified per-pixel 2D sample: the sampler surface the integrators
    consume for pixel antialiasing (independent | stratified | ld |
    halton | sobol | hammersley)."""
    if sampler == "independent":
        return jax.random.uniform(key, pixel_index.shape + (2,))
    if sampler == "stratified":
        k = jax.vmap(lambda p: jax.random.fold_in(key, p))(pixel_index)
        return jax.vmap(lambda kk, si: stratified_2d(kk, si, spp))(
            k, jnp.broadcast_to(sample_index, pixel_index.shape))
    if sampler == "ld":
        return ld_2d(sample_index, pixel_index)
    if sampler == "sobol":
        seed = _hash_u32(pixel_index.astype(jnp.uint32))
        x = sobol(jnp.zeros_like(pixel_index), sample_index, seed)
        y = sobol(jnp.ones_like(pixel_index), sample_index,
                  _hash_u32(seed ^ jnp.uint32(0x5BF03635)))
        return jnp.stack([x, y], axis=-1)
    if sampler == "halton":
        off = _hash_u32(pixel_index.astype(jnp.uint32)) >> jnp.uint32(8)
        return jnp.stack([halton(0, sample_index, off),
                          halton(1, sample_index, off)], axis=-1)
    if sampler == "hammersley":
        return jnp.stack(
            [hammersley(0, sample_index, spp),
             hammersley(1, jnp.broadcast_to(sample_index,
                                            pixel_index.shape), spp)],
            axis=-1)
    raise ValueError(f"unknown sampler '{sampler}'")
