"""Counter-based, decision-enumerated random streams.

TPU-native replacement for the reference's stateful per-thread XORShift +
`IndependentLightPathSampler` (libSLR/Core/light_path_samplers.h:25-61,
libSLR/RNGs/XORShiftRNG.cpp). Instead of mutable RNG state, every random
number is a pure function of (seed, pixel, sample-index, bounce, decision):
deterministic, order-independent, and identical across any device sharding —
which a stateful RNG cannot provide (SURVEY.md §2.4).

The decision enumeration mirrors light_path_samplers.h:29-39 so every sampling
site in the renderer draws from its own independent stream.
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

from .math3d import Array


class Decision(enum.IntEnum):
    """One entry per random decision a path makes (cf. light_path_samplers.h)."""

    TIME = 0
    PIXEL_X = 1
    PIXEL_Y = 2
    WAVELENGTH = 3
    WL_SELECT = 4
    LENS_U = 5
    LENS_V = 6
    IDF_U = 7
    IDF_V = 8
    BSDF_COMPONENT = 9
    BSDF_U = 10
    BSDF_V = 11
    RR = 12
    LIGHT_SELECT = 13
    LIGHT_POS_U = 14
    LIGHT_POS_V = 15
    EDF_COMPONENT = 16
    EDF_U = 17
    EDF_V = 18
    _COUNT = 19


_GOLDEN64 = jnp.uint64 if False else None  # (uint64 unsupported on TPU; use 2x32)


def _hash32(x: Array) -> Array:
    """Strong 32-bit integer finalizer (murmur3-style avalanche)."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def uniform(
    seed: Array,
    pixel: Array,
    sample: Array,
    bounce: Array,
    decision: int | Array,
) -> Array:
    """One uniform float32 in [0, 1) per element of the broadcast shape.

    Philox-free hash counter: cheap (a handful of VPU int ops), with full
    avalanche over the 4-tuple. For rendering-quality stratification-free
    iid streams this matches the reference's XORShift statistically.
    """
    s = jnp.asarray(seed, jnp.uint32)
    p = jnp.asarray(pixel, jnp.uint32)
    n = jnp.asarray(sample, jnp.uint32)
    b = jnp.asarray(bounce, jnp.uint32)
    d = jnp.asarray(decision, jnp.uint32)
    h = _hash32(p * jnp.uint32(0x9E3779B9) + s)
    h = _hash32(h + n * jnp.uint32(0x85EBCA6B))
    h = _hash32(h + b * jnp.uint32(0xC2B2AE35) + d * jnp.uint32(0x27D4EB2F))
    # Top 24 bits -> [0,1) float32 (exactly representable).
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniform2(
    seed: Array, pixel: Array, sample: Array, bounce: Array, decision_u: int,
    decision_v: int,
) -> tuple[Array, Array]:
    return (
        uniform(seed, pixel, sample, bounce, decision_u),
        uniform(seed, pixel, sample, bounce, decision_v),
    )
