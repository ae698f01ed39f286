"""Fresnel reflectance, vectorized over wavefronts and spectral channels.

Reference: libSLR/Core/directional_distribution_functions.cpp:61-160
(FresnelNoOp / FresnelConductor / FresnelDielectric).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math3d import Array


def fresnel_conductor(eta: Array, k: Array, cos_enter: Array) -> Array:
    """Conductor Fresnel (reference cpp:69-78). eta/k: (..., S); cos: (...)."""
    c = jnp.abs(cos_enter)[..., None]
    c2 = c * c
    two_eta_c = 2.0 * eta * c
    tmp_f = eta * eta + k * k
    tmp = tmp_f * c2
    rparl2 = (tmp - two_eta_c + 1.0) / (tmp + two_eta_c + 1.0)
    rperp2 = (tmp_f - two_eta_c + c2) / (tmp_f + two_eta_c + c2)
    return 0.5 * (rparl2 + rperp2)


def _eval_f(eta_enter: Array, eta_exit: Array, cos_enter: Array,
            cos_exit: Array) -> Array:
    """Dielectric Fresnel for given entry/exit cosines (reference evalF :155-160)."""
    rparl = (eta_exit * cos_enter - eta_enter * cos_exit) / (
        eta_exit * cos_enter + eta_enter * cos_exit
    )
    rperp = (eta_enter * cos_enter - eta_exit * cos_exit) / (
        eta_enter * cos_enter + eta_exit * cos_exit
    )
    return 0.5 * (rparl * rparl + rperp * rperp)


def fresnel_dielectric(eta_ext: Array, eta_int: Array, cos_enter: Array) -> Array:
    """Dielectric Fresnel; signed cos selects entering/exiting
    (reference cpp:92-110). eta_*: (..., S); cos: (...). Returns (..., S)."""
    cos = jnp.clip(cos_enter, -1.0, 1.0)[..., None]
    entering = cos > 0.0
    e_enter = jnp.where(entering, eta_ext, eta_int)
    e_exit = jnp.where(entering, eta_int, eta_ext)
    sin_exit = e_enter / e_exit * jnp.sqrt(jnp.maximum(0.0, 1.0 - cos * cos))
    cos_abs = jnp.abs(cos)
    tir = sin_exit >= 1.0
    cos_exit = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_exit * sin_exit))
    f = _eval_f(e_enter, e_exit, cos_abs, cos_exit)
    return jnp.where(tir, 1.0, f)
