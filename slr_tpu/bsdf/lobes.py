"""Per-kind BSDF lobe implementations, vectorized over hit batches.

Each reference BSDF class (libSLR/BSDFs/*) becomes a set of pure functions over
a `LobeBatch` — the SoA of per-hit, per-lobe parameters produced by evaluating
the material's textures at the hit points. Directions are in the shading frame
(z = shading normal), matching the reference's `dir_sn` convention
(directional_distribution_functions.h:111-120).

Conventions:
  wo: (..., 3) outgoing (toward viewer for radiance paths) in shading frame
  wi: (..., 3) incident/sampled direction in shading frame
  hero: (...,) int32 hero channel index (wlHint)
  front: (...,) bool, dot(wo, gN_sn) > 0
All "internal" functions exclude the shading-normal correction, which the
aggregate in bsdf.py applies once (reference BSDF::sample wrapper h:231-246).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..core.math3d import Array
from ..core.sampling import cosine_sample_hemisphere
from ..spectrum.rgb import importance
from .fresnel import fresnel_conductor, fresnel_dielectric
from ..scene.types import LobeKind


class LobeBatch(NamedTuple):
    """Per-lobe gathered parameters, any batch shape B.

    kind: (B,) int32 LobeKind
    s0/s1/s2: (B, S) spectrum slots (reflectance-coeff, eta/etaExt, k/etaInt)
    f0/f1: (B,) float slots (sigma / alpha_g / aniso)
    """

    kind: Array
    s0: Array
    s1: Array
    s2: Array
    f0: Array
    f1: Array


class SampleOut(NamedTuple):
    wi: Array            # (B, 3) sampled direction (shading frame)
    pdf: Array           # (B,)
    fs: Array            # (B, S) internal fs (no sn-correction)
    is_delta: Array      # (B,) bool
    is_transmission: Array  # (B,) bool (geometric transmission w.r.t. z)


_INV_PI = 1.0 / math.pi

# Kinds whose lobes scatter only by reflection (side-test matching).
REFLECTION_ONLY = (
    LobeKind.LAMBERT,
    LobeKind.OREN_NAYAR,
    LobeKind.SPECULAR_REFLECTION,
    LobeKind.MICROFACET_REFLECTION,
    LobeKind.WARD,
    LobeKind.ASHIKHMIN_SPECULAR,
    LobeKind.ASHIKHMIN_DIFFUSE,
)
DELTA_KINDS = (LobeKind.SPECULAR_REFLECTION, LobeKind.SPECULAR_SCATTERING)
DISPERSIVE_KINDS = (LobeKind.SPECULAR_SCATTERING,)


def _hero_take(values: Array, hero: Array) -> Array:
    """values: (B, S), hero: (B,) -> (B,)."""
    return jnp.take_along_axis(values, hero[..., None], axis=-1)[..., 0]


def _one_hot_hero(value_hero: Array, hero: Array, s: int) -> Array:
    """Place (B,) values into the hero channel of a zero (B, S) spectrum."""
    oh = jnp.arange(s)[None, :] == hero[..., None]
    return jnp.where(oh, value_hero[..., None], 0.0)


# ---------------------------------------------------------------------------
# Lambert (reference basic_BSDFs.cpp:12-57)
# ---------------------------------------------------------------------------

def lambert_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same_side = (wo[..., 2] * wi[..., 2]) > 0.0
    return jnp.where(same_side[..., None], lb.s0 * _INV_PI, 0.0)


def lambert_pdf(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same_side = (wo[..., 2] * wi[..., 2]) > 0.0
    return jnp.where(same_side, jnp.abs(wi[..., 2]) * _INV_PI, 0.0)


def lambert_weight(lb: LobeBatch, wo: Array, hero: Array) -> Array:
    return importance(lb.s0, hero)


def lambert_sample(lb: LobeBatch, wo: Array, front: Array, u0: Array,
                   u1: Array) -> SampleOut:
    d = cosine_sample_hemisphere(u0, u1)
    pdf = d[..., 2] * _INV_PI
    z = jnp.where(front, d[..., 2], -d[..., 2])
    wi = jnp.concatenate([d[..., :2], z[..., None]], axis=-1)
    fs = lb.s0 * _INV_PI
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=false_)


# ---------------------------------------------------------------------------
# Oren-Nayar (reference OrenNayerBRDF.cpp; reproduces its sin^2-as-sin quirk
# for parity: sinTheta terms are computed as 1 - z^2)
# ---------------------------------------------------------------------------

def _oren_nayar_factor(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    sigma = lb.f0
    sigma2 = sigma * sigma
    a = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    b = 0.45 * sigma2 / (sigma2 + 0.09)
    sin_ti = 1.0 - wi[..., 2] * wi[..., 2]
    sin_to = 1.0 - wo[..., 2] * wo[..., 2]
    abs_tan_ti = sin_ti / jnp.maximum(jnp.abs(wi[..., 2]), 1e-12)
    abs_tan_to = sin_to / jnp.maximum(jnp.abs(wo[..., 2]), 1e-12)
    sin_alpha = jnp.maximum(sin_ti, sin_to)
    tan_beta = jnp.minimum(abs_tan_ti, abs_tan_to)
    denom = sin_ti * sin_to
    cos_daz = jnp.where(
        denom > 1e-12,
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / jnp.maximum(denom, 1e-12),
        0.0,
    )
    return (a + b * jnp.maximum(0.0, cos_daz) * sin_alpha * tan_beta) * _INV_PI


def oren_nayar_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same_side = (wo[..., 2] * wi[..., 2]) > 0.0
    f = _oren_nayar_factor(lb, wo, wi)
    return jnp.where(same_side[..., None], lb.s0 * f[..., None], 0.0)


def oren_nayar_sample(lb: LobeBatch, wo: Array, front: Array, u0: Array,
                      u1: Array) -> SampleOut:
    d = cosine_sample_hemisphere(u0, u1)
    pdf = d[..., 2] * _INV_PI
    z = jnp.where(front, d[..., 2], -d[..., 2])
    wi = jnp.concatenate([d[..., :2], z[..., None]], axis=-1)
    fs = lb.s0 * _oren_nayar_factor(lb, wo, wi)[..., None]
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=false_)


# ---------------------------------------------------------------------------
# Specular reflection — conductor (reference basic_BSDFs.cpp:61-91)
# ---------------------------------------------------------------------------

def specular_reflection_weight(lb: LobeBatch, wo: Array, hero: Array) -> Array:
    f = fresnel_conductor(lb.s1, lb.s2, wo[..., 2])
    return importance(lb.s0 * f, hero)


def specular_reflection_sample(lb: LobeBatch, wo: Array) -> SampleOut:
    wi = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    pdf = jnp.ones(wo.shape[:-1], wo.dtype)
    f = fresnel_conductor(lb.s1, lb.s2, wo[..., 2])
    fs = lb.s0 * f / jnp.maximum(jnp.abs(wo[..., 2]), 1e-12)[..., None]
    true_ = jnp.ones(pdf.shape, bool)
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=true_,
                     is_transmission=false_)


# ---------------------------------------------------------------------------
# Specular scattering — dielectric glass (reference basic_BSDFs.cpp:95-169)
# ---------------------------------------------------------------------------

def specular_scattering_weight(lb: LobeBatch, wo: Array, hero: Array) -> Array:
    return importance(lb.s0, hero)


def specular_scattering_sample(
    lb: LobeBatch, wo: Array, hero: Array, u_comp: Array, adjoint: bool = False
) -> SampleOut:
    """One-sample reflect/refract pick by hero-channel Fresnel importance.

    Refraction collapses to the hero wavelength (dispersion): fs is nonzero
    only in the hero channel, exactly as the reference's SpecularBSDF
    (basic_BSDFs.cpp:133-147). The caller handles the dispersive PDF/flag.
    """
    s = lb.s0.shape[-1]
    cos_o = wo[..., 2]
    f_spec = fresnel_dielectric(lb.s1, lb.s2, cos_o)  # (B, S)
    reflect_prob = importance(f_spec, hero)
    do_reflect = u_comp < reflect_prob

    # Reflection branch.
    wi_r = jnp.stack([-wo[..., 0], -wo[..., 1], cos_o], axis=-1)
    pdf_r = reflect_prob
    fs_r = lb.s0 * f_spec / jnp.maximum(jnp.abs(cos_o), 1e-12)[..., None]

    # Refraction branch (hero wavelength only).
    entering = cos_o > 0.0
    eta_ext_h = _hero_take(lb.s1, hero)
    eta_int_h = _hero_take(lb.s2, hero)
    e_enter = jnp.where(entering, eta_ext_h, eta_int_h)
    e_exit = jnp.where(entering, eta_int_h, eta_ext_h)
    sin_enter2 = 1.0 - cos_o * cos_o
    rr_eta = e_enter / jnp.maximum(e_exit, 1e-12)
    sin_exit2 = rr_eta * rr_eta * sin_enter2
    tir = sin_exit2 >= 1.0
    cos_exit = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_exit2))
    cos_exit = jnp.where(entering, -cos_exit, cos_exit)
    wi_t = jnp.stack(
        [rr_eta * -wo[..., 0], rr_eta * -wo[..., 1], cos_exit], axis=-1
    )
    pdf_t = jnp.where(tir, 0.0, 1.0 - reflect_prob)
    coeff_h = _hero_take(lb.s0, hero)
    f_h = _hero_take(f_spec, hero)
    val_h = coeff_h * (1.0 - f_h)
    if not adjoint:
        # Radiance scaling under refraction (basic_BSDFs.cpp:144-145).
        val_h = val_h * (e_enter * e_enter) / jnp.maximum(e_exit * e_exit, 1e-12)
    fs_t = _one_hot_hero(
        val_h / jnp.maximum(jnp.abs(cos_exit), 1e-12), hero, s
    )
    fs_t = jnp.where(tir[..., None], 0.0, fs_t)

    wi = jnp.where(do_reflect[..., None], wi_r, wi_t)
    pdf = jnp.where(do_reflect, pdf_r, pdf_t)
    fs = jnp.where(do_reflect[..., None], fs_r, fs_t)
    # Degenerate grazing: cos == 0 on reflection -> kill.
    bad = jnp.logical_and(do_reflect, cos_o == 0.0)
    pdf = jnp.where(bad, 0.0, pdf)
    true_ = jnp.ones(pdf.shape, bool)
    return SampleOut(
        wi=wi,
        pdf=pdf,
        fs=fs,
        is_delta=true_,
        is_transmission=jnp.logical_not(do_reflect),
    )
