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
from flax import struct

from ..core.math3d import Array, dot, normalize
from ..core.sampling import cosine_sample_hemisphere
from ..spectrum.rgb import importance
from .fresnel import fresnel_conductor, fresnel_dielectric
from ..scene.types import LobeKind


class LobeBatch(struct.PyTreeNode):
    """Per-lobe gathered parameters, any batch shape B.

    kind: (B,) int32 LobeKind
    s0/s1/s2: (B, S) spectrum slots (reflectance-coeff, eta/etaExt, k/etaInt)
    f0/f1: (B,) float slots (sigma / alpha_g / aniso)
    kinds: STATIC set of LobeKind ints that can occur in this batch;
    None = unknown/all. The dispatchers in bsdf.py skip compiling absent
    kinds entirely — the analogue of the reference only constructing the
    BSDF closures a material actually owns. Static metadata (not a pytree
    leaf), so a LobeBatch crossing a jit boundary keeps it a plain tuple.
    """

    kind: Array
    s0: Array
    s1: Array
    s2: Array
    f0: Array
    f1: Array
    kinds: tuple = struct.field(pytree_node=False, default=None)


class SampleOut(NamedTuple):
    wi: Array            # (B, 3) sampled direction (shading frame)
    pdf: Array           # (B,)
    fs: Array            # (B, S) internal fs (no sn-correction)
    is_delta: Array      # (B,) bool
    is_transmission: Array  # (B,) bool (geometric transmission w.r.t. z)
    # Reverse-direction info for DELTA lobes only (the reference's
    # BSDFReverseInfo, directional_distribution_functions.h:142-150): the
    # branch pdf and fs of sampling wo from wi. BPT's MIS ratio walk needs
    # these nonzero at delta vertices — bsdf_pdf/evaluate of a delta
    # direction are 0 by definition, and zeros would silently drop every
    # competing-strategy term beyond a specular vertex. None for
    # finite lobes (callers use the generic evaluators there).
    rev_pdf: Array = None   # (B,) reverse branch pdf
    rev_fs: Array = None    # (B, S) reverse internal fs


_INV_PI = 1.0 / math.pi

# Kinds whose lobes scatter only by reflection (side-test matching).
# FLIPPED_LAMBERT is the InverseBSDF(Lambert) — it scatters only into the
# OPPOSITE hemisphere, so it sides with the transmission group.
REFLECTION_ONLY = (
    LobeKind.LAMBERT,
    LobeKind.OREN_NAYAR,
    LobeKind.SPECULAR_REFLECTION,
    LobeKind.MICROFACET_REFLECTION,
    LobeKind.WARD,
    LobeKind.ASHIKHMIN,
)
DELTA_KINDS = (LobeKind.SPECULAR_REFLECTION, LobeKind.SPECULAR_SCATTERING)
DISPERSIVE_KINDS = (LobeKind.SPECULAR_SCATTERING,)


def _hero_take(values: Array, hero: Array) -> Array:
    """values: (B, S), hero: (B,) -> (B,). One-hot contraction — per-lane
    take_along_axis lowers to the TPU scalar core (~0.25 ms per 49k lanes)."""
    oh = jnp.arange(values.shape[-1], dtype=hero.dtype) == hero[..., None]
    return jnp.sum(jnp.where(oh, values, 0.0), axis=-1)


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
# Flipped Lambert — InverseBSDF(LambertianBRDF) (basic_BSDFs.cpp:173-207):
# the base BSDF queried with wi.z negated, i.e. diffuse scattering into the
# hemisphere OPPOSITE wo. Used by createSurfaceMaterial("inverse", ...) for
# back-face diffuse transmission (the sum(matte, inverse(matte)) idiom).
# ---------------------------------------------------------------------------

def flipped_lambert_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    opposite = (wo[..., 2] * wi[..., 2]) < 0.0
    return jnp.where(opposite[..., None], lb.s0 * _INV_PI, 0.0)


def flipped_lambert_pdf(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    opposite = (wo[..., 2] * wi[..., 2]) < 0.0
    return jnp.where(opposite, jnp.abs(wi[..., 2]) * _INV_PI, 0.0)


def flipped_lambert_sample(lb: LobeBatch, wo: Array, front: Array, u0: Array,
                           u1: Array) -> SampleOut:
    d = cosine_sample_hemisphere(u0, u1)
    pdf = d[..., 2] * _INV_PI
    # Into the hemisphere opposite wo (base sample's wi.z sign-flipped).
    z = jnp.where(front, -d[..., 2], d[..., 2])
    wi = jnp.concatenate([d[..., :2], z[..., None]], axis=-1)
    fs = lb.s0 * _INV_PI
    false_ = jnp.zeros(pdf.shape, bool)
    true_ = jnp.ones(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=true_)


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
    # Mirror reflection is symmetric: |cos wi| = |cos wo| and the Fresnel
    # term is shared, so the reverse branch equals the forward one.
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=true_,
                     is_transmission=false_, rev_pdf=pdf, rev_fs=fs)


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

    # Reverse branch (BSDFReverseInfo): Fresnel reciprocity makes the
    # reverse branch probability equal the forward one for both branches;
    # the reverse transmission VALUE swaps the eta^2 radiance scale (it is
    # the opposite transport kind — adjoint carries no scale,
    # basic_BSDFs.cpp:144-149) and divides by |cos wo| instead of
    # |cos_exit|. Mirror-branch reverse equals forward.
    val_rev_h = coeff_h * (1.0 - f_h)
    if adjoint:
        # Forward was importance transport -> reverse is RADIANCE transport
        # entering from the exit side: scale (e_exit/e_enter)^2.
        val_rev_h = val_rev_h * (e_exit * e_exit) / jnp.maximum(
            e_enter * e_enter, 1e-12
        )
    fs_t_rev = _one_hot_hero(
        val_rev_h / jnp.maximum(jnp.abs(cos_o), 1e-12), hero, s
    )
    fs_t_rev = jnp.where(tir[..., None], 0.0, fs_t_rev)
    rev_pdf = jnp.where(bad, 0.0, pdf)
    rev_fs = jnp.where(do_reflect[..., None], fs_r, fs_t_rev)
    return SampleOut(
        wi=wi,
        pdf=pdf,
        fs=fs,
        is_delta=true_,
        is_transmission=jnp.logical_not(do_reflect),
        rev_pdf=rev_pdf,
        rev_fs=rev_fs,
    )


# ---------------------------------------------------------------------------
# GGX microfacet distribution with visible-normal sampling
# (reference directional_distribution_functions.cpp:163-274, Heitz2014)
# ---------------------------------------------------------------------------

def ggx_D(alpha: Array, m: Array) -> Array:
    """GGX NDF (cpp:178-186): alpha^2/(pi cos^4 (alpha^2 + tan^2)^2), 0 below."""
    cos2 = m[..., 2] * m[..., 2]
    tan2 = (1.0 - cos2) / jnp.maximum(cos2, 1e-12)
    a2 = alpha * alpha
    d = a2 / (jnp.pi * jnp.maximum(cos2 * cos2, 1e-16) * (a2 + tan2) ** 2)
    return jnp.where(m[..., 2] > 0, d, 0.0)


def ggx_smith_g1(alpha: Array, v: Array, m: Array) -> Array:
    """Smith masking G1 (cpp:266-270)."""
    chi = (dot(v, m) / jnp.where(v[..., 2] == 0, 1e-12, v[..., 2])) > 0
    cos_v = jnp.clip(v[..., 2], -1.0, 1.0)
    tan2_v = (1.0 - cos_v * cos_v) / jnp.maximum(cos_v * cos_v, 1e-12)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2_v))
    return jnp.where(chi, g, 0.0)


def ggx_sample_vndf(alpha: Array, v: Array, u0: Array, u1: Array
                    ) -> tuple[Array, Array]:
    """Sample the distribution of visible normals (cpp:191-258, Heitz2014
    slope-space method). v must have v.z > 0. Returns (m, pdf)."""
    # stretch
    sv = jnp.stack([alpha * v[..., 0], alpha * v[..., 1], v[..., 2]], axis=-1)
    sv = normalize(sv)
    theta = jnp.arccos(jnp.clip(sv[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(sv[..., 1], sv[..., 0])
    near_normal = sv[..., 2] > 0.99999
    theta = jnp.where(near_normal, 0.0, theta)
    phi = jnp.where(near_normal, 0.0, phi)

    # normal-incidence branch
    r_ni = jnp.sqrt(u0 / jnp.maximum(1.0 - u0, 1e-12))
    phi_ni = 2.0 * jnp.pi * u1
    sx_ni = r_ni * jnp.cos(phi_ni)
    sy_ni = r_ni * jnp.sin(phi_ni)

    # general branch (theta >= 0.0001)
    tan_ti = jnp.tan(jnp.maximum(theta, 1e-4))
    a = 1.0 / tan_ti
    g1 = 2.0 / (1.0 + jnp.sqrt(1.0 + 1.0 / jnp.maximum(a * a, 1e-20)))
    A = 2.0 * u0 / jnp.maximum(g1, 1e-12) - 1.0
    tmp = 1.0 / jnp.where(jnp.abs(A * A - 1.0) < 1e-12, 1e-12, A * A - 1.0)
    B = tan_ti
    disc = jnp.maximum(B * B * tmp * tmp - (A * A - B * B) * tmp, 0.0)
    d_root = jnp.sqrt(disc)
    sx1 = B * tmp - d_root
    sx2 = B * tmp + d_root
    sx_g = jnp.where((A < 0) | (sx2 > 1.0 / tan_ti), sx1, sx2)
    sx_g = jnp.where(u0 == 0.0, 0.0, sx_g)
    s_sign = jnp.where(u1 > 0.5, 1.0, -1.0)
    u1m = jnp.where(u1 > 0.5, 2.0 * (u1 - 0.5), 2.0 * (0.5 - u1))
    z = (u1m * (u1m * (u1m * 0.27385 - 0.73369) + 0.46341)) / (
        u1m * (u1m * (u1m * 0.093073 + 0.309420) - 1.0) + 0.597999
    )
    sy_g = s_sign * z * jnp.sqrt(1.0 + sx_g * sx_g)

    use_ni = theta < 1e-4
    slope_x = jnp.where(use_ni, sx_ni, sx_g)
    slope_y = jnp.where(use_ni, sy_ni, sy_g)

    # rotate + unstretch
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    rx = cphi * slope_x - sphi * slope_y
    ry = sphi * slope_x + cphi * slope_y
    rx = rx * alpha
    ry = ry * alpha
    m = jnp.stack([-rx, -ry, jnp.ones_like(rx)], axis=-1)
    m = normalize(m)
    d = ggx_D(alpha, m)
    pdf = ggx_smith_g1(alpha, v, m) * jnp.abs(dot(v, m)) * d / jnp.maximum(
        jnp.abs(v[..., 2]), 1e-12
    )
    return m, pdf


def ggx_vndf_pdf(alpha: Array, v: Array, m: Array) -> Array:
    return ggx_smith_g1(alpha, v, m) * jnp.abs(dot(v, m)) * ggx_D(
        alpha, m
    ) / jnp.maximum(jnp.abs(v[..., 2]), 1e-12)


def _half_vector(a: Array, b: Array) -> Array:
    h = a + b
    return h / jnp.maximum(jnp.sqrt(dot(h, h))[..., None], 1e-12)


# ---------------------------------------------------------------------------
# Microfacet BRDF — conductor (reference MicrofacetBSDF.cpp:11-110)
# ---------------------------------------------------------------------------

def microfacet_reflection_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    alpha = lb.f0
    same = wi[..., 2] * wo[..., 2] > 0
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    m = sign[..., None] * _half_vector(wo, wi)
    dot_hv = dot(wo, m)
    d = ggx_D(alpha, m)
    f = fresnel_conductor(lb.s1, lb.s2, dot_hv)
    g = ggx_smith_g1(alpha, wo, m) * ggx_smith_g1(alpha, wi, m)
    fs = f * (d * g / jnp.maximum(4.0 * jnp.abs(wo[..., 2] * wi[..., 2]), 1e-12))[..., None]
    return jnp.where(same[..., None], fs, 0.0)


def microfacet_reflection_pdf(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    alpha = lb.f0
    same = wi[..., 2] * wo[..., 2] > 0
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    m = sign[..., None] * _half_vector(wo, wi)
    dot_hv = dot(wo, m)
    ok = same & (dot_hv * sign > 0)
    mpdf = ggx_vndf_pdf(alpha, sign[..., None] * wo, m)
    pdf = mpdf / jnp.maximum(4.0 * dot_hv * sign, 1e-12)
    return jnp.where(ok, pdf, 0.0)


def microfacet_reflection_weight(lb: LobeBatch, wo: Array, hero: Array) -> Array:
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    z = jnp.zeros_like(wo)
    z = z.at[..., 2].set(1.0)
    return ggx_smith_g1(lb.f0, wo * sign[..., None], z)


def microfacet_reflection_sample(lb: LobeBatch, wo: Array, u0: Array,
                                 u1: Array) -> SampleOut:
    alpha = lb.f0
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    m, mpdf = ggx_sample_vndf(alpha, sign[..., None] * wo, u0, u1)
    dot_hv = dot(wo, m)
    wi = 2.0 * dot_hv[..., None] * m - wo
    ok = (dot_hv * sign > 0) & (wi[..., 2] * wo[..., 2] > 0)
    pdf = mpdf / jnp.maximum(4.0 * dot_hv * sign, 1e-12)
    fs = microfacet_reflection_eval(lb, wo, wi)
    pdf = jnp.where(ok, pdf, 0.0)
    fs = jnp.where(ok[..., None], fs, 0.0)
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=false_)


# ---------------------------------------------------------------------------
# Microfacet BSDF — rough dielectric (reference MicrofacetBSDF.cpp:113-305)
# ---------------------------------------------------------------------------

def _micro_scatter_trans_fs(lb: LobeBatch, wo: Array, wi: Array,
                            adjoint: bool = False) -> Array:
    """Per-wavelength transmission fs with per-channel half vectors
    (MicrofacetBSDF.cpp:174-187 / :226-239)."""
    alpha = lb.f0[..., None]
    entering = (wo[..., 2] >= 0)[..., None]
    e_enter = jnp.where(entering, lb.s1, lb.s2)  # (B, S)
    e_exit = jnp.where(entering, lb.s2, lb.s1)
    # m_wl = normalize(-(eEnter*wo + eExit*wi)) per channel: (B, S, 3)
    m = -(e_enter[..., None] * wo[..., None, :] + e_exit[..., None] * wi[..., None, :])
    m = m / jnp.maximum(jnp.sqrt(dot(m, m))[..., None], 1e-12)
    dot_hv = dot(wo[..., None, :], m)  # (B, S)
    dot_hl = dot(wi[..., None, :], m)
    f = _fresnel_dielectric_scalar(e_enter, e_exit, dot_hv)
    g = (
        ggx_smith_g1(alpha, wo[..., None, :], m)
        * ggx_smith_g1(alpha, wi[..., None, :], m)
    )
    d = ggx_D(alpha, m)
    denom = (e_enter * dot_hv + e_exit * dot_hl) ** 2
    val = jnp.abs(dot_hv * dot_hl) * (1.0 - f) * g * d / jnp.maximum(denom, 1e-12)
    val = val / jnp.maximum(jnp.abs(wo[..., 2] * wi[..., 2]), 1e-12)[..., None]
    scale = (e_exit * e_exit) if adjoint else (e_enter * e_enter)
    return val * scale


def _fresnel_dielectric_scalar(e_enter: Array, e_exit: Array, cos_enter: Array
                               ) -> Array:
    """Channel-wise dielectric Fresnel where eta pairs are already selected
    for the propagation side (all shapes broadcast together)."""
    cos = jnp.clip(cos_enter, -1.0, 1.0)
    sin_exit = e_enter / jnp.maximum(e_exit, 1e-12) * jnp.sqrt(
        jnp.maximum(0.0, 1.0 - cos * cos)
    )
    cos_abs = jnp.abs(cos)
    tir = sin_exit >= 1.0
    cos_exit = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_exit * sin_exit))
    f = _eval_f_scalar(e_enter, e_exit, cos_abs, cos_exit)
    return jnp.where(tir, 1.0, f)


def _eval_f_scalar(ee, ex, ci, co):
    d1 = ex * ci + ee * co
    d2 = ee * ci + ex * co
    rparl = (ex * ci - ee * co) / jnp.where(d1 == 0, 1e-12, d1)
    rperp = (ee * ci - ex * co) / jnp.where(d2 == 0, 1e-12, d2)
    return 0.5 * (rparl * rparl + rperp * rperp)


def microfacet_scattering_eval(lb: LobeBatch, wo: Array, wi: Array,
                               adjoint: bool = False) -> Array:
    alpha = lb.f0
    prod = wo[..., 2] * wi[..., 2]
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    # reflection side
    m = sign[..., None] * _half_vector(wo, wi)
    dot_hv = dot(wo, m)
    d = ggx_D(alpha, m)
    f = fresnel_dielectric(lb.s1, lb.s2, dot_hv)
    g = ggx_smith_g1(alpha, wo, m) * ggx_smith_g1(alpha, wi, m)
    fs_refl = f * (d * g / jnp.maximum(4.0 * jnp.abs(prod), 1e-12))[..., None]
    # transmission side
    fs_trans = _micro_scatter_trans_fs(lb, wo, wi, adjoint=adjoint)
    return jnp.where(
        (prod > 0)[..., None], fs_refl,
        jnp.where((prod < 0)[..., None], fs_trans, 0.0),
    )


def microfacet_scattering_pdf(lb: LobeBatch, wo: Array, wi: Array,
                              hero: Array) -> Array:
    alpha = lb.f0
    prod = wo[..., 2] * wi[..., 2]
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    entering = wo[..., 2] >= 0
    ee_h = jnp.where(entering, _hero_take(lb.s1, hero), _hero_take(lb.s2, hero))
    ex_h = jnp.where(entering, _hero_take(lb.s2, hero), _hero_take(lb.s1, hero))
    m_refl = sign[..., None] * _half_vector(wo, wi)
    m_trans = -(ee_h[..., None] * wo + ex_h[..., None] * wi)
    m_trans = m_trans / jnp.maximum(jnp.sqrt(dot(m_trans, m_trans))[..., None], 1e-12)
    m = jnp.where((prod > 0)[..., None], m_refl, m_trans)
    dot_hv = dot(wo, m)
    ok = (dot_hv * sign > 0) & (prod != 0)
    mpdf = ggx_vndf_pdf(alpha, sign[..., None] * wo, m)
    f = fresnel_dielectric(lb.s1, lb.s2, dot_hv)
    reflect_prob = importance(f, hero)
    dot_hl = dot(wi, m)
    pdf_refl = reflect_prob * mpdf / jnp.maximum(4.0 * dot_hv * sign, 1e-12)
    denom = jnp.maximum((ee_h * dot_hv + ex_h * dot_hl) ** 2, 1e-12)
    pdf_trans = (1.0 - reflect_prob) / denom * mpdf * ex_h * ex_h * jnp.abs(dot_hl)
    pdf = jnp.where(prod > 0, pdf_refl, pdf_trans)
    return jnp.where(ok, pdf, 0.0)


def microfacet_scattering_sample(lb: LobeBatch, wo: Array, hero: Array,
                                 u_comp: Array, u0: Array, u1: Array,
                                 adjoint: bool = False) -> SampleOut:
    alpha = lb.f0
    sign = jnp.where(wo[..., 2] >= 0, 1.0, -1.0)
    entering = wo[..., 2] >= 0
    ee_h = jnp.where(entering, _hero_take(lb.s1, hero), _hero_take(lb.s2, hero))
    ex_h = jnp.where(entering, _hero_take(lb.s2, hero), _hero_take(lb.s1, hero))
    m, mpdf = ggx_sample_vndf(alpha, sign[..., None] * wo, u0, u1)
    dot_hv = dot(wo, m)
    valid_m = dot_hv * sign > 0
    f = fresnel_dielectric(lb.s1, lb.s2, dot_hv)
    reflect_prob = importance(f, hero)
    do_reflect = u_comp < reflect_prob

    # reflection branch
    wi_r = 2.0 * dot_hv[..., None] * m - wo
    ok_r = wi_r[..., 2] * wo[..., 2] > 0
    pdf_r = reflect_prob * mpdf / jnp.maximum(4.0 * dot_hv * sign, 1e-12)

    # refraction branch (hero-channel etas pick the direction,
    # MicrofacetBSDF.cpp:156-170)
    rr = ee_h / jnp.maximum(ex_h, 1e-12)
    inner = 1.0 + rr * rr * (dot_hv * dot_hv - 1.0)
    ok_t_root = inner >= 0
    wi_t = (rr * dot_hv - sign * jnp.sqrt(jnp.maximum(inner, 0.0)))[..., None] * m - rr[..., None] * wo
    ok_t = ok_t_root & (wi_t[..., 2] * wo[..., 2] < 0)
    dot_hl = dot(wi_t, m)
    denom = jnp.maximum((ee_h * dot_hv + ex_h * dot_hl) ** 2, 1e-12)
    pdf_t = (1.0 - reflect_prob) / denom * mpdf * ex_h * ex_h * jnp.abs(dot_hl)

    wi = jnp.where(do_reflect[..., None], wi_r, wi_t)
    ok = valid_m & jnp.where(do_reflect, ok_r, ok_t)
    pdf = jnp.where(do_reflect, pdf_r, pdf_t)
    fs = microfacet_scattering_eval(lb, wo, wi, adjoint=adjoint)
    pdf = jnp.where(ok, pdf, 0.0)
    fs = jnp.where(ok[..., None], fs, 0.0)
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=jnp.logical_not(do_reflect))


# ---------------------------------------------------------------------------
# Modified Ward-Dur BRDF (reference ModifiedWardDurBRDF.cpp:11-90)
# ---------------------------------------------------------------------------

def _ward_terms(lb: LobeBatch, wo: Array, wi: Array):
    ax = jnp.maximum(lb.f0, 1e-4)
    ay = jnp.maximum(lb.f1, 1e-4)
    h = _half_vector(wo, wi)
    hx_ax = h[..., 0] / ax
    hy_ay = h[..., 1] / ay
    dot_hn = jnp.abs(h[..., 2])
    dot_hi = dot(h, wi)
    numerator = jnp.exp(
        -(hx_ax * hx_ax + hy_ay * hy_ay) / jnp.maximum(dot_hn * dot_hn, 1e-12)
    )
    return ax, ay, dot_hn, dot_hi, numerator


def ward_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same = wi[..., 2] * wo[..., 2] > 0
    ax, ay, dot_hn, dot_hi, num = _ward_terms(lb, wo, wi)
    denom = 4.0 * jnp.pi * ax * ay * dot_hi * dot_hi * dot_hn ** 4
    fs = lb.s0 * (num / jnp.maximum(denom, 1e-12))[..., None]
    return jnp.where(same[..., None], fs, 0.0)


def ward_pdf(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same = wi[..., 2] * wo[..., 2] > 0
    ax, ay, dot_hn, dot_hi, num = _ward_terms(lb, wo, wi)
    denom = 4.0 * jnp.pi * ax * ay * dot_hi * dot_hn ** 3
    return jnp.where(same, num / jnp.maximum(denom, 1e-12), 0.0)


def ward_sample(lb: LobeBatch, wo: Array, u0: Array, u1: Array) -> SampleOut:
    ax = jnp.maximum(lb.f0, 1e-4)
    ay = jnp.maximum(lb.f1, 1e-4)
    quad = 2.0 * jnp.pi * u1
    phi_h = jnp.arctan2(ay * jnp.sin(quad), ax * jnp.cos(quad))
    cosphi_ax = jnp.cos(phi_h) / ax
    sinphi_ay = jnp.sin(phi_h) / ay
    theta_h = jnp.arctan(
        jnp.sqrt(
            -jnp.log(jnp.maximum(1.0 - u0, 1e-12))
            / jnp.maximum(cosphi_ax**2 + sinphi_ay**2, 1e-12)
        )
    )
    h = jnp.stack(
        [
            jnp.sin(theta_h) * jnp.cos(phi_h),
            jnp.sin(theta_h) * jnp.sin(phi_h),
            jnp.cos(theta_h) * jnp.where(wo[..., 2] > 0, 1.0, -1.0),
        ],
        axis=-1,
    )
    wi = 2.0 * dot(wo, h)[..., None] * h - wo
    ok = wi[..., 2] * wo[..., 2] > 0
    pdf = ward_pdf(lb, wo, wi)
    fs = ward_eval(lb, wo, wi)
    pdf = jnp.where(ok, pdf, 0.0)
    fs = jnp.where(ok[..., None], fs, 0.0)
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=false_)


# ---------------------------------------------------------------------------
# Ashikhmin-Shirley BRDF (reference AshikhminShirleyBRDF.cpp:12-170):
# anisotropic Phong specular + coupled diffuse with internal one-sample MIS.
# s0 = Rs, s1 = Rd, f0 = nu, f1 = nv.
# ---------------------------------------------------------------------------

def _ashikhmin_weights(lb: LobeBatch, wo: Array, hero: Array):
    i_rs = importance(lb.s0, hero)
    i_rd = importance(lb.s1, hero)
    vdh = jnp.abs(wo[..., 2])
    spec_w = i_rs + (1.0 - i_rs) * (1.0 - vdh) ** 5
    trans = 1.0 - (1.0 - vdh * 0.5) ** 5
    diff_w = 28.0 * i_rd / 23.0 * (1.0 - i_rs) * trans * trans
    return spec_w, diff_w


def _ashikhmin_spec_terms(lb: LobeBatch, wo: Array, wi: Array, h: Array):
    nu = lb.f0
    nv = lb.f1
    dot_hv = dot(h, wo)
    denom_1mz2 = jnp.maximum(1.0 - h[..., 2] * h[..., 2], 1e-12)
    expo = (nu * h[..., 0] ** 2 + nv * h[..., 1] ** 2) / denom_1mz2
    common = (
        jnp.sqrt((nu + 1.0) * (nv + 1.0))
        / (8.0 * jnp.pi * jnp.maximum(dot_hv, 1e-12))
        * jnp.abs(h[..., 2]) ** expo
    )
    return dot_hv, common


def _ashikhmin_fs(lb: LobeBatch, wo: Array, wi: Array, h: Array) -> Array:
    dot_hv, common = _ashikhmin_spec_terms(lb, wo, wi, h)
    f = lb.s0 + (1.0 - lb.s0) * ((1.0 - dot_hv) ** 5)[..., None]
    spec = (common / jnp.maximum(
        jnp.maximum(jnp.abs(wo[..., 2]), jnp.abs(wi[..., 2])), 1e-12
    ))[..., None] * f
    diff = (
        28.0 * lb.s1 / (23.0 * jnp.pi) * (1.0 - lb.s0)
        * ((1.0 - (1.0 - jnp.abs(wo[..., 2]) / 2.0) ** 5)
           * (1.0 - (1.0 - jnp.abs(wi[..., 2]) / 2.0) ** 5))[..., None]
    )
    return spec + diff


def ashikhmin_eval(lb: LobeBatch, wo: Array, wi: Array) -> Array:
    same = wi[..., 2] * wo[..., 2] > 0
    h = _half_vector(wo, wi)
    return jnp.where(same[..., None], _ashikhmin_fs(lb, wo, wi, h), 0.0)


def ashikhmin_pdf(lb: LobeBatch, wo: Array, wi: Array, hero: Array) -> Array:
    same = wi[..., 2] * wo[..., 2] > 0
    h = _half_vector(wo, wi)
    _, spec_pdf = _ashikhmin_spec_terms(lb, wo, wi, h)
    diff_pdf = jnp.abs(wi[..., 2]) * _INV_PI
    spec_w, diff_w = _ashikhmin_weights(lb, wo, hero)
    pdf = (spec_pdf * spec_w + diff_pdf * diff_w) / jnp.maximum(
        spec_w + diff_w, 1e-12
    )
    return jnp.where(same, pdf, 0.0)


def ashikhmin_sample(lb: LobeBatch, wo: Array, front: Array, hero: Array,
                     u_comp: Array, u0: Array, u1: Array) -> SampleOut:
    nu = lb.f0
    nv = lb.f1
    spec_w, diff_w = _ashikhmin_weights(lb, wo, hero)
    sum_w = jnp.maximum(spec_w + diff_w, 1e-12)
    pick_spec = u_comp * sum_w < spec_w

    # specular half-vector sample (AshikhminShirleyBRDF.cpp:27-35)
    quad = 2.0 * jnp.pi * u1
    phi_h = jnp.arctan2(
        jnp.sqrt(nu + 1.0) * jnp.sin(quad), jnp.sqrt(nv + 1.0) * jnp.cos(quad)
    )
    cosphi = jnp.cos(phi_h)
    sinphi = jnp.sin(phi_h)
    expo = 1.0 / (nu * cosphi * cosphi + nv * sinphi * sinphi + 1.0)
    cos_th = jnp.maximum(1.0 - u0, 1e-12) ** expo
    theta_h = jnp.arccos(jnp.clip(cos_th, -1.0, 1.0))
    theta_h = jnp.where(wo[..., 2] < 0, jnp.pi - theta_h, theta_h)
    h = jnp.stack(
        [
            jnp.sin(theta_h) * cosphi,
            jnp.sin(theta_h) * sinphi,
            jnp.cos(theta_h),
        ],
        axis=-1,
    )
    wi_spec = 2.0 * dot(wo, h)[..., None] * h - wo

    # diffuse cosine sample
    d = cosine_sample_hemisphere(u0, u1)
    z = jnp.where(front, d[..., 2], -d[..., 2])
    wi_diff = jnp.concatenate([d[..., :2], z[..., None]], axis=-1)

    wi = jnp.where(pick_spec[..., None], wi_spec, wi_diff)
    ok = wi[..., 2] * wo[..., 2] > 0
    pdf = ashikhmin_pdf(lb, wo, wi, hero)
    fs = ashikhmin_eval(lb, wo, wi)
    pdf = jnp.where(ok, pdf, 0.0)
    fs = jnp.where(ok[..., None], fs, 0.0)
    false_ = jnp.zeros(pdf.shape, bool)
    return SampleOut(wi=wi, pdf=pdf, fs=fs, is_delta=false_,
                     is_transmission=false_)
