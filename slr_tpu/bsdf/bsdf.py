"""Aggregate BSDF over material lobe tables — the MultiBSDF of the TPU build.

The reference wraps per-hit, arena-allocated BSDF closures behind virtual
dispatch and combines up to 4 of them with one-sample MIS in MultiBSDF
(libSLR/BSDFs/MultiBSDF.cpp:20-129). Here the whole wavefront's lobes live in
a `LobeBatch` of shape (R, L) and every kind is evaluated branchlessly with
masks (compute-all-select); the per-ray lobe pick, combined PDF, summed fs and
shading-normal correction reproduce MultiBSDF + the BSDF wrapper semantics
(directional_distribution_functions.h:231-267).

Emission follows DiffuseEDF: Le = emittance / pi on the shading-upper side
(basic_EDFs.cpp:19-23, DiffuseEmission.cpp:14-16).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math3d import Array, dot as _dot3
from ..scene.textures import (
    eval_float_texture,
    eval_float_texture_default1,
    eval_stex,
)
from ..scene.types import FlatScene, LobeKind, Materials
from ..spectrum.rgb import importance
from . import lobes as lb_mod
from .lobes import LobeBatch, SampleOut


class BSDFSampleResult(NamedTuple):
    wi: Array        # (R, 3) shading-frame sampled direction
    fs: Array        # (R, S) with sn-correction applied
    pdf: Array       # (R,)
    is_delta: Array  # (R,) bool
    dispersive: Array  # (R,) bool: hero-collapse happened (glass transmission)
    # Reverse-direction pdf/fs, valid ONLY where is_delta (the reference's
    # BSDFReverseInfo). BPT's MIS walk uses these at specular vertices where
    # bsdf_pdf/bsdf_evaluate are identically zero; zeros there silently drop
    # every competing-strategy term past the vertex and overweight specular
    # paths. Finite lobes report 0 here — use bsdf_pdf/bsdf_evaluate.
    rev_pdf: Array = None   # (R,)
    rev_fs: Array = None    # (R, S) with sn-correction of the reverse query


def gather_lobes(scene: FlatScene, mat_id: Array, uv: Array,
                 wpos: Array | None = None,
                 lambdas: Array | None = None) -> LobeBatch:
    """Evaluate all material textures at the hits: (R,) mat ids -> (R, L) lobes.

    Counterpart of SurfaceMaterial::getBSDF texture evaluation + closure
    construction (libSLR/Core/surface_material.h:22, basic_SurfaceMaterials.cpp).
    The lobe weight texture (mix ratios) is folded into s0, matching the
    reference's `scale` argument threading through getBSDF.
    """
    from ..core.tables import onehot_fetch, pack_columns

    mats = scene.materials
    m, l = mats.lobe_kind.shape
    row = onehot_fetch(
        pack_columns(mats.lobe_kind, mats.lobe_stex, mats.lobe_ftex,
                     mats.lobe_wtex),
        mat_id,
    )
    kind = row[..., :l].astype(jnp.int32)                       # (R, L)
    stex_ids = row[..., l:4 * l].astype(jnp.int32).reshape(
        row.shape[:-1] + (l, 3))                                # (R, L, 3)
    ftex_ids = row[..., 4 * l:6 * l].astype(jnp.int32).reshape(
        row.shape[:-1] + (l, 2))                                # (R, L, 2)
    wtex_ids = row[..., 6 * l:7 * l].astype(jnp.int32)          # (R, L)

    r = kind.shape[0]

    def ev_s(ids: Array) -> Array:
        flat = eval_stex(
            scene.stex,
            ids.reshape(-1),
            jnp.broadcast_to(uv[:, None, :], (r, l, 2)).reshape(-1, 2),
            None if lambdas is None
            else jnp.broadcast_to(
                lambdas[:, None, :], (r, l, lambdas.shape[-1])
            ).reshape(-1, lambdas.shape[-1]),
            None if wpos is None
            else jnp.broadcast_to(wpos[:, None, :], (r, l, 3)).reshape(-1, 3),
        )
        return flat.reshape(r, l, -1)

    def ev_f(ids: Array, default1: bool = False) -> Array:
        fn = eval_float_texture_default1 if default1 else eval_float_texture
        flat = fn(
            scene.ftex,
            ids.reshape(-1),
            jnp.broadcast_to(uv[:, None, :], (r, l, 2)).reshape(-1, 2),
            scene.stex.images,
            scene.stex.image_hw,
            None if wpos is None
            else jnp.broadcast_to(wpos[:, None, :], (r, l, 3)).reshape(-1, 3),
        )
        return flat.reshape(r, l)

    s0 = ev_s(stex_ids[..., 0])
    s1 = ev_s(stex_ids[..., 1])
    s2 = ev_s(stex_ids[..., 2])
    f0 = ev_f(ftex_ids[..., 0])
    f1 = ev_f(ftex_ids[..., 1])
    wmul = ev_f(wtex_ids, default1=True)
    s0 = s0 * wmul[..., None]
    return LobeBatch(kind=kind, s0=s0, s1=s1, s2=s2, f0=f0, f1=f1,
                     kinds=scene.lobe_kinds_present)


def _is_kind(kind: Array, k: LobeKind) -> Array:
    return kind == jnp.int32(int(k))


def _have(lobes: LobeBatch, k: LobeKind) -> bool:
    """Trace-time test: can this kind occur in the batch? Absent kinds'
    branches are never built (remote XLA compiles are expensive and the
    compute-all-select dispatch would evaluate them for every ray)."""
    return lobes.kinds is None or int(k) in lobes.kinds


def _sanitized(lobes: LobeBatch, kind: LobeKind) -> LobeBatch:
    """Replace parameters of rows NOT of `kind` with numerically safe values.

    The compute-all-select dispatch evaluates every kind for every lobe; rows
    of other kinds carry arbitrary (often zero) parameters that can produce
    inf/NaN inside the unselected branch — harmless in the primal (masked by
    jnp.where) but poisonous to reverse-mode AD, which differentiates both
    branches of a where. Safe neutral values keep every kind's math finite.
    """
    m1 = _is_kind(lobes.kind, kind)[..., None]
    m0 = _is_kind(lobes.kind, kind)
    return LobeBatch(
        kind=lobes.kind,
        s0=jnp.where(m1, lobes.s0, 0.5),
        s1=jnp.where(m1, lobes.s1, 1.0),
        s2=jnp.where(m1, lobes.s2, 1.5),
        f0=jnp.where(m0, lobes.f0, 0.5),
        f1=jnp.where(m0, lobes.f1, 0.5),
        kinds=lobes.kinds,
    )


def lobe_weights(lobes: LobeBatch, wo: Array, hero: Array) -> Array:
    """Per-lobe sampling weights (R, L) — each kind's weightInternal."""
    wo_b = jnp.broadcast_to(wo[:, None, :], lobes.kind.shape + (3,))
    hero_b = jnp.broadcast_to(hero[:, None], lobes.kind.shape)
    w = jnp.zeros(lobes.kind.shape, jnp.float32)
    diffuse_like = jnp.zeros(lobes.kind.shape, bool)
    for k in (LobeKind.LAMBERT, LobeKind.OREN_NAYAR, LobeKind.WARD,
              LobeKind.FLIPPED_LAMBERT):
        if _have(lobes, k):
            diffuse_like = diffuse_like | _is_kind(lobes.kind, k)
    w = jnp.where(diffuse_like, importance(lobes.s0, hero_b), w)
    for kind, fn in (
        (LobeKind.SPECULAR_REFLECTION, lb_mod.specular_reflection_weight),
        (LobeKind.SPECULAR_SCATTERING, lb_mod.specular_scattering_weight),
        (LobeKind.MICROFACET_REFLECTION, lb_mod.microfacet_reflection_weight),
        (LobeKind.MICROFACET_SCATTERING, lb_mod.microfacet_reflection_weight),
        (LobeKind.ASHIKHMIN,
         lambda lb, wo, h: sum(lb_mod._ashikhmin_weights(lb, wo, h))),
    ):
        if not _have(lobes, kind):
            continue
        w = jnp.where(
            _is_kind(lobes.kind, kind),
            fn(_sanitized(lobes, kind), wo_b, hero_b),
            w,
        )
    return jnp.maximum(w, 0.0)


def _eval_internal_all(lobes: LobeBatch, wo: Array, wi: Array,
                       hero: Array, adjoint: bool = False) -> Array:
    """Internal fs per lobe: (R, L, S). Delta lobes evaluate to zero."""
    wo_b = jnp.broadcast_to(wo[:, None, :], lobes.kind.shape + (3,))
    wi_b = jnp.broadcast_to(wi[:, None, :], lobes.kind.shape + (3,))
    fs = jnp.zeros(lobes.s0.shape, jnp.float32)
    for kind, fn in (
        (LobeKind.LAMBERT, lb_mod.lambert_eval),
        (LobeKind.FLIPPED_LAMBERT, lb_mod.flipped_lambert_eval),
        (LobeKind.OREN_NAYAR, lb_mod.oren_nayar_eval),
        (LobeKind.MICROFACET_REFLECTION, lb_mod.microfacet_reflection_eval),
        (LobeKind.MICROFACET_SCATTERING,
         lambda lb, a, b: lb_mod.microfacet_scattering_eval(
             lb, a, b, adjoint=adjoint)),
        (LobeKind.WARD, lb_mod.ward_eval),
        (LobeKind.ASHIKHMIN, lb_mod.ashikhmin_eval),
    ):
        if not _have(lobes, kind):
            continue
        fs = jnp.where(
            _is_kind(lobes.kind, kind)[..., None],
            fn(_sanitized(lobes, kind), wo_b, wi_b),
            fs,
        )
    return fs


def _pdf_internal_all(lobes: LobeBatch, wo: Array, wi: Array,
                      hero: Array) -> Array:
    """Internal pdf per lobe: (R, L). Delta lobes have zero pdf."""
    wo_b = jnp.broadcast_to(wo[:, None, :], lobes.kind.shape + (3,))
    wi_b = jnp.broadcast_to(wi[:, None, :], lobes.kind.shape + (3,))
    hero_b = jnp.broadcast_to(hero[:, None], lobes.kind.shape)
    pdf = jnp.zeros(lobes.kind.shape, jnp.float32)
    cosine_like = jnp.zeros(lobes.kind.shape, bool)
    for k in (LobeKind.LAMBERT, LobeKind.OREN_NAYAR):
        if _have(lobes, k):
            cosine_like = cosine_like | _is_kind(lobes.kind, k)
    pdf = jnp.where(cosine_like, lb_mod.lambert_pdf(lobes, wo_b, wi_b), pdf)
    for kind, fn in (
        (LobeKind.FLIPPED_LAMBERT,
         lambda lb: lb_mod.flipped_lambert_pdf(lb, wo_b, wi_b)),
        (LobeKind.MICROFACET_REFLECTION,
         lambda lb: lb_mod.microfacet_reflection_pdf(lb, wo_b, wi_b)),
        (LobeKind.MICROFACET_SCATTERING,
         lambda lb: lb_mod.microfacet_scattering_pdf(lb, wo_b, wi_b, hero_b)),
        (LobeKind.WARD, lambda lb: lb_mod.ward_pdf(lb, wo_b, wi_b)),
        (LobeKind.ASHIKHMIN,
         lambda lb: lb_mod.ashikhmin_pdf(lb, wo_b, wi_b, hero_b)),
    ):
        if not _have(lobes, kind):
            continue
        pdf = jnp.where(
            _is_kind(lobes.kind, kind), fn(_sanitized(lobes, kind)), pdf
        )
    return pdf


def _side_match(kind: Array, wo: Array, wi: Array, gn: Array) -> Array:
    """Geometric side test (BSDF::sideTest, h:209-212): a lobe contributes only
    if its reflection/transmission type matches the geometric side of wi.
    FLIPPED_LAMBERT (InverseBSDF) scatters into the opposite hemisphere, so
    it matches when wi is on the transmission side."""
    reflect = (
        _dot3(wo, gn) * _dot3(wi, gn) > 0.0
    )[:, None]
    refl_only = jnp.zeros(kind.shape, bool)
    for k in lb_mod.REFLECTION_ONLY:
        refl_only = refl_only | _is_kind(kind, k)
    scatter = (
        _is_kind(kind, LobeKind.SPECULAR_SCATTERING)
        | _is_kind(kind, LobeKind.MICROFACET_SCATTERING)
    )
    flipped = _is_kind(kind, LobeKind.FLIPPED_LAMBERT)
    match = jnp.where(refl_only, reflect, scatter)
    return jnp.where(flipped, jnp.logical_not(reflect), match)


def _sn_correction(wi: Array, gn: Array) -> Array:
    """Veach shading-normal correction |wi.z| / |dot(wi, gN_sn)| (h:235-237),
    non-adjoint (radiance transport)."""
    d = jnp.abs(_dot3(wi, gn))
    return jnp.abs(wi[..., 2]) / jnp.maximum(d, 1e-6)


def _sn_correction_dir(v: Array, gn: Array) -> Array:
    return jnp.abs(v[..., 2]) / jnp.maximum(
        jnp.abs(_dot3(v, gn)), 1e-6
    )


def bsdf_has_nondelta(lobes: LobeBatch) -> Array:
    """(R,) bool — any non-delta lobe present (BSDF::hasNonDelta)."""
    nondelta = lobes.kind != jnp.int32(int(LobeKind.NONE))
    for k in lb_mod.DELTA_KINDS:
        nondelta = nondelta & jnp.logical_not(_is_kind(lobes.kind, k))
    return jnp.any(nondelta, axis=-1)


def bsdf_evaluate(lobes: LobeBatch, wo: Array, wi: Array, gn: Array,
                  hero: Array, adjoint: bool = False) -> Array:
    """Full evaluate with side test and sn-correction. Returns (R, S).

    adjoint=True applies the shading-normal correction with the query
    direction instead of the evaluated one (BSDF::evaluate, h:256-258) —
    importance transport along light subpaths."""
    match = _side_match(lobes.kind, wo, wi, gn)
    fs = jnp.sum(
        jnp.where(
            match[..., None], _eval_internal_all(lobes, wo, wi, hero), 0.0
        ),
        axis=1,
    )
    corr = _sn_correction_dir(wo if adjoint else wi, gn)
    return fs * corr[..., None]


def bsdf_pdf(lobes: LobeBatch, wo: Array, wi: Array, gn: Array,
             hero: Array) -> Array:
    """Weighted one-sample-MIS pdf over lobes (MultiBSDF evaluatePDFInternal)."""
    w = lobe_weights(lobes, wo, hero)
    sum_w = jnp.sum(w, axis=-1)
    pdfs = _pdf_internal_all(lobes, wo, wi, hero)
    pdf = jnp.sum(pdfs * w, axis=-1) / jnp.maximum(sum_w, 1e-30)
    return jnp.where(sum_w > 0, pdf, 0.0)


def bsdf_sample(
    lobes: LobeBatch,
    wo: Array,
    gn: Array,
    hero: Array,
    wl_selected: Array,
    u_comp: Array,
    u0: Array,
    u1: Array,
    adjoint: bool = False,
) -> BSDFSampleResult:
    """MultiBSDF one-sample MIS sampling (MultiBSDF.cpp:20-59).

    wl_selected: (R,) bool — hero wavelength already collapsed upstream; a
    glass transmission when it is False reports `dispersive=True` so the
    caller divides the pdf by S and sets the flag (PathTracingRenderer.cpp
    :211-214 semantics).

    adjoint=True (light/importance subpaths): refraction carries the adjoint
    eta^2 radiance scale (basic_BSDFs.cpp:144-149, MicrofacetBSDF.cpp:187)
    and the shading-normal correction uses the query direction wo.
    """
    r, l = lobes.kind.shape
    w = lobe_weights(lobes, wo, hero)  # (R, L)
    sum_w = jnp.sum(w, axis=-1)
    cdf = jnp.cumsum(w, axis=-1)
    target = u_comp * sum_w
    idx = jnp.minimum(
        jnp.sum((cdf <= target[:, None]).astype(jnp.int32), axis=-1), l - 1
    )
    # One-hot contractions over the (tiny) lobe axis instead of
    # take_along_axis: TPU lowers per-lane gathers to the scalar core.
    iota_l = jnp.arange(l, dtype=jnp.int32)
    oh = idx[:, None] == iota_l                       # (R, L)
    oh_prev = (idx - 1)[:, None] == iota_l

    def take1(x):
        return jnp.sum(jnp.where(oh, x, jnp.zeros_like(x)), axis=-1)

    def take1s(x):  # (R, L, S) -> (R, S)
        return jnp.sum(jnp.where(oh[..., None], x, 0.0), axis=1)

    base = jnp.where(
        idx > 0, jnp.sum(jnp.where(oh_prev, cdf, 0.0), axis=-1), 0.0
    )
    w_sel = take1(w)
    u_remap = jnp.clip((target - base) / jnp.maximum(w_sel, 1e-30), 0.0, 1.0 - 1e-7)

    picked = LobeBatch(
        kind=take1(lobes.kind),
        s0=take1s(lobes.s0),
        s1=take1s(lobes.s1),
        s2=take1s(lobes.s2),
        f0=take1(lobes.f0),
        f1=take1(lobes.f1),
        kinds=lobes.kinds,
    )
    front = _dot3(wo, gn) > 0.0

    # Sample every PRESENT kind, select by the picked lobe's kind (params
    # sanitized per kind so unselected branches stay AD-safe). Absent kinds
    # are never built.
    def san(kind):
        return _sanitized(picked, kind)

    samplers = (
        (LobeKind.LAMBERT,
         lambda: lb_mod.lambert_sample(san(LobeKind.LAMBERT), wo, front,
                                       u0, u1)),
        (LobeKind.FLIPPED_LAMBERT,
         lambda: lb_mod.flipped_lambert_sample(
             san(LobeKind.FLIPPED_LAMBERT), wo, front, u0, u1)),
        (LobeKind.OREN_NAYAR,
         lambda: lb_mod.oren_nayar_sample(san(LobeKind.OREN_NAYAR), wo,
                                          front, u0, u1)),
        (LobeKind.SPECULAR_REFLECTION,
         lambda: lb_mod.specular_reflection_sample(
             san(LobeKind.SPECULAR_REFLECTION), wo)),
        (LobeKind.SPECULAR_SCATTERING,
         lambda: lb_mod.specular_scattering_sample(
             san(LobeKind.SPECULAR_SCATTERING), wo, hero, u_remap,
             adjoint=adjoint)),
        (LobeKind.MICROFACET_REFLECTION,
         lambda: lb_mod.microfacet_reflection_sample(
             san(LobeKind.MICROFACET_REFLECTION), wo, u0, u1)),
        (LobeKind.MICROFACET_SCATTERING,
         lambda: lb_mod.microfacet_scattering_sample(
             san(LobeKind.MICROFACET_SCATTERING), wo, hero, u_remap, u0, u1,
             adjoint=adjoint)),
        (LobeKind.WARD,
         lambda: lb_mod.ward_sample(san(LobeKind.WARD), wo, u0, u1)),
        (LobeKind.ASHIKHMIN,
         lambda: lb_mod.ashikhmin_sample(san(LobeKind.ASHIKHMIN), wo, front,
                                         hero, u_remap, u0, u1)),
    )
    outs = [(k, fn()) for k, fn in samplers if _have(lobes, k)]

    def sel(field: str) -> Array:
        v = getattr(outs[0][1], field)
        for kind_enum, out in outs[1:]:
            mask = _is_kind(picked.kind, kind_enum)
            if getattr(out, field).ndim > mask.ndim:
                mask = mask[..., None]
            v = jnp.where(mask, getattr(out, field), v)
        return v

    wi = sel("wi")
    pdf_sel = sel("pdf")
    fs_sel = sel("fs")
    is_delta = sel("is_delta")
    is_trans = sel("is_transmission")

    def sel_rev(field: str, like: Array) -> Array:
        v = jnp.zeros_like(like)
        for kind_enum, out in outs:
            rv = getattr(out, field)
            if rv is None:
                continue
            mask = _is_kind(picked.kind, kind_enum)
            if rv.ndim > mask.ndim:
                mask = mask[..., None]
            v = jnp.where(mask, rv, v)
        return v

    rev_pdf_lobe = sel_rev("rev_pdf", pdf_sel)
    rev_fs_lobe = sel_rev("rev_fs", fs_sel)

    # Combined pdf & fs for non-delta picks (MultiBSDF.cpp:35-56).
    pdf = pdf_sel * w_sel
    pdfs_all = _pdf_internal_all(lobes, wo, wi, hero)
    pdf_others = jnp.sum(pdfs_all * w, axis=-1) - take1(pdfs_all) * w_sel
    pdf = jnp.where(is_delta, pdf, pdf + pdf_others)
    pdf = pdf / jnp.maximum(sum_w, 1e-30)

    match = _side_match(lobes.kind, wo, wi, gn)
    fs_sum = jnp.sum(
        jnp.where(
            match[..., None],
            _eval_internal_all(lobes, wo, wi, hero, adjoint=adjoint),
            0.0,
        ),
        axis=1,
    )
    fs = jnp.where(is_delta[..., None], fs_sel, fs_sum)

    ok = (sum_w > 0) & (pdf_sel > 0)
    pdf = jnp.where(ok, pdf, 0.0)
    fs = jnp.where(ok[..., None], fs, 0.0)

    # Veach sn-correction: importance transport corrects with the fixed
    # query direction wo (BSDF::sample wrapper, h:231-246).
    corr = _sn_correction_dir(wo, gn) if adjoint else _sn_correction(wi, gn)
    fs = fs * corr[..., None]
    dispersive = is_trans & jnp.logical_not(wl_selected) & _is_kind(
        picked.kind, LobeKind.SPECULAR_SCATTERING
    )

    # Reverse delta info at the MATERIAL level: lobe-pick weights are
    # recomputed at the reverse query direction wi (MultiBSDF reverse
    # handling, MultiBSDF.cpp:60-129); the reverse transport kind is the
    # opposite of `adjoint`, so its sn-correction uses wi as the fixed
    # query direction (or wo as its sampled direction).
    w_rev = lobe_weights(lobes, wi, hero)
    sum_w_rev = jnp.sum(w_rev, axis=-1)
    w_rev_sel = take1(w_rev)
    rev_pdf = jnp.where(
        is_delta & (sum_w_rev > 0),
        rev_pdf_lobe * w_rev_sel / jnp.maximum(sum_w_rev, 1e-30),
        0.0,
    )
    corr_rev = (_sn_correction_dir(wi, gn) if not adjoint
                else _sn_correction(wo, gn))
    rev_fs = jnp.where(
        is_delta[..., None], rev_fs_lobe * corr_rev[..., None], 0.0
    )
    return BSDFSampleResult(wi=wi, fs=fs, pdf=pdf, is_delta=is_delta,
                            dispersive=dispersive, rev_pdf=rev_pdf,
                            rev_fs=rev_fs)


def emitted_radiance(scene: FlatScene, mat_id: Array, uv: Array,
                     cos_out: Array, lambdas: Array | None = None) -> Array:
    """Le = emittance * DiffuseEDF (1/pi on the emitting side). (R, S).

    cos_out: dot(dir_out, shading normal) at the emitter."""
    from ..core.tables import onehot_fetch, pack_columns

    emit_tex = onehot_fetch(
        pack_columns(scene.materials.emit_stex), mat_id
    )[..., 0].astype(jnp.int32)
    m = eval_stex(scene.stex, emit_tex, uv, lambdas)
    le = m * (1.0 / jnp.pi)
    visible = (cos_out > 0.0) & (emit_tex >= 0)
    return jnp.where(visible[..., None], le, 0.0)


def is_emissive(mats: Materials, mat_id: Array) -> Array:
    m = mats.emit_stex.shape[0]
    if m <= 1024:
        oh = mat_id[..., None] == jnp.arange(m, dtype=jnp.int32)
        return jnp.any(oh & (mats.emit_stex >= 0), axis=-1)
    return mats.emit_stex[mat_id] >= 0
