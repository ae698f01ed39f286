"""Bidirectional path tracer (Veach BPT) over ray wavefronts.

Faithful TPU reformulation of the reference
libSLR/Renderers/BidirectionalPathTracingRenderer.cpp:

* light and eye subpaths with per-vertex throughput, forward/reverse area
  PDFs, RR probabilities and delta flags (BPTVertex, h:70-86; generation
  :258-350);
* every (s >= 1, t >= 1) connection with geometry term, DDF evaluations at
  both ends with adjoint-correct shading-normal factors, and the recursive
  power-heuristic MIS weight that walks PDF ratios along both subpaths
  including RR probabilities and delta-vertex skips (:353-414);
* s = 0 implicit hits during eye-subpath generation (:286-309);
* t = 1 light-tracing contributions splatted through the perspective IDF's
  calculatePixel back-projection (:247-252) into a scatter-add film.

Wavefront form: subpaths have a static maximum vertex count; the whole
wavefront builds its vertex SoA tables in lockstep (masked lanes idle), and
the (s, t) connection loops and MIS walks unroll statically.

Scope notes vs the reference: environment lights are not yet part of the BPT
strategy set (scenes with an env light should render with PT); rough-glass
transmission keeps its non-adjoint radiance scale on light subpaths (the
eta^2 asymmetry of MicrofacetBSDF.cpp:187 is not yet flipped).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.intersect import sample_triangle_point
from ..bsdf.bsdf import (
    bsdf_evaluate,
    bsdf_pdf,
    bsdf_sample,
    emitted_radiance,
    gather_lobes,
    is_emissive,
)
from ..camera.perspective import camera_derived
from ..core import rng
from ..core.math3d import (
    Array,
    dot,
    frame_from_local,
    frame_to_local,
    normalize,
    transform_point,
    transform_vector,
)
from ..core.rng import Decision
from ..core.sampling import (
    concentric_sample_disk,
    cosine_sample_hemisphere,
    sample_discrete_1d,
)
from ..scene.types import FlatScene
from ..spectrum.rgb import importance
from .pt import (
    _area_light_prob,
    resolve_sp,
    scene_intersect_alpha,
    test_visibility,
)

_INV_PI = 1.0 / math.pi

# Extra decision-stream offsets so light-subpath randomness never collides
# with the eye subpath (both feed the same counter-based generator).
_LIGHT_BOUNCE_OFFSET = 64


class Vertices(NamedTuple):
    """Subpath vertex SoA, all arrays shaped (R, V, ...)."""

    valid: Array         # (R, V) bool
    p: Array             # (R, V, 3)
    gn: Array            # (R, V, 3) world geometric normal
    tangent: Array       # (R, V, 3) shading frame x
    bitangent: Array     # (R, V, 3)
    sn: Array            # (R, V, 3) shading frame z
    uv: Array            # (R, V, 2)
    mat_id: Array        # (R, V) int32
    dir_in_sn: Array     # (R, V, 3) direction toward the previous vertex
    alpha: Array         # (R, V, S)
    area_pdf: Array      # (R, V)
    rr_prob: Array       # (R, V)
    rev_area_pdf: Array  # (R, V)
    rev_rr_prob: Array   # (R, V)
    delta: Array         # (R, V) creating sample was delta
    is_light0: Array     # (R, V) light-source vertex (EDF endpoint)


def _stack(steps: list, axis=1):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=axis), *steps)


def _gn_sn(v: Vertices, i: int) -> Array:
    return frame_to_local(
        v.tangent[:, i], v.bitangent[:, i], v.sn[:, i], v.gn[:, i]
    )


def _generate_subpath(
    scene: FlatScene,
    o: Array,
    d: Array,
    alpha0: Array,
    dir_pdf0: Array,
    cos_last0: Array,
    delta0: Array,
    prev_p: Array,
    adjoint: bool,
    seed: Array,
    pixel_id: Array,
    sample_id: Array,
    hero: Array,
    wl_selected0: Array,
    lambdas,
    max_verts: int,
    bounce_offset: int,
):
    """Trace a subpath (generateSubPath, BPT cpp:261-349). Returns
    (list of per-vertex pytrees, s0_data list for the eye path)."""
    r = o.shape[0]
    s_dim = alpha0.shape[-1]
    steps = []
    s0_info = []  # per-vertex data needed for s=0 implicit contributions

    alpha = alpha0
    dir_pdf = dir_pdf0
    cos_last = cos_last0
    delta = delta0
    active = dir_pdf0 > 0
    wl_sel = wl_selected0
    ray_o, ray_d = o, d
    prev = prev_p
    rr_prob = jnp.ones((r,), jnp.float32)

    zero_step = None

    for i in range(max_verts):
        bounce_id = jnp.uint32(bounce_offset + i)
        hit = scene_intersect_alpha(scene, ray_o, ray_d)
        sp = resolve_sp(scene, hit, ray_o, ray_d)
        ok = active & hit.mask

        dist2 = jnp.maximum(jnp.sum((sp.p - prev) ** 2, axis=-1), 1e-12)
        wo = frame_to_local(sp.tangent, sp.bitangent, sp.sn, -ray_d)
        gn_sn = frame_to_local(sp.tangent, sp.bitangent, sp.sn, sp.gn)
        area_pdf = dir_pdf * jnp.abs(dot(wo, gn_sn)) / dist2

        step = Vertices(
            valid=ok,
            p=sp.p, gn=sp.gn, tangent=sp.tangent, bitangent=sp.bitangent,
            sn=sp.sn, uv=sp.uv, mat_id=sp.mat_id,
            dir_in_sn=wo,
            alpha=jnp.where(ok[:, None], alpha, 0.0),
            area_pdf=area_pdf,
            rr_prob=rr_prob,
            rev_area_pdf=jnp.ones((r,), jnp.float32),
            rev_rr_prob=jnp.ones((r,), jnp.float32),
            delta=delta,
            is_light0=jnp.zeros((r,), bool),
        )

        if not adjoint:
            # s = 0 data: the eye path hit an emitter (BPT cpp:286-309).
            le = emitted_radiance(scene, sp.mat_id, sp.uv, dot(-ray_d, sp.sn),
                                  lambdas)
            l_prob = _area_light_prob(scene)
            ext1 = l_prob * sp.area_pdf               # lightProb * areaPDF
            # EDF pdf toward the previous vertex: cosine hemisphere
            edf_pdf = jnp.maximum(wo[..., 2], 0.0) * _INV_PI
            ext2 = edf_pdf * cos_last / dist2
            emit_ok = ok & is_emissive(scene.materials, sp.mat_id)
            s0_info.append((emit_ok, alpha * le, ext1, ext2, wl_sel))

        # BSDF sample to extend.
        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, lambdas)
        uc = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_COMPONENT)
        u0 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_U)
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_V)
        smp = bsdf_sample(lobes, wo, gn_sn, hero, wl_sel, uc, u0, u1)
        new_dir_pdf = jnp.where(smp.dispersive, smp.pdf / s_dim, smp.pdf)
        wl_sel_next = wl_sel | smp.dispersive

        cos_in = jnp.abs(dot(smp.wi, gn_sn))
        weight = smp.fs * (cos_in / jnp.maximum(new_dir_pdf, 1e-30))[:, None]
        new_rr = jnp.minimum(importance(weight, hero), 1.0)
        u_rr = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.RR)
        survive = u_rr < new_rr
        weight = weight / jnp.maximum(new_rr, 1e-30)[:, None]

        sample_ok = ok & (new_dir_pdf > 0) & jnp.logical_not(
            jnp.all(smp.fs == 0.0, axis=-1)
        )

        # Reverse pdf/fs of this bounce for the PREVIOUS vertex
        # (vtxNextToLast.revAreaPDF / revRRProb, cpp:341-343).
        rev_pdf = bsdf_pdf(lobes, smp.wi, wo, gn_sn, hero)
        rev_fs = bsdf_evaluate(lobes, smp.wi, wo, gn_sn, hero,
                               adjoint=not adjoint)
        rev_area = rev_pdf * cos_last / dist2
        rev_rr = jnp.minimum(
            importance(
                rev_fs * (jnp.abs(dot(wo, gn_sn))
                          / jnp.maximum(rev_pdf, 1e-30))[:, None],
                hero,
            ),
            1.0,
        )
        upd = sample_ok & survive
        if steps:
            prev_step = steps[-1]
            steps[-1] = prev_step._replace(
                rev_area_pdf=jnp.where(upd, rev_area, prev_step.rev_area_pdf),
                rev_rr_prob=jnp.where(upd, rev_rr, prev_step.rev_rr_prob),
            )
        else:
            zero_step = (upd, rev_area, rev_rr)

        steps.append(step)

        alpha = alpha * weight
        active = sample_ok & survive
        delta = smp.is_delta
        dir_pdf = new_dir_pdf
        cos_last = cos_in
        wl_sel = wl_sel_next
        prev = sp.p
        ray_o = sp.p
        ray_d = frame_from_local(sp.tangent, sp.bitangent, sp.sn, smp.wi)
        rr_prob = new_rr

    return steps, s0_info, zero_step


def _mis_weight_static(
    l_ext1, l_rr1, l_ext2, l_rr2, e_ext1, e_rr1, e_ext2, e_rr2,
    s: int, t: int,
    l_area, l_rrp, l_rev_area, l_rev_rrp, l_delta,
    e_area, e_rrp, e_rev_area, e_rev_rrp, e_delta,
):
    """calculateMISWeight (BPT cpp:353-414) with static s,t — the loops
    unroll; all operands are (R,) arrays. Arrays indexed [:, i]."""
    rec = jnp.ones_like(l_ext1)
    min_eye, min_light = 1, 0

    def safe_div(a, b):
        return a / jnp.where(b <= 0, 1e30, b)

    # shorten eye subpath / extend light subpath
    if t > min_eye:
        ratio = safe_div(l_ext1 * l_rr1, e_area[:, t - 1] * e_rrp[:, t - 1])
        shorten_delta = e_delta[:, t - 1]
        rec = rec + jnp.where(shorten_delta, 0.0, ratio * ratio)
        prev_delta = shorten_delta
        if t - 1 > min_eye:
            ratio = ratio * safe_div(
                l_ext2 * l_rr2, e_area[:, t - 2] * e_rrp[:, t - 2]
            )
            shorten_delta = e_delta[:, t - 2]
            rec = rec + jnp.where(shorten_delta | prev_delta, 0.0, ratio * ratio)
            prev_delta = shorten_delta
            for k in range(t - 2, min_eye, -1):
                ratio = ratio * safe_div(
                    e_rev_area[:, k - 1] * e_rev_rrp[:, k - 1],
                    e_area[:, k - 1] * e_rrp[:, k - 1],
                )
                shorten_delta = e_delta[:, k - 1]
                rec = rec + jnp.where(
                    shorten_delta | prev_delta, 0.0, ratio * ratio
                )
                prev_delta = shorten_delta

    # shorten light subpath / extend eye subpath
    if s > min_light:
        ratio = safe_div(e_ext1 * e_rr1, l_area[:, s - 1] * l_rrp[:, s - 1])
        shorten_delta = l_delta[:, s - 1]
        rec = rec + jnp.where(shorten_delta, 0.0, ratio * ratio)
        prev_delta = shorten_delta
        if s - 1 > min_light:
            ratio = ratio * safe_div(
                e_ext2 * e_rr2, l_area[:, s - 2] * l_rrp[:, s - 2]
            )
            shorten_delta = l_delta[:, s - 2]
            rec = rec + jnp.where(shorten_delta | prev_delta, 0.0, ratio * ratio)
            prev_delta = shorten_delta
            for k in range(s - 2, min_light, -1):
                ratio = ratio * safe_div(
                    l_rev_area[:, k - 1] * l_rev_rrp[:, k - 1],
                    l_area[:, k - 1] * l_rrp[:, k - 1],
                )
                shorten_delta = l_delta[:, k - 1]
                rec = rec + jnp.where(
                    shorten_delta | prev_delta, 0.0, ratio * ratio
                )
                prev_delta = shorten_delta

    return 1.0 / rec


@partial(jax.jit, static_argnames=("max_light_verts", "max_eye_verts"))
def bpt_batch(
    scene: FlatScene,
    pixel_id: Array,
    sample_id: Array,
    seed: Array,
    width: Array,
    height: Array,
    film: Array,
    max_light_verts: int = 4,
    max_eye_verts: int = 4,
) -> Array:
    """One BPT sample pass for a pixel batch; scatter-adds contributions
    (including t=1 splats) into `film` (H*W, S) and returns it."""
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES,
        WL_HI,
        WL_LO,
        bin_to_strata,
        sample_wavelengths,
    )

    r = pixel_id.shape[0]
    spectral = scene.stex.spectral
    s_dim = NUM_SPECTRAL_SAMPLES if spectral else scene.stex.value.shape[-1]

    n_pix = (width * height).astype(jnp.uint32)
    pid_c = jnp.minimum(pixel_id, n_pix - 1)
    px = (pid_c % width.astype(jnp.uint32)).astype(jnp.float32)
    py = (pid_c // width.astype(jnp.uint32)).astype(jnp.float32)

    u_wl = rng.uniform(seed, pid_c, sample_id, 0, Decision.WL_SELECT)
    if spectral:
        u_off = rng.uniform(seed, pid_c, sample_id, 0, Decision.WAVELENGTH)
        wls = sample_wavelengths(u_off, u_wl)
        lambdas = wls.lambdas
        hero = wls.hero
        select_wl_pdf = NUM_SPECTRAL_SAMPLES / (WL_HI - WL_LO)
    else:
        lambdas = None
        hero = jnp.minimum((u_wl * s_dim).astype(jnp.int32), s_dim - 1)
        select_wl_pdf = 1.0

    def film_add(film, pix_idx, contribution, valid):
        c = jnp.where(valid[:, None], contribution, 0.0)
        if spectral:
            c = bin_to_strata(lambdas, c)
        return film.at[pix_idx].add(c)

    # ------------------------------------------------------------------
    # Light subpath (BPT cpp:117-143).
    # ------------------------------------------------------------------
    u_sel = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_SELECT)
    lu0 = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_POS_U)
    lu1 = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_POS_V)
    idx, pmf, _ = sample_discrete_1d(scene.lights.dist, u_sel)
    light_tri = scene.lights.tri_idx[idx]
    light_prob = (1.0 - scene.lights.env_prob) * pmf
    lp = sample_triangle_point(scene.geometry, light_tri, lu0, lu1)
    light_area_pdf = light_prob * lp.area_pdf
    le0 = emitted_radiance(scene, lp.mat_id, lp.uv,
                           jnp.ones((r,), jnp.float32), lambdas) * jnp.pi
    # (emittance M = pi * Le; emitted_radiance returns M/pi, so M = that*pi)

    eu0 = rng.uniform(seed, pid_c, sample_id, 0, Decision.EDF_U)
    eu1 = rng.uniform(seed, pid_c, sample_id, 0, Decision.EDF_V)
    edf_dir = cosine_sample_hemisphere(eu0, eu1)
    edf_pdf = jnp.maximum(edf_dir[..., 2], 1e-12) * _INV_PI
    le1 = jnp.full((r, s_dim), _INV_PI)
    l_ray_d = frame_from_local(lp.tangent, lp.bitangent, lp.sn, edf_dir)

    l_v0 = Vertices(
        valid=jnp.ones((r,), bool),
        p=lp.p, gn=lp.gn, tangent=lp.tangent, bitangent=lp.bitangent,
        sn=lp.sn, uv=lp.uv, mat_id=lp.mat_id,
        dir_in_sn=jnp.zeros((r, 3)),
        alpha=le0 / jnp.maximum(light_area_pdf, 1e-30)[:, None],
        area_pdf=light_area_pdf,
        rr_prob=jnp.ones((r,), jnp.float32),
        rev_area_pdf=jnp.ones((r,), jnp.float32),
        rev_rr_prob=jnp.ones((r,), jnp.float32),
        delta=jnp.zeros((r,), bool),
        is_light0=jnp.ones((r,), bool),
    )
    l_alpha1 = l_v0.alpha * le1 * (
        jnp.abs(dot(l_ray_d, lp.gn)) / edf_pdf
    )[:, None]
    l_steps, _, l_zero = _generate_subpath(
        scene, lp.p, l_ray_d, l_alpha1, edf_pdf, edf_dir[..., 2],
        jnp.zeros((r,), bool), lp.p, True, seed, pid_c, sample_id, hero,
        jnp.zeros((r,), bool), lambdas, max_light_verts - 1,
        _LIGHT_BOUNCE_OFFSET,
    )
    # light vertex 0 reverse pdfs from the first bounce
    if l_zero is not None:
        upd, rev_area, rev_rr = l_zero
        l_v0 = l_v0._replace(
            rev_area_pdf=jnp.where(upd, rev_area, l_v0.rev_area_pdf),
            rev_rr_prob=jnp.where(upd, rev_rr, l_v0.rev_rr_prob),
        )
    lv = _stack([l_v0] + l_steps)

    # ------------------------------------------------------------------
    # Eye subpath (BPT cpp:145-163) — perspective camera.
    # ------------------------------------------------------------------
    cam = scene.camera
    lx = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_U)
    ly = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_V)
    jx = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_Y)
    op_w, op_h, img_area = camera_derived(cam)
    dx, dy = concentric_sample_disk(lx, ly)
    org_local = jnp.stack(
        [cam.lens_radius * dx, cam.lens_radius * dy, jnp.zeros_like(dx)],
        axis=-1,
    )
    lens_p = transform_point(cam.to_world, org_local)
    lens_n = transform_vector(
        cam.to_world, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (r, 3))
    )
    lens_x = transform_vector(
        cam.to_world, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (r, 3))
    )
    lens_y = jnp.cross(lens_n, lens_x)
    lens_area_pdf = jnp.where(
        cam.lens_radius > 0,
        1.0 / (jnp.pi * jnp.maximum(cam.lens_radius, 1e-12) ** 2),
        1.0,
    )
    sensitivity = lens_area_pdf  # We0 = sensitivity folded like PT

    sx = (px + jx) / width
    sy = (py + jy) / height
    p_focus = jnp.stack(
        [op_w * (0.5 - sx), op_h * (0.5 - sy),
         jnp.broadcast_to(cam.obj_dist, sx.shape)], axis=-1,
    )
    dir_local = normalize(p_focus - org_local)
    we_dir_pdf = (cam.img_dist ** 2) / (dir_local[..., 2] ** 3 * img_area)
    e_ray_d = transform_vector(cam.to_world, dir_local)

    e_v0 = Vertices(
        valid=jnp.ones((r,), bool),
        p=lens_p, gn=lens_n, tangent=lens_x, bitangent=lens_y, sn=lens_n,
        uv=jnp.stack([dx, dy], axis=-1), mat_id=jnp.full((r,), -1, jnp.int32),
        dir_in_sn=jnp.zeros((r, 3)),
        alpha=jnp.full(
            (r, s_dim),
            1.0,
        ) * (sensitivity / (lens_area_pdf * select_wl_pdf)),
        area_pdf=jnp.full((r,), 1.0) * lens_area_pdf,
        rr_prob=jnp.ones((r,), jnp.float32),
        rev_area_pdf=jnp.ones((r,), jnp.float32),
        rev_rr_prob=jnp.ones((r,), jnp.float32),
        # pinhole lens position is a delta distribution (posType Delta0D)
        delta=jnp.broadcast_to(cam.lens_radius == 0.0, (r,)),
        is_light0=jnp.zeros((r,), bool),
    )
    e_alpha1 = e_v0.alpha * (
        jnp.abs(dot(e_ray_d, lens_n)) / we_dir_pdf
    )[:, None]
    e_steps, s0_info, e_zero = _generate_subpath(
        scene, lens_p, e_ray_d, e_alpha1, we_dir_pdf, dir_local[..., 2],
        jnp.zeros((r,), bool), lens_p, False, seed, pid_c, sample_id, hero,
        jnp.zeros((r,), bool), lambdas, max_eye_verts - 1, 0,
    )
    if e_zero is not None:
        upd, rev_area, rev_rr = e_zero
        e_v0 = e_v0._replace(
            rev_area_pdf=jnp.where(upd, rev_area, e_v0.rev_area_pdf),
            rev_rr_prob=jnp.where(upd, rev_rr, e_v0.rev_rr_prob),
        )
    ev = _stack([e_v0] + e_steps)

    # ------------------------------------------------------------------
    # s = 0 implicit contributions (during eye generation, cpp:286-309).
    # ------------------------------------------------------------------
    for i, (emit_ok, contrib, ext1, ext2, wl_sel_i) in enumerate(s0_info):
        t_count = i + 2  # vertices: v0 (lens) + i+1 surface vertices
        w = _mis_weight_static(
            ext1, jnp.ones_like(ext1), ext2, jnp.ones_like(ext2),
            jnp.zeros_like(ext1), jnp.zeros_like(ext1),
            jnp.zeros_like(ext1), jnp.zeros_like(ext1),
            0, t_count,
            lv.area_pdf, lv.rr_prob, lv.rev_area_pdf, lv.rev_rr_prob, lv.delta,
            ev.area_pdf, ev.rr_prob, ev.rev_area_pdf, ev.rev_rr_prob, ev.delta,
        )
        c = contrib * w[:, None]
        if spectral:
            # x N when the hero wavelength was collapsed (cpp:305-306); the
            # 1/selectWLPDF lives in the eye vertex-0 alpha already.
            c = jnp.where(wl_sel_i[:, None], c * s_dim, c)
        film = film_add(film, pid_c, c, emit_ok)

    # ------------------------------------------------------------------
    # Connections s >= 1, t >= 1 (cpp:165-254).
    # ------------------------------------------------------------------
    n_l = 1 + len(l_steps)
    n_e = 1 + len(e_steps)
    for t in range(1, n_e + 1):
        for s in range(1, n_l + 1):
            film = _connect(
                scene, film, lv, ev, s, t, hero, lambdas, spectral, s_dim,
                pid_c, width, height, cam, select_wl_pdf, film_add,
            )
    return film


def _connect(scene, film, lv, ev, s, t, hero, lambdas, spectral, s_dim,
             pid_c, width, height, cam, select_wl_pdf, film_add):
    r = pid_c.shape[0]
    li = s - 1
    ei = t - 1
    valid = lv.valid[:, li] & ev.valid[:, ei]

    conn = lv.p[:, li] - ev.p[:, ei]
    dist2 = jnp.maximum(jnp.sum(conn * conn, axis=-1), 1e-12)
    conn_dir = conn / jnp.sqrt(dist2)[:, None]
    cos_light = jnp.abs(dot(conn_dir, lv.gn[:, li]))
    cos_eye = jnp.abs(dot(conn_dir, ev.gn[:, ei]))
    g = cos_eye * cos_light / dist2

    # --- light end DDF -------------------------------------------------
    l_conn_sn = frame_to_local(
        lv.tangent[:, li], lv.bitangent[:, li], lv.sn[:, li], -conn_dir
    )
    l_gn_sn = _gn_sn(lv, li)
    if s == 1:
        # EDF endpoint: DiffuseEDF (value 1/pi above the surface).
        upper = l_conn_sn[..., 2] > 0
        l_ddf = jnp.where(upper[:, None], _INV_PI, 0.0) * jnp.ones((r, s_dim))
        l_ext1_dir_pdf = jnp.where(upper, l_conn_sn[..., 2] * _INV_PI, 0.0)
        e_ext2_dir_pdf = jnp.zeros((r,))
        l_rev_ddf = jnp.zeros((r, s_dim))
    else:
        l_lobes = gather_lobes(scene, lv.mat_id[:, li], lv.uv[:, li],
                               lv.p[:, li], lambdas)
        wo_l = lv.dir_in_sn[:, li]
        l_ddf = bsdf_evaluate(l_lobes, wo_l, l_conn_sn, l_gn_sn, hero,
                              adjoint=True)
        l_ext1_dir_pdf = bsdf_pdf(l_lobes, wo_l, l_conn_sn, l_gn_sn, hero)
        e_ext2_dir_pdf = bsdf_pdf(l_lobes, l_conn_sn, wo_l, l_gn_sn, hero)
        l_rev_ddf = bsdf_evaluate(l_lobes, l_conn_sn, wo_l, l_gn_sn, hero,
                                  adjoint=False)

    # --- eye end DDF ----------------------------------------------------
    e_conn_sn = frame_to_local(
        ev.tangent[:, ei], ev.bitangent[:, ei], ev.sn[:, ei], conn_dir
    )
    e_gn_sn = _gn_sn(ev, ei)
    if t == 1:
        # IDF endpoint (perspective): evaluate + calculatePixel
        # (PerspectiveCamera.cpp:77-99).
        op_w, op_h, img_area = camera_derived(cam)
        zsafe = jnp.where(e_conn_sn[..., 2] <= 1e-6, 1e-6, e_conn_sn[..., 2])
        pf = e_conn_sn * (cam.obj_dist / zsafe)[:, None] + jnp.stack(
            [cam.lens_radius * ev.uv[:, ei, 0],
             cam.lens_radius * ev.uv[:, ei, 1],
             jnp.zeros((r,))], axis=-1,
        )
        in_img = (
            (pf[..., 0] >= -op_w * 0.5) & (pf[..., 0] <= op_w * 0.5)
            & (pf[..., 1] >= -op_h * 0.5) & (pf[..., 1] <= op_h * 0.5)
            & (e_conn_sn[..., 2] > 0)
        )
        e_ddf = jnp.where(in_img[:, None], 1.0, 0.0) * jnp.ones((r, s_dim))
        e_ext1_dir_pdf = jnp.where(
            in_img,
            (cam.img_dist ** 2) / jnp.maximum(zsafe ** 3 * img_area, 1e-12),
            0.0,
        )
        l_ext2_dir_pdf = jnp.zeros((r,))
        e_rev_ddf = jnp.zeros((r, s_dim))
        smp_x = 0.5 - pf[..., 0] / op_w
        smp_y = 0.5 - pf[..., 1] / op_h
        hit_px = jnp.clip(
            (smp_x * width).astype(jnp.int32), 0, width.astype(jnp.int32) - 1
        )
        hit_py = jnp.clip(
            (smp_y * height).astype(jnp.int32), 0, height.astype(jnp.int32) - 1
        )
        splat_pix = (
            hit_py.astype(jnp.uint32) * width.astype(jnp.uint32)
            + hit_px.astype(jnp.uint32)
        )
    else:
        e_lobes = gather_lobes(scene, ev.mat_id[:, ei], ev.uv[:, ei],
                               ev.p[:, ei], lambdas)
        wo_e = ev.dir_in_sn[:, ei]
        e_ddf = bsdf_evaluate(e_lobes, wo_e, e_conn_sn, e_gn_sn, hero,
                              adjoint=False)
        e_ext1_dir_pdf = bsdf_pdf(e_lobes, wo_e, e_conn_sn, e_gn_sn, hero)
        l_ext2_dir_pdf = bsdf_pdf(e_lobes, e_conn_sn, wo_e, e_gn_sn, hero)
        e_rev_ddf = bsdf_evaluate(e_lobes, e_conn_sn, wo_e, e_gn_sn, hero,
                                  adjoint=True)
        splat_pix = pid_c

    # wavelength collapse probability (cpp:194-196) — tracked flags omitted
    # per-vertex; conservative: no collapse scaling for connections (delta
    # glass connections have zero DDF anyway).
    connection = l_ddf * (g / 1.0)[:, None] * e_ddf
    nonzero = jnp.any(connection != 0.0, axis=-1)
    vis = test_visibility(scene, ev.p[:, ei], lv.p[:, li])
    valid = valid & nonzero & vis

    # 1st/2nd extension pdfs (cpp:207-232)
    l_ext1_area = l_ext1_dir_pdf * cos_eye / dist2
    if s > 1:
        l_ext1_rr = jnp.minimum(
            importance(
                l_ddf * (cos_light / jnp.maximum(l_ext1_dir_pdf, 1e-30))[:, None],
                hero,
            ),
            1.0,
        )
    else:
        l_ext1_rr = jnp.ones((r,))
    if t > 1:
        prev_p = ev.p[:, ei - 1]
        d2 = jnp.maximum(jnp.sum((ev.p[:, ei] - prev_p) ** 2, axis=-1), 1e-12)
        dir2 = (ev.p[:, ei] - prev_p) / jnp.sqrt(d2)[:, None]
        l_ext2_area = l_ext2_dir_pdf * jnp.abs(
            dot(ev.gn[:, ei - 1], dir2)
        ) / d2
        l_ext2_rr = jnp.minimum(
            importance(
                e_rev_ddf * (jnp.abs(dot(e_gn_sn, ev.dir_in_sn[:, ei]))
                             / jnp.maximum(l_ext2_dir_pdf, 1e-30))[:, None],
                hero,
            ),
            1.0,
        )
    else:
        l_ext2_area = jnp.zeros((r,))
        l_ext2_rr = jnp.zeros((r,))

    e_ext1_area = e_ext1_dir_pdf * cos_light / dist2
    if t > 1:
        e_ext1_rr = jnp.minimum(
            importance(
                e_ddf * (cos_eye / jnp.maximum(e_ext1_dir_pdf, 1e-30))[:, None],
                hero,
            ),
            1.0,
        )
    else:
        e_ext1_rr = jnp.ones((r,))
    if s > 1:
        prev_p = lv.p[:, li - 1]
        d2 = jnp.maximum(jnp.sum((lv.p[:, li] - prev_p) ** 2, axis=-1), 1e-12)
        dir2 = (lv.p[:, li] - prev_p) / jnp.sqrt(d2)[:, None]
        e_ext2_area = e_ext2_dir_pdf * jnp.abs(
            dot(lv.gn[:, li - 1], dir2)
        ) / d2
        e_ext2_rr = jnp.minimum(
            importance(
                l_rev_ddf * (jnp.abs(dot(l_gn_sn, lv.dir_in_sn[:, li]))
                             / jnp.maximum(e_ext2_dir_pdf, 1e-30))[:, None],
                hero,
            ),
            1.0,
        )
    else:
        e_ext2_area = jnp.zeros((r,))
        e_ext2_rr = jnp.zeros((r,))

    w = _mis_weight_static(
        l_ext1_area, l_ext1_rr, l_ext2_area, l_ext2_rr,
        e_ext1_area, e_ext1_rr, e_ext2_area, e_ext2_rr,
        s, t,
        lv.area_pdf, lv.rr_prob, lv.rev_area_pdf, lv.rev_rr_prob, lv.delta,
        ev.area_pdf, ev.rr_prob, ev.rev_area_pdf, ev.rev_rr_prob, ev.delta,
    )
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    contribution = (
        lv.alpha[:, li] * connection * ev.alpha[:, ei] * w[:, None]
    )
    return film_add(film, splat_pix, contribution, valid)


def render_bpt(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_light_verts: int = 4,
    max_eye_verts: int = 4,
    ray_batch: int | None = None,
    sample_offset: int = 0,
):
    """Full-frame BPT render -> (H, W, 3) linear RGB mean radiance."""
    from ..spectrum.spectral import NUM_STRATA, strata_to_rgb

    assert not scene.has_env, (
        "BPT does not include environment-light strategies yet; use PT"
    )
    n_pix = width * height
    spectral = scene.stex.spectral
    s_film = NUM_STRATA if spectral else scene.stex.value.shape[-1]
    batch = int(ray_batch or min(n_pix, 65536))
    n_batches = -(-n_pix // batch)

    film = jnp.zeros((n_pix, s_film), jnp.float32)
    w_j = jnp.int32(width)
    h_j = jnp.int32(height)
    seed_j = jnp.uint32(seed)
    for i in range(spp):
        for b in range(n_batches):
            pixel_id = jnp.arange(b * batch, (b + 1) * batch, dtype=jnp.uint32)
            sample_id = jnp.full((batch,), sample_offset + i, jnp.uint32)
            film = bpt_batch(
                scene, pixel_id, sample_id, seed_j, w_j, h_j, film,
                max_light_verts, max_eye_verts,
            )
    img = film / spp
    img = img.reshape(height, width, s_film)
    if spectral:
        img = strata_to_rgb(img)
    return img
