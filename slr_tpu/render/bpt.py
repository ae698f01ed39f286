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

* environment lights as full BPT strategies: light subpaths can start on the
  infinite sphere (InfiniteSphereSurfaceObject::sampleRay,
  SurfaceObject.cpp:187-209 — parallel rays from an offset disk, IBLEDF with
  pdf 1/(pi R^2)), eye rays escaping to the env contribute the s = 0 term
  with proper MIS, and s = 1 connections target atInfinity vertices with
  dist2 = 1 and open shadow rays;
* light subpaths sample with the adjoint BSDF forms (eta^2 refraction flip +
  wo-based shading-normal correction, basic_BSDFs.cpp:144-149);
* connections scale by 1/wlProb when either subpath collapsed the hero
  wavelength (cpp:194-196), tracked per vertex in `wl_flag`.

Wavefront form: subpaths have a static maximum vertex count; the whole
wavefront builds its vertex SoA tables in lockstep (masked lanes idle).
The connection stage is vectorized over the s axis — its vertex tables are
vertex-major (V, R, ...) via `_prepend_v0` — and MIS weights come from the
O(V^2) incremental partial sums of `_mis_incremental` (the literal
reference walk survives as `_mis_weight_static`, lane-major, test-only).
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
    cross,
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
    sample_continuous_2d,
    sample_discrete_1d,
)
from ..scene.types import CameraKind, FlatScene
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
    """Subpath vertex SoA. Generation emits bounce-major (R, V, ...) steps;
    the connection stage works on the vertex-major (V, R, ...) tables built
    by `_prepend_v0` (so the vectorized s axis IS the leading array axis).
    `_mis_weight_static` alone still takes the lane-major (R, V) layout."""

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
    wl_flag: Array       # (R, V) hero wavelength collapsed on arrival
                         # (BPTVertex wlFlags, BPT cpp:194-196)
    at_inf: Array        # (R, V) environment-sphere vertex (atInfinity):
                         # p is a unit direction, dist2 = 1 in connections


def _prepend_v0(v0: Vertices, steps: Vertices) -> Vertices:
    """Endpoint vertex + bounce-major scan output (V, R, ...) -> the
    vertex-major (V + 1, R, ...) table the connection stage indexes/
    vectorizes over. (Vertex-major so the s axis of the vectorized
    connection stage IS the leading array axis — no transposes.)"""
    return _tree_prepend(v0, steps)


def _tree_at(tree, i: int):
    """Slice a stacked pytree (e.g. per-vertex LobeBatch) at leading index."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _tree_prepend(first, stacked):
    """Prepend one (R, ...) pytree as row 0 of a (V, R, ...) stacked tree."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b], axis=0), first, stacked)


def _safe_div(a, b):
    return a / jnp.where(b <= 0, 1e30, b)


def _mis_incremental(v: Vertices, n: int, min_idx: int) -> tuple:
    """Per-subpath recursive MIS quantities (calculateMISWeight, BPT
    cpp:353-414, reorganised): the weight walk's inner ratio chains depend
    only on per-vertex pdf products, so the sum over all "shorten by >= 2"
    strategies collapses to one recursively-built partial sum per endpoint
    index — O(V) total instead of O(V) per (s, t) pair (O(V^3) -> O(V^2)
    for the whole connection stage).

    For a walk that shortens this subpath starting at endpoint k - 1 down to
    vertex `min_idx` (min 1 on the eye side: the lens vertex is never a
    strategy; min 0 on the light side), the static code accumulates
        rec += Zb[k-1] * c1^2 + (c1 c2)^2 * S[k]
    where c1, c2 are the two connection-dependent boundary ratios and
        S[k] = Zfull[k-2] + (N[k-3] / D[k-3])^2 * S[k-1],
        S[min_idx + 2] = Zfull[min_idx],  S[<= min_idx + 1] = 0,
    with D[i] = areaPDF[i] * RRProb[i], N[i] = revAreaPDF[i] * revRRProb[i],
    Zb[i] = !delta[i], Zfull[i] = !(delta[i] | delta[i+1]) (adjacent-delta
    strategy skips, cpp:372-377).

    Returns (D (n,R), Zb (n,R) float, S (n+1,R) stacked by k)."""
    d_ = v.area_pdf * v.rr_prob
    zb = jnp.logical_not(v.delta).astype(jnp.float32)
    n_v = v.rev_area_pdf * v.rev_rr_prob
    zfull = jnp.logical_not(v.delta[:-1] | v.delta[1:]).astype(jnp.float32)
    r = d_.shape[1]
    zero = jnp.zeros((r,), jnp.float32)
    s_list = [zero] * min(min_idx + 2, n + 1)
    if min_idx + 2 <= n:
        s_list.append(zfull[min_idx])
    for k in range(min_idx + 3, n + 1):
        f = _safe_div(n_v[k - 3], d_[k - 3])
        s_list.append(zfull[k - 2] + f * f * s_list[-1])
    return d_, zb, jnp.stack(s_list, axis=0)


def _sorted_cast(scene, o, d, active, f=None):
    """Closest-hit with a coherence sort applied ONLY around the kernel:
    rays are permuted by (active, octant, origin Morton) so terminated
    lanes pack into skippable blocks and worklists shorten, then the Hit is
    un-permuted — the path state itself stays in lane order (subpath
    vertex tables must keep lane identity across steps). `f` is the per-ray
    shutter fraction (BPT cpp:104: one time sample per pixel sample)."""
    from ..core.permute import permute_rows, unpermute_rows
    from .pt import _ray_sort_key, scene_intersect_alpha

    # contact=False: subpath/connection ray origins sit ON geometry
    # (tn ~ 0, no grouping win) and the contact variant's extra ops
    # perturb XLA's fusion of this program ~27% (measured, r5).
    key = _ray_sort_key(scene, o, d, active, contact=False)
    order = jnp.argsort(key)
    if f is None:
        o_s, d_s, act_s = permute_rows((o, d, active), order)
        f_s = None
    else:
        o_s, d_s, act_s, f_s = permute_rows((o, d, active, f), order)
    hit = scene_intersect_alpha(scene, o_s, d_s, f=f_s, active=act_s)
    fields = (hit.t, hit.tri, hit.b0, hit.b1, hit.mask) + (
        () if hit.inst is None else (hit.inst,))
    out = unpermute_rows(fields, order)
    return type(hit)(t=out[0], tri=out[1], b0=out[2], b1=out[3],
                     mask=out[4],
                     inst=None if hit.inst is None else out[5])


def _sorted_occluded(scene, o, d, tmax, active, f=None):
    """Occlusion query with the same sort-around-the-kernel treatment."""
    from ..accel.intersect import RAY_EPSILON
    from ..core.permute import permute_rows, unpermute_rows
    from .pt import _ray_sort_key, scene_occluded

    # contact=False: subpath/connection ray origins sit ON geometry
    # (tn ~ 0, no grouping win) and the contact variant's extra ops
    # perturb XLA's fusion of this program ~27% (measured, r5).
    key = _ray_sort_key(scene, o, d, active, contact=False)
    order = jnp.argsort(key)
    if f is None:
        o_s, d_s, tmax_s, act_s = permute_rows((o, d, tmax, active), order)
        f_s = None
    else:
        o_s, d_s, tmax_s, act_s, f_s = permute_rows(
            (o, d, tmax, active, f), order)
    occ = scene_occluded(scene, o_s, d_s, RAY_EPSILON, tmax_s, f=f_s,
                         active=act_s)
    return unpermute_rows((occ,), order)[0]


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
    f_time: Array | None = None,
    unroll: int | bool = 1,
):
    """Trace a subpath (generateSubPath, BPT cpp:261-349).

    Rolled into ONE `lax.scan` over the bounce axis: the fully-unrolled form
    compiled to a ~24k-instruction entry computation whose host-side thunk
    dispatch (through the remote-device tunnel) dominated wall time — the
    device profile showed every ablation (fake casts, fake gathers, null BSDF
    evals) leaving wall time unchanged. The scan traces the bounce body once.

    Returns (steps, s0_info, zero_step, lobes, alive) where `steps` is a
    Vertices pytree with leading axis V (bounce-major), `s0_info` a tuple of
    stacked (V, ...) arrays for the eye path (None for light paths),
    `zero_step` the reverse-pdf update for the pre-loop vertex, `lobes` the
    per-vertex LobeBatch stacked (V, ...) for reuse by the connection
    stage, and `alive` (R,) bool — the subpath was still extending when it
    hit the static vertex cap (the lane's estimate is cap-CLIPPED; the
    reference's subpaths are RR-unbounded, BPT cpp:258-350, so callers
    re-run clipped lanes at a deeper cap — render_bpt's tiers). `f_time`
    is the per-lane shutter fraction threaded through every cast (the
    reference samples one time per pixel sample and passes it to
    intersect/testVisibility, BPT cpp:104,126,148,201)."""
    r = o.shape[0]
    s_dim = alpha0.shape[-1]

    carry0 = (
        alpha0, dir_pdf0, cos_last0, delta0, dir_pdf0 > 0, wl_selected0,
        o, d, prev_p, jnp.ones((r,), jnp.float32),
    )

    def body(carry, bounce_id):
        (alpha, dir_pdf, cos_last, delta, active, wl_sel, ray_o, ray_d,
         prev, rr_prob) = carry
        hit = _sorted_cast(scene, ray_o, ray_d, active, f=f_time)
        sp = resolve_sp(scene, hit, ray_o, ray_d, f=f_time)
        ok = active & hit.mask
        # Escaped active eye rays become implicit env-sphere vertices
        # (atInfinity hit, BPT cpp:311-314): they contribute the s=0 env term
        # then terminate, exactly like the reference's pop_back.
        esc = (
            active & jnp.logical_not(hit.mask)
            if (scene.has_env and not adjoint)
            else jnp.zeros((r,), bool)
        )

        dsp_ = sp.p - prev
        dist2 = jnp.maximum(dot(dsp_, dsp_), 1e-12)
        wo = frame_to_local(sp.tangent, sp.bitangent, sp.sn, -ray_d)
        gn_sn = frame_to_local(sp.tangent, sp.bitangent, sp.sn, sp.gn)
        area_pdf = dir_pdf * jnp.abs(dot(wo, gn_sn)) / dist2
        if scene.has_env and not adjoint:
            # Env vertex: dist2 = 1, |cos| = 1 (gn = -dir); only its areaPDF
            # and RR slots are read by the s=0 MIS walk.
            area_pdf = jnp.where(esc, dir_pdf, area_pdf)

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
            wl_flag=wl_sel,
            at_inf=jnp.zeros((r,), bool),
        )

        if not adjoint:
            # s = 0 data: the eye path hit an emitter (BPT cpp:286-309) or
            # escaped to the environment sphere.
            le = emitted_radiance(scene, sp.mat_id, sp.uv, dot(-ray_d, sp.sn),
                                  lambdas)
            l_prob = _area_light_prob(scene)
            ext1 = l_prob * sp.area_pdf               # lightProb * areaPDF
            # EDF pdf toward the previous vertex: cosine hemisphere
            edf_pdf = jnp.maximum(wo[..., 2], 0.0) * _INV_PI
            ext2 = edf_pdf * cos_last / dist2
            emit_ok = ok & is_emissive(scene.materials, sp.mat_id)
            contrib = alpha * le
            if scene.has_env:
                from .pt import _env_radiance, _env_uv_from_direction
                from ..core.sampling import pdf_continuous_2d

                eu, ev_ = _env_uv_from_direction(ray_d)
                env_le = _env_radiance(scene, eu, ev_, lambdas)
                env_uvpdf = pdf_continuous_2d(scene.env.dist, eu, ev_)
                env_area_pdf = env_uvpdf / jnp.maximum(
                    2.0 * jnp.pi**2 * jnp.sin(ev_ * jnp.pi), 1e-8
                )
                disc_pdf = 1.0 / (
                    jnp.pi * scene.world_radius * scene.world_radius
                )
                ext1 = jnp.where(esc, scene.lights.env_prob * env_area_pdf,
                                 ext1)
                ext2 = jnp.where(esc, disc_pdf * cos_last, ext2)
                contrib = jnp.where(esc[:, None], alpha * env_le, contrib)
                emit_ok = emit_ok | esc
            s0 = (emit_ok, contrib, ext1, ext2, wl_sel)
        else:
            s0 = ()

        # BSDF sample to extend. Light subpaths sample with the adjoint form
        # (eta^2 flip + wo-based sn-correction, basic_BSDFs.cpp:144-149).
        # The gathered lobes are ALSO the connection-time DDF closures for
        # this vertex — kept and returned so _connect never regathers them
        # (the per-(s,t) regathers were ~2x the whole BPT device profile).
        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, lambdas)
        uc = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_COMPONENT)
        u0 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_U)
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_V)
        smp = bsdf_sample(lobes, wo, gn_sn, hero, wl_sel, uc, u0, u1,
                          adjoint=adjoint)
        # UNLIKE the PT renderer (PathTracingRenderer.cpp:210-213, which
        # divides dirPDF by NumComponents at the dispersive sampling site),
        # the reference BPT keeps the RAW pdf in subpath weights and MIS
        # (generateSubPath, BidirectionalPathTracingRenderer.cpp:316-327) and
        # accounts for the hero-collapse ONLY at contribution time: x N on
        # s0/t1 contributions (:305-306) and /wlProb on connections
        # (:194-197). Dividing here too double-counted the factor (x16
        # bright on every dispersive glass path).
        new_dir_pdf = smp.pdf
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
        # (vtxNextToLast.revAreaPDF / revRRProb, cpp:341-343). Delta bounces
        # use the sampler's BSDFReverseInfo — the generic evaluators are 0
        # at delta directions, and zeros here killed every MIS ratio term
        # beyond a specular vertex (overweighting specular paths).
        rev_pdf = jnp.where(
            smp.is_delta,
            smp.rev_pdf,
            bsdf_pdf(lobes, smp.wi, wo, gn_sn, hero),
        )
        rev_fs = jnp.where(
            smp.is_delta[..., None],
            smp.rev_fs,
            bsdf_evaluate(lobes, smp.wi, wo, gn_sn, hero,
                          adjoint=not adjoint),
        )
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

        new_carry = (
            alpha * weight,
            new_dir_pdf,
            cos_in,
            smp.is_delta,
            sample_ok & survive,
            wl_sel_next,
            sp.p,
            frame_from_local(sp.tangent, sp.bitangent, sp.sn, smp.wi),
            sp.p,
            new_rr,
        )
        return new_carry, (step, (upd, rev_area, rev_rr), s0, lobes)

    if max_verts == 0:
        # Degenerate cap (e.g. max_eye_verts=1: lens vertex only) — emit
        # empty (0, R, ...) stacked outputs with the body's structure.
        _, ys_sd = jax.eval_shape(body, carry0, jnp.zeros((), jnp.uint32))
        steps, _, s0_info, lobes = jax.tree_util.tree_map(
            lambda sh: jnp.zeros((0,) + sh.shape, sh.dtype), ys_sd)
        zero_step = (jnp.zeros((r,), bool), jnp.ones((r,), jnp.float32),
                     jnp.ones((r,), jnp.float32))
        return (steps, (s0_info if s0_info else None), zero_step, lobes,
                dir_pdf0 > 0)

    bounce_ids = jnp.uint32(bounce_offset) + jnp.arange(
        max_verts, dtype=jnp.uint32)
    carry_end, (steps, revs, s0_info, lobes) = jax.lax.scan(
        body, carry0, bounce_ids, unroll=unroll)
    alive = carry_end[4]

    # Each bounce's reverse pdf/fs belongs to the PREVIOUS vertex
    # (vtxNextToLast, cpp:341-343): shift the rev stream back by one step.
    # Bounce 0's entry targets the pre-loop vertex (returned as zero_step);
    # the final vertex keeps the placeholder ones.
    upd_s, rev_area_s, rev_rr_s = revs
    ones_tail = jnp.ones((1, r), jnp.float32)
    steps = steps._replace(
        rev_area_pdf=jnp.concatenate(
            [jnp.where(upd_s[1:], rev_area_s[1:], 1.0), ones_tail], axis=0),
        rev_rr_prob=jnp.concatenate(
            [jnp.where(upd_s[1:], rev_rr_s[1:], 1.0), ones_tail], axis=0),
    )
    zero_step = (upd_s[0], rev_area_s[0], rev_rr_s[0])
    if not s0_info:
        s0_info = None
    return steps, s0_info, zero_step, lobes, alive


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


@partial(jax.jit, static_argnames=("max_light_verts", "max_eye_verts",
                                  "pid_contiguous", "clip_at_cap"))
def bpt_batch(
    scene: FlatScene,
    pixel_id: Array,
    sample_id: Array,
    seed: Array,
    width: Array,
    height: Array,
    film: Array,
    max_light_verts: int = 8,
    max_eye_verts: int = 8,
    pid_contiguous: bool = False,
    lane_mask: Array | None = None,
    clip_at_cap: bool = False,
) -> Array:
    """One BPT sample pass for a pixel batch; scatter-adds contributions
    (including t=1 splats) into `film` (H*W, S) and returns it.
    `pid_contiguous` promises pixel_id is a contiguous in-range arange, so
    the own-pixel accumulation is a dynamic-slice add instead of a
    scatter-add (TPU scatter lowers sort-based; ~5 ms/pass saved)."""
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

    # One shutter-time sample per pixel sample (BPT cpp:104), threaded
    # through subpath generation AND connection visibility so animated/
    # instanced scenes get motion blur from every strategy.
    if scene.instances is not None:
        f_time = rng.uniform(seed, pid_c, sample_id, 0, Decision.TIME)
    else:
        f_time = None

    # Deferred film writes: own-pixel contributions accumulate into a dense
    # per-lane buffer (strata binning is linear and all of a lane's
    # contributions share its wavelength set, so one bin + one scatter at
    # batch end suffices); t=1 lens splats queue for one combined scatter.
    # Besides replacing ~s_max*t_max scatter-adds with two, this works
    # around a TPU backend compiler crash (SIGILL in tpu_compile_helper)
    # triggered by per-strategy scatter-adds inside this graph.
    own_acc = [jnp.zeros((r, s_dim), jnp.float32)]
    splat_q: list = []
    bank_cell = [None]   # set after subpath generation when clip_at_cap

    def film_add(film, pix_idx, contribution, valid, own: bool = True):
        if lane_mask is not None:
            # Splat batches may be an s-major tiling of the lane axis.
            valid = valid & jnp.tile(
                lane_mask, valid.shape[0] // lane_mask.shape[0])
        if bank_cell[0] is not None:
            valid = valid & jnp.tile(
                bank_cell[0], valid.shape[0] // bank_cell[0].shape[0])
        c = jnp.where(valid[:, None], contribution, 0.0)
        if own:
            own_acc[0] = own_acc[0] + c
        else:
            splat_q.append((pix_idx, c))
        return film

    def film_flush(film):
        own = own_acc[0]
        if spectral:
            own = bin_to_strata(lambdas, own)
        if pid_contiguous:
            start = pid_c[0]
            cur = jax.lax.dynamic_slice(
                film, (start, jnp.uint32(0)), (r, film.shape[1]))
            film = jax.lax.dynamic_update_slice(
                film, cur + own, (start, jnp.uint32(0)))
        else:
            film = film.at[pid_c].add(own)
        if splat_q:
            idx = jnp.concatenate([p for p, _ in splat_q])
            vals = [
                bin_to_strata(
                    jnp.tile(lambdas, (v.shape[0] // lambdas.shape[0], 1)), v)
                if spectral else v
                for _, v in splat_q]
            film = film.at[idx].add(jnp.concatenate(vals, axis=0))
        return film

    # ------------------------------------------------------------------
    # Light subpath (BPT cpp:117-143). With an environment light, lanes pick
    # env-vs-area by importance and env lanes start on the infinite sphere
    # (InfiniteSphereSurfaceObject::sampleRay, SurfaceObject.cpp:187-209):
    # position = importance-sampled direction (atInfinity vertex), EDF is
    # IBLEDF (deterministic inward direction, pdf 1/(pi R^2)), and the ray
    # origin is pushed outside the scene with a disk offset perpendicular to
    # the direction so parallel rays cover the whole world.
    # ------------------------------------------------------------------
    u_sel = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_SELECT)
    lu0 = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_POS_U)
    lu1 = rng.uniform(seed, pid_c, sample_id, 0, Decision.LIGHT_POS_V)
    env_prob = scene.lights.env_prob
    if scene.has_env:
        is_env0 = u_sel < env_prob
        u_area = jnp.clip(
            (u_sel - env_prob) / jnp.maximum(1.0 - env_prob, 1e-12),
            0.0, 1.0 - 1e-7,
        )
    else:
        is_env0 = jnp.zeros((r,), bool)
        u_area = u_sel
    idx, pmf, _ = sample_discrete_1d(scene.lights.dist, u_area)
    light_tri = scene.lights.tri_idx[idx]
    light_prob = (1.0 - env_prob) * pmf
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
    l_ray_o = lp.p
    cos_first = edf_dir[..., 2]

    v0_p, v0_gn, v0_tan = lp.p, lp.gn, lp.tangent
    v0_bit, v0_sn, v0_uv = lp.bitangent, lp.sn, lp.uv

    if scene.has_env:
        from .pt import _env_direction, _env_radiance

        ex, ey, uvpdf = sample_continuous_2d(scene.env.dist, lu0, lu1)
        e_phi = ex * 2.0 * jnp.pi
        e_theta = ey * jnp.pi
        p_env = _env_direction(e_phi, e_theta)
        env_area_pdf = env_prob * uvpdf / jnp.maximum(
            2.0 * jnp.pi**2 * jnp.sin(e_theta), 1e-8
        )
        gn_env = -p_env
        # shading frame on the sphere (SurfaceObject.cpp:175-178)
        tan_env = normalize(jnp.stack(
            [-jnp.cos(e_phi), jnp.zeros_like(e_phi), -jnp.sin(e_phi)],
            axis=-1,
        ))
        bit_env = cross(gn_env, tan_env)
        le0_env = jnp.pi * _env_radiance(scene, ex, ey, lambdas)
        disc_pdf = 1.0 / (jnp.pi * scene.world_radius * scene.world_radius)
        dx, dy = concentric_sample_disk(eu0, eu1)
        origin_env = (
            scene.world_center[None, :]
            + 1.1 * scene.world_radius * p_env
            + scene.world_radius * (dx[:, None] * tan_env
                                    + dy[:, None] * bit_env)
        )
        e0 = is_env0[:, None]
        v0_p = jnp.where(e0, p_env, v0_p)
        v0_gn = jnp.where(e0, gn_env, v0_gn)
        v0_tan = jnp.where(e0, tan_env, v0_tan)
        v0_bit = jnp.where(e0, bit_env, v0_bit)
        v0_sn = jnp.where(e0, gn_env, v0_sn)
        v0_uv = jnp.where(e0, jnp.stack([ex, ey], axis=-1), v0_uv)
        le0 = jnp.where(e0, le0_env, le0)
        light_area_pdf = jnp.where(is_env0, env_area_pdf, light_area_pdf)
        l_ray_d = jnp.where(e0, gn_env, l_ray_d)
        l_ray_o = jnp.where(e0, origin_env, l_ray_o)
        edf_pdf = jnp.where(is_env0, disc_pdf, edf_pdf)
        cos_first = jnp.where(is_env0, 1.0, cos_first)

    l_v0 = Vertices(
        valid=jnp.ones((r,), bool),
        p=v0_p, gn=v0_gn, tangent=v0_tan, bitangent=v0_bit,
        sn=v0_sn, uv=v0_uv, mat_id=lp.mat_id,
        dir_in_sn=jnp.zeros((r, 3)),
        alpha=le0 / jnp.maximum(light_area_pdf, 1e-30)[:, None],
        area_pdf=light_area_pdf,
        rr_prob=jnp.ones((r,), jnp.float32),
        rev_area_pdf=jnp.ones((r,), jnp.float32),
        rev_rr_prob=jnp.ones((r,), jnp.float32),
        delta=jnp.zeros((r,), bool),
        is_light0=jnp.ones((r,), bool),
        wl_flag=jnp.zeros((r,), bool),
        at_inf=is_env0,
    )
    cos_o = jnp.where(is_env0, 1.0, jnp.abs(dot(l_ray_d, lp.gn)))
    l_alpha1 = l_v0.alpha * le1 * (cos_o / edf_pdf)[:, None]
    l_steps, _, l_zero, l_lobes, l_alive = _generate_subpath(
        scene, l_ray_o, l_ray_d, l_alpha1, edf_pdf, cos_first,
        jnp.zeros((r,), bool), l_ray_o, True, seed, pid_c, sample_id, hero,
        jnp.zeros((r,), bool), lambdas, max_light_verts - 1,
        _LIGHT_BOUNCE_OFFSET, f_time=f_time,
    )
    # light vertex 0 reverse pdfs from the first bounce
    upd, rev_area, rev_rr = l_zero
    l_v0 = l_v0._replace(
        rev_area_pdf=jnp.where(upd, rev_area, l_v0.rev_area_pdf),
        rev_rr_prob=jnp.where(upd, rev_rr, l_v0.rev_rr_prob),
    )
    lv = _prepend_v0(l_v0, l_steps)

    # ------------------------------------------------------------------
    # Eye subpath (BPT cpp:145-163) — perspective camera.
    # ------------------------------------------------------------------
    cam = scene.camera
    lx = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_U)
    ly = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_V)
    jx = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_Y)
    is_equirect = cam.kind == CameraKind.EQUIRECTANGULAR
    # Camera frame axes straight from the matrix columns (transform_vector
    # of a broadcast basis vector builds a graph shape that, fused into the
    # connection math, crashes the TPU backend compiler).
    n3 = cam.to_world[:3, 2]
    x3 = cam.to_world[:3, 0]
    y3 = cross(n3, x3)
    lens_n = jnp.broadcast_to(n3, (r, 3))
    lens_x = jnp.broadcast_to(x3, (r, 3))
    lens_y = jnp.broadcast_to(y3, (r, 3))
    if is_equirect:
        # EquirectangularCamera: delta lens at the origin, IDF sampling
        # phi = phiAngle*u, theta = thetaAngle*v with pdf
        # 1/(phiAngle*thetaAngle*(1-y^2)) (EquirectangularCamera.cpp:54-63).
        dx = jnp.zeros((r,), jnp.float32)
        dy = jnp.zeros((r,), jnp.float32)
        org_local = jnp.zeros((r, 3), jnp.float32)
        lens_p = transform_point(cam.to_world, org_local)
        lens_area_pdf = jnp.float32(1.0)
        sensitivity = jnp.float32(1.0)
        u_e = (px + jx) / width
        v_e = (py + jy) / height
        phi_e = cam.phi_angle * u_e
        theta_e = cam.theta_angle * v_e
        st_e = jnp.sin(theta_e)
        dir_local = jnp.stack(
            [-jnp.sin(phi_e) * st_e, jnp.cos(theta_e),
             jnp.cos(phi_e) * st_e], axis=-1,
        )
        # True lat-long mapping density (see sample_camera_rays_equirect
        # for the documented deviation from the reference's sin^2 pdf).
        we_dir_pdf = 1.0 / (
            cam.phi_angle * cam.theta_angle
            * jnp.maximum(jnp.abs(st_e), 1e-6)
        )
        z_l = dir_local[..., 2]
        v0_delta = jnp.ones((r,), bool)  # Delta0D lens position
    else:
        op_w, op_h, img_area = camera_derived(cam)
        dx, dy = concentric_sample_disk(lx, ly)
        org_local = jnp.stack(
            [cam.lens_radius * dx, cam.lens_radius * dy, jnp.zeros_like(dx)],
            axis=-1,
        )
        lens_p = transform_point(cam.to_world, org_local)
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
        z_l = dir_local[..., 2]
        we_dir_pdf = (cam.img_dist * cam.img_dist) / (
            z_l * z_l * z_l * img_area
        )
        v0_delta = jnp.broadcast_to(cam.lens_radius == 0.0, (r,))
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
        # pinhole/equirect lens position is a delta distribution (Delta0D)
        delta=v0_delta,
        is_light0=jnp.zeros((r,), bool),
        wl_flag=jnp.zeros((r,), bool),
        at_inf=jnp.zeros((r,), bool),
    )
    # cos at the lens in LOCAL space (== dot(e_ray_d, lens_n) under the
    # rigid camera transform; the world-space form crashes the TPU backend
    # compiler — SIGILL in tpu_compile_helper — when fused into this graph).
    e_alpha1 = e_v0.alpha * (jnp.abs(z_l) / we_dir_pdf)[:, None]
    e_steps, s0_info, e_zero, e_lobes, e_alive = _generate_subpath(
        scene, lens_p, e_ray_d, e_alpha1, we_dir_pdf, dir_local[..., 2],
        jnp.zeros((r,), bool), lens_p, False, seed, pid_c, sample_id, hero,
        jnp.zeros((r,), bool), lambdas, max_eye_verts - 1, 0, f_time=f_time,
    )
    # A lane whose subpath was still extending at its static cap carries a
    # cap-CLIPPED estimate (the reference truncates by RR only). With
    # clip_at_cap, such lanes bank NOTHING here — the caller re-runs them
    # at a deeper cap (same RNG keys reproduce the shallow prefix bit-
    # exactly, so the deep run IS the lane's full estimate).
    overflow = l_alive | e_alive
    if lane_mask is not None:
        overflow = overflow & lane_mask
    if clip_at_cap:
        bank_cell[0] = jnp.logical_not(overflow)
    upd, rev_area, rev_rr = e_zero
    e_v0 = e_v0._replace(
        rev_area_pdf=jnp.where(upd, rev_area, e_v0.rev_area_pdf),
        rev_rr_prob=jnp.where(upd, rev_rr, e_v0.rev_rr_prob),
    )
    ev = _prepend_v0(e_v0, e_steps)

    n_l = 1 + l_steps.valid.shape[0]
    n_e = 1 + e_steps.valid.shape[0]
    mis_l = _mis_incremental(lv, n_l, 0)
    mis_e = _mis_incremental(ev, n_e, 1)

    # ------------------------------------------------------------------
    # s = 0 implicit contributions (during eye generation, cpp:286-309),
    # vectorized over the eye-vertex axis (row i <-> t = i + 2) with the
    # incremental MIS partial sums (light side empty at s = 0).
    # ------------------------------------------------------------------
    emit_ok0, contrib0, ext1_0, ext2_0, wl_sel0 = s0_info
    d_e, zb_e, s_e = mis_e
    c1_0 = _safe_div(ext1_0, d_e[1:])
    c2_0 = _safe_div(ext2_0, d_e[:-1])
    w0 = 1.0 / (1.0 + zb_e[1:] * c1_0 * c1_0
                + (c1_0 * c2_0) ** 2 * s_e[2:])
    # Same float32-overflow guard as the connection path: a huge pdf ratio
    # squared can produce inf * 0 = NaN, which emit_ok0 would not gate.
    w0 = jnp.where(jnp.isfinite(w0), w0, 0.0)
    c0 = contrib0 * w0[..., None]
    # x N when the hero wavelength was collapsed (cpp:305-306); the
    # 1/selectWLPDF lives in the eye vertex-0 alpha already. NOT spectral-
    # gated: glass transmission collapses fs to the hero CHANNEL in RGB
    # mode too (lobes.specular_scattering_sample), so the xN compensation
    # must match — the old `if spectral` gate lost 2/3 of every refracted
    # path's energy in RGB (glass_corridor: BPT/PT was 0.35; the reference
    # build's own BPT/PT on the same scene is 0.98).
    c0 = jnp.where(wl_sel0[..., None], c0 * s_dim, c0)
    c0 = jnp.where(emit_ok0[..., None], c0, 0.0).sum(axis=0)
    film = film_add(film, pid_c, c0, jnp.ones((r,), bool))

    # ------------------------------------------------------------------
    # Connections s >= 1, t >= 1 (cpp:165-254): one vectorized strategy
    # level per t, all s at once; one batched any-hit cast per t (batching
    # ALL t-levels into one cast measured WORSE — the 3M-lane coherence
    # sort's gathers outweigh the saved launches).
    # ------------------------------------------------------------------
    if n_l > 1:
        row0 = _tree_at(l_lobes, 0)   # dummy closure for the EDF endpoint
    else:
        row0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros(x.shape[1:], x.dtype), l_lobes)
    lobes_l = _tree_prepend(row0, l_lobes)
    for t in range(1, n_e + 1):
        (o_b, d_b, tmax_b, act_b), contribution, valid, splat_pix, own = \
            _connect_t(
                scene, lv, ev, t, hero, lambdas, spectral, s_dim,
                pid_c, width, height, cam, select_wl_pdf,
                lobes_l, None if t == 1 else _tree_at(e_lobes, t - 2),
                mis_l, mis_e,
            )
        f_b = None if f_time is None else jnp.tile(f_time, n_l)
        vis = jnp.logical_not(
            _sorted_occluded(scene, o_b, d_b, tmax_b, act_b, f=f_b)
        ).reshape(n_l, r)
        ok = valid & vis
        if own:
            c_t = jnp.where(ok[..., None], contribution, 0.0).sum(axis=0)
            film = film_add(film, pid_c, c_t, jnp.ones((r,), bool))
        else:
            film = film_add(
                film, splat_pix,
                contribution.reshape(n_l * r, s_dim),
                ok.reshape(n_l * r),
                own=False,
            )
    film = film_flush(film)
    if clip_at_cap:
        return film, overflow
    return film


def _connect_t(scene, lv, ev, t, hero, lambdas, spectral, s_dim,
               pid_c, width, height, cam, select_wl_pdf,
               lobes_l, e_lobes, mis_l, mis_e):
    """ALL s-strategies of one eye-vertex level t, vectorized over the
    leading light-vertex axis (s = row + 1). The per-(s, t) unrolled form
    paid 64 separate rounds of DDF/pdf/MIS graph per sample; here each t
    costs two batched DDF evaluations + two pdfs on (n_l * R) lanes and an
    O(1) MIS combine from the _mis_incremental partial sums.

    Reference semantics per pair: BidirectionalPathTracingRenderer.cpp
    :165-254 (connection), :353-414 (MIS weight).

    Returns (shadow_query, contribution (n_l, R, S), valid (n_l, R),
    splat_pix, own) with shadow-query fields flattened (n_l * R,) s-major —
    identical ray order to the old per-s concatenation."""
    r = pid_c.shape[0]
    n_l = lv.valid.shape[0]
    ei = t - 1
    valid = lv.valid & ev.valid[ei][None]

    # vmap over the s (light-vertex) axis: no reshapes — flattening the
    # (n_l, R, ...) batches forced physical relayouts of the TPU-tiled
    # arrays that cost more than the whole connection math.
    def v_eval(lob_ax, *in_axes):
        def f(lob, wi, wo, gn, adj):
            return bsdf_evaluate(lob, wi, wo, gn, hero, adjoint=adj)
        return jax.vmap(f, in_axes=(lob_ax,) + in_axes + (None,))

    def v_pdf(lob_ax, *in_axes):
        def f(lob, wi, wo, gn):
            return bsdf_pdf(lob, wi, wo, gn, hero)
        return jax.vmap(f, in_axes=(lob_ax,) + in_axes)

    v_imp = jax.vmap(importance, in_axes=(0, None))

    # atInfinity light endpoint (env light vertex 0): the "position" is a
    # unit direction; getDirectionFrom returns it with dist2 = 1
    # (geometry.cpp:31-41), and cos_light = |dot(p, -p)| = 1 falls out.
    at_l = lv.at_inf                                    # (n_l, R)
    raw = lv.p - ev.p[ei][None]                         # (n_l, R, 3)
    raw2 = jnp.maximum(dot(raw, raw), 1e-12)
    conn = jnp.where(at_l[..., None], lv.p, raw)
    dist2 = jnp.where(at_l, 1.0, raw2)
    conn_dir = conn / jnp.sqrt(
        jnp.maximum(dot(conn, conn), 1e-12)
    )[..., None]
    cos_light = jnp.abs(dot(conn_dir, lv.gn))
    cos_eye = jnp.abs(dot(conn_dir, ev.gn[ei][None]))
    g = cos_eye * cos_light / dist2

    # --- light end DDF (rows >= 1: BSDF; row 0 overwritten with the EDF
    # endpoint: DiffuseEDF value 1/pi above the surface, env lanes IBLEDF
    # value 1/pi pdf 1/(pi R^2) — IBLEDF.cpp:18-29) ----------------------
    l_conn_sn = frame_to_local(lv.tangent, lv.bitangent, lv.sn, -conn_dir)
    l_gn_sn = frame_to_local(lv.tangent, lv.bitangent, lv.sn, lv.gn)
    wo_l = lv.dir_in_sn
    l_ddf = v_eval(0, 0, 0, 0)(lobes_l, wo_l, l_conn_sn, l_gn_sn, True)
    l_ext1_dir_pdf = v_pdf(0, 0, 0, 0)(lobes_l, wo_l, l_conn_sn, l_gn_sn)
    e_ext2_dir_pdf = v_pdf(0, 0, 0, 0)(lobes_l, l_conn_sn, wo_l, l_gn_sn)
    l_rev_ddf = v_eval(0, 0, 0, 0)(lobes_l, l_conn_sn, wo_l, l_gn_sn, False)
    upper = l_conn_sn[0, :, 2] > 0
    l_ddf0 = jnp.where(upper[:, None], _INV_PI, 0.0) * jnp.ones((r, s_dim))
    l_ext1_dir0 = jnp.where(upper, l_conn_sn[0, :, 2] * _INV_PI, 0.0)
    if scene.has_env:
        disc_pdf = 1.0 / (jnp.pi * scene.world_radius ** 2)
        l_ddf0 = jnp.where(at_l[0][:, None], _INV_PI, l_ddf0)
        l_ext1_dir0 = jnp.where(at_l[0], disc_pdf, l_ext1_dir0)
    l_ddf = l_ddf.at[0].set(l_ddf0)
    l_ext1_dir_pdf = l_ext1_dir_pdf.at[0].set(l_ext1_dir0)
    e_ext2_dir_pdf = e_ext2_dir_pdf.at[0].set(0.0)
    l_rev_ddf = l_rev_ddf.at[0].set(0.0)

    # --- eye end DDF ----------------------------------------------------
    e_conn_sn = frame_to_local(
        ev.tangent[ei][None], ev.bitangent[ei][None], ev.sn[ei][None],
        conn_dir)
    e_gn_sn = frame_to_local(
        ev.tangent[ei], ev.bitangent[ei], ev.sn[ei], ev.gn[ei])  # (R, 3)
    if t == 1 and cam.kind == CameraKind.EQUIRECTANGULAR:
        # EquirectangularIDF: evaluate (1 inside the angular window, pdf
        # 1/(phiAngle*thetaAngle*(1-y^2))) + calculatePixel — the inverse of
        # the lat-long mapping (EquirectangularCamera.cpp:64-91).
        y_c = jnp.clip(e_conn_sn[..., 1], -1.0, 1.0)
        theta_c = jnp.arccos(y_c)
        phi_c = jnp.arctan2(-e_conn_sn[..., 0], e_conn_sn[..., 2])
        phi_c = jnp.where(phi_c < 0, phi_c + 2.0 * jnp.pi, phi_c)
        in_img = (phi_c <= cam.phi_angle) & (theta_c <= cam.theta_angle)
        sin_c = jnp.maximum(jnp.sin(theta_c), 1e-6)
        e_ddf = jnp.where(in_img[..., None], 1.0, 0.0) * jnp.ones(
            (n_l, r, s_dim))
        e_ext1_dir_pdf = jnp.where(
            in_img, 1.0 / (cam.phi_angle * cam.theta_angle * sin_c), 0.0)
        l_ext2_dir_pdf = jnp.zeros((n_l, r))
        e_rev_ddf = jnp.zeros((n_l, r, s_dim))
        smp_x = phi_c / cam.phi_angle
        smp_y = theta_c / cam.theta_angle
        hit_px = jnp.clip(
            (smp_x * width).astype(jnp.int32), 0, width.astype(jnp.int32) - 1)
        hit_py = jnp.clip(
            (smp_y * height).astype(jnp.int32), 0,
            height.astype(jnp.int32) - 1)
        splat_pix = (
            hit_py.astype(jnp.uint32) * width.astype(jnp.uint32)
            + hit_px.astype(jnp.uint32)).reshape(n_l * r)
    elif t == 1:
        # IDF endpoint (perspective): evaluate + calculatePixel
        # (PerspectiveCamera.cpp:77-99).
        op_w, op_h, img_area = camera_derived(cam)
        zsafe = jnp.where(e_conn_sn[..., 2] <= 1e-6, 1e-6, e_conn_sn[..., 2])
        pf = e_conn_sn * (cam.obj_dist / zsafe)[..., None] + jnp.stack(
            [cam.lens_radius * ev.uv[ei][:, 0],
             cam.lens_radius * ev.uv[ei][:, 1],
             jnp.zeros((r,))], axis=-1,
        )[None]
        in_img = (
            (pf[..., 0] >= -op_w * 0.5) & (pf[..., 0] <= op_w * 0.5)
            & (pf[..., 1] >= -op_h * 0.5) & (pf[..., 1] <= op_h * 0.5)
            & (e_conn_sn[..., 2] > 0)
        )
        e_ddf = jnp.where(in_img[..., None], 1.0, 0.0) * jnp.ones(
            (n_l, r, s_dim))
        e_ext1_dir_pdf = jnp.where(
            in_img,
            (cam.img_dist ** 2) / jnp.maximum(zsafe ** 3 * img_area, 1e-12),
            0.0,
        )
        l_ext2_dir_pdf = jnp.zeros((n_l, r))
        e_rev_ddf = jnp.zeros((n_l, r, s_dim))
        smp_x = 0.5 - pf[..., 0] / op_w
        smp_y = 0.5 - pf[..., 1] / op_h
        hit_px = jnp.clip(
            (smp_x * width).astype(jnp.int32), 0, width.astype(jnp.int32) - 1)
        hit_py = jnp.clip(
            (smp_y * height).astype(jnp.int32), 0,
            height.astype(jnp.int32) - 1)
        splat_pix = (
            hit_py.astype(jnp.uint32) * width.astype(jnp.uint32)
            + hit_px.astype(jnp.uint32)).reshape(n_l * r)
    else:
        wo_e = ev.dir_in_sn[ei]                          # (R, 3)
        e_ddf = v_eval(None, None, 0, None)(
            e_lobes, wo_e, e_conn_sn, e_gn_sn, False)
        e_ext1_dir_pdf = v_pdf(None, None, 0, None)(
            e_lobes, wo_e, e_conn_sn, e_gn_sn)
        l_ext2_dir_pdf = v_pdf(None, 0, None, None)(
            e_lobes, e_conn_sn, wo_e, e_gn_sn)
        e_rev_ddf = v_eval(None, 0, None, None)(
            e_lobes, e_conn_sn, wo_e, e_gn_sn, True)
        splat_pix = pid_c

    # wavelength collapse probability (cpp:194-196): a connection touching a
    # subpath that collapsed the hero wavelength carries 1/wlProb = N.
    # Applies in RGB mode too (hero-CHANNEL collapse through glass; see the
    # matching s0 site above).
    collapsed = lv.wl_flag | ev.wl_flag[ei][None]
    wl_prob_inv = jnp.where(collapsed, float(s_dim), 1.0)
    connection = l_ddf * (g * wl_prob_inv)[..., None] * e_ddf
    nonzero = jnp.any(connection != 0.0, axis=-1)
    # Visibility (Scene::testVisibility, SurfaceObject.cpp:417-429) is NOT
    # cast here: the shadow query is returned to bpt_batch, which batches
    # all s-strategies of a t into ONE any-hit kernel call. Env endpoints
    # shoot an open ray that only needs to clear the world sphere.
    shadow_tmax = jnp.where(
        at_l, 4.0 * scene.world_radius, jnp.sqrt(raw2) * (1.0 - 1e-3))
    valid = valid & nonzero
    shadow_q = (
        jnp.broadcast_to(ev.p[ei][None], (n_l, r, 3)).reshape(n_l * r, 3),
        conn_dir.reshape(n_l * r, 3),
        shadow_tmax.reshape(n_l * r),
        valid.reshape(n_l * r))

    # 1st/2nd extension pdfs (cpp:207-232), all (n_l, R) with s = row + 1.
    l_ext1_area = l_ext1_dir_pdf * cos_eye / dist2
    l_ext1_rr = jnp.minimum(
        v_imp(l_ddf * (cos_light
                       / jnp.maximum(l_ext1_dir_pdf, 1e-30))[..., None],
              hero),
        1.0,
    ).at[0].set(1.0)
    if t > 1:
        prev_p = ev.p[ei - 1]
        dev_ = ev.p[ei] - prev_p
        d2 = jnp.maximum(dot(dev_, dev_), 1e-12)
        dir2 = dev_ / jnp.sqrt(d2)[:, None]
        l_ext2_area = l_ext2_dir_pdf * (jnp.abs(
            dot(ev.gn[ei - 1], dir2)) / d2)[None]
        l_ext2_rr = jnp.minimum(
            v_imp(e_rev_ddf
                  * (jnp.abs(dot(e_gn_sn, ev.dir_in_sn[ei]))[None]
                     / jnp.maximum(l_ext2_dir_pdf, 1e-30))[..., None],
                  hero),
            1.0,
        )
    else:
        l_ext2_area = jnp.zeros((n_l, r))
        l_ext2_rr = jnp.zeros((n_l, r))

    e_ext1_area = e_ext1_dir_pdf * cos_light / dist2
    if t > 1:
        e_ext1_rr = jnp.minimum(
            v_imp(e_ddf * (cos_eye
                           / jnp.maximum(e_ext1_dir_pdf, 1e-30))[..., None],
                  hero),
            1.0,
        )
    else:
        e_ext1_rr = jnp.ones((n_l, r))
    # Rows >= 1: pdf of re-extending the light path from vertex s-2 to s-1
    # (shifted-by-one light tables); a previous light vertex at infinity
    # keeps dist2 = 1 and |cos| = 1 (getDirectionFrom semantics).
    prev_lp = jnp.concatenate([lv.p[:1], lv.p[:-1]], axis=0)
    prev_gn = jnp.concatenate([lv.gn[:1], lv.gn[:-1]], axis=0)
    prev_inf = jnp.concatenate([at_l[:1], at_l[:-1]], axis=0)
    dlv_ = lv.p - prev_lp
    d2l = jnp.maximum(dot(dlv_, dlv_), 1e-12)
    dir2l = dlv_ / jnp.sqrt(d2l)[..., None]
    e_ext2_area = e_ext2_dir_pdf * jnp.abs(dot(prev_gn, dir2l)) / d2l
    if scene.has_env:
        e_ext2_area = jnp.where(prev_inf, e_ext2_dir_pdf, e_ext2_area)
    e_ext2_area = e_ext2_area.at[0].set(0.0)
    e_ext2_rr = jnp.minimum(
        v_imp(l_rev_ddf * (jnp.abs(dot(l_gn_sn, lv.dir_in_sn))
                           / jnp.maximum(e_ext2_dir_pdf, 1e-30))[..., None],
              hero),
        1.0,
    ).at[0].set(0.0)

    # MIS weight from the incremental partial sums (O(1) per strategy).
    d_l, zb_l, s_l = mis_l
    d_e, zb_e, s_e = mis_e
    c1l = _safe_div(e_ext1_area * e_ext1_rr, d_l)
    d_l_prev = jnp.concatenate([jnp.ones((1, r)), d_l[:-1]], axis=0)
    c2l = _safe_div(e_ext2_area * e_ext2_rr, d_l_prev)
    rec = 1.0 + zb_l * c1l * c1l + (c1l * c2l) ** 2 * s_l[1:]
    if t > 1:
        c1e = _safe_div(l_ext1_area * l_ext1_rr, d_e[t - 1][None])
        c2e = _safe_div(l_ext2_area * l_ext2_rr, d_e[t - 2][None])
        rec = rec + zb_e[t - 1][None] * c1e * c1e + (c1e * c2e) ** 2 \
            * s_e[t][None]
    w = 1.0 / rec
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    contribution = (
        lv.alpha * connection * ev.alpha[ei][None] * w[..., None])
    return shadow_q, contribution, valid, splat_pix, (t != 1)


def render_bpt(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_light_verts: int = 16,
    max_eye_verts: int = 16,
    ray_batch: int | None = None,
    sample_offset: int = 0,
    base_verts: int = 8,
    deep_batch: int | None = None,
):
    """Full-frame BPT render -> (H, W, 3) linear RGB mean radiance.

    Subpath depth is ADAPTIVE (the reference's subpaths are RR-unbounded,
    BPT cpp:258-350; a flat static cap measurably clips transported energy
    — BASELINE.md r4: ~75% lost on a 3-pane glass corridor at 8+8): every
    lane first runs at `base_verts` caps; lanes whose subpaths were still
    extending at the cap bank nothing and re-run, compacted into
    `deep_batch`-lane batches, at the full `max_*_verts` caps. The
    counter-based RNG reproduces the shallow prefix bit-exactly, so the
    deep run IS that lane's estimate (no double counting, no bias); lanes
    that died naturally below the cap are exact already. Cost scales with
    the clipped FRACTION, so diffuse scenes pay ~nothing and specular-
    chain scenes pay only for their deep lanes. Explicitly passing
    max_*_verts <= base_verts restores the single-pass static-cap
    behavior (used by depth-semantics tests)."""
    import numpy as np

    from ..spectrum.spectral import NUM_STRATA, strata_to_rgb

    n_pix = width * height
    spectral = scene.stex.spectral
    s_film = NUM_STRATA if spectral else scene.stex.value.shape[-1]
    batch = int(ray_batch or min(n_pix, 65536))
    n_batches = -(-n_pix // batch)
    tiered = max(max_light_verts, max_eye_verts) > base_verts

    film = jnp.zeros((n_pix, s_film), jnp.float32)
    w_j = jnp.int32(width)
    h_j = jnp.int32(height)
    seed_j = jnp.uint32(seed)
    deep_work = []   # (pass sample index, base offset, overflow device arr)
    for i in range(spp):
        for b in range(n_batches):
            pixel_id = jnp.arange(b * batch, (b + 1) * batch, dtype=jnp.uint32)
            sample_id = jnp.full((batch,), sample_offset + i, jnp.uint32)
            if not tiered:
                film = bpt_batch(
                    scene, pixel_id, sample_id, seed_j, w_j, h_j, film,
                    max_light_verts, max_eye_verts,
                    pid_contiguous=(b + 1) * batch <= n_pix,
                )
                continue
            film, overflow = bpt_batch(
                scene, pixel_id, sample_id, seed_j, w_j, h_j, film,
                base_verts, base_verts,
                pid_contiguous=(b + 1) * batch <= n_pix,
                clip_at_cap=True,
            )
            # Deep re-runs are deferred until every base pass is enqueued
            # so the device pipeline never stalls on the host-side
            # nonzero() of an overflow mask mid-stream.
            deep_work.append((i, b * batch, overflow))

    for i, base_off, overflow in deep_work:
        idxs = base_off + np.nonzero(np.asarray(overflow))[0]
        if len(idxs) == 0:
            continue
        if deep_batch is None:
            # Smallest ladder size covering the clipped set (typically ~1%
            # of lanes on diffuse-dominated scenes), so the deep pass costs
            # ~its fair share; the ladder keeps the set of compiled
            # deep-program shapes tiny.
            db = next((n for n in (1024, 4096, 16384)
                       if len(idxs) <= n), 65536)
        else:
            db = deep_batch
        db = min(db, batch)
        for c0 in range(0, len(idxs), db):
            sel = idxs[c0:c0 + db]
            pad = db - len(sel)
            pix2 = jnp.asarray(
                np.concatenate([sel.astype(np.uint32),
                                np.zeros(pad, np.uint32)]))
            mask2 = jnp.asarray(
                np.concatenate([np.ones(len(sel), bool),
                                np.zeros(pad, bool)]))
            samp2 = jnp.full((db,), sample_offset + i, jnp.uint32)
            film = bpt_batch(
                scene, pix2, samp2, seed_j, w_j, h_j, film,
                max_light_verts, max_eye_verts, lane_mask=mask2,
            )
    img = film / spp
    img = img.reshape(height, width, s_film)
    if spectral:
        img = strata_to_rgb(img)
    return img
