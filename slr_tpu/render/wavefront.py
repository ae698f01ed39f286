"""Persistent-wavefront path tracer with a dynamic global work queue.

Same estimator as render/pt.py (PathTracingRenderer.cpp:137-262 semantics,
identical counter-based random streams), different scheduling: lanes are NOT
pinned to pixels. A global work counter enumerates (pixel, sample) items in
pass-major order (work = sample * n_pix + pixel); the moment a lane's path
dies (miss, RR, depth cap) it scatter-adds the finished sample into the film
and claims the next work item via an exclusive prefix sum over the lanes that
finished this iteration — the lock-step analogue of a GPU persistent-threads
queue (`atomicAdd` on a work counter). Static per-lane assignment (round
robin over samples) would leave the whole machine waiting on the straggler
lane whose samples happened to be long; dynamic claiming keeps utilization at
~(total segments)/(total segments + longest single path).

Every iteration therefore performs one useful closest-hit cast and one useful
NEE shadow cast for (nearly) every lane, cutting total work per sample by
~E[path length]/max_depth compared to the padded fixed-depth loop. This makes
the reference's depth cap of 100 (PathTracingRenderer.cpp:160) affordable:
depth no longer costs padded iterations.

Because the RNG is keyed by (pixel, sample, bounce, decision), the estimate
for every (pixel, sample) is bit-identical to pt.render's regardless of which
lane traces it or when (tests/test_wavefront.py).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel.intersect import RAY_EPSILON, sample_triangle_point
from ..bsdf.bsdf import (
    bsdf_evaluate,
    bsdf_has_nondelta,
    bsdf_pdf,
    bsdf_sample,
    emitted_radiance,
    gather_lobes,
    is_emissive,
)
from ..camera.perspective import sample_camera_rays, sample_camera_rays_equirect
from ..core import rng
from ..core.math3d import Array, dot, frame_from_local, frame_to_local
from ..core.rng import Decision
from ..core.sampling import (
    pdf_continuous_2d,
    power_heuristic,
    sample_continuous_2d,
)
from ..render.pt import (
    _area_light_prob,
    _env_radiance,
    _env_direction,
    _env_uv_from_direction,
    _ray_sort_key,
    _select_light,
    resolve_sp,
    scene_intersect_alpha,
    scene_occluded,
)
from ..scene.types import CameraKind, FlatScene
from ..spectrum.rgb import importance

DEFAULT_MAX_DEPTH = 100  # the reference's path cap (PathTracingRenderer.cpp)


class LaneState(NamedTuple):
    """Per-lane persistent state. `work` is the lane's current global work
    item (= sample * n_pix + pixel); >= total means the lane is drained."""

    work: Array         # (R,) uint32 global work item being traced
    bounce: Array       # (R,) int32  casts completed for the current sample
    ray_o: Array        # (R, 3)
    ray_d: Array        # (R, 3)
    alpha: Array        # (R, S)
    radiance: Array     # (R, S) current-sample accumulator
    cam_weight: Array   # (R,)   camera estimator weight of current sample
    hero: Array         # (R,)   int32
    lambdas: Array      # (R, S) wavelengths (zeros in RGB mode)
    wl_selected: Array  # (R,) bool
    prev_pdf: Array     # (R,)  BSDF pdf of the in-flight ray
    prev_delta: Array   # (R,) bool
    last: Array         # (R,) bool in-flight segment is the path's last (RR
                        #     killed it): collect its Le, then terminate —
                        #     matching the reference's order of implicit-hit
                        #     accumulation before the RR break
                        #     (PathTracingRenderer.cpp:232-258)
    rr_scale: Array     # (R,) 1/cont_p of the RR draw that allowed this
                        #     segment. The reference divides alpha only AFTER
                        #     the implicit-hit Le, so the carried alpha stays
                        #     undivided for emission and is rescaled by this
                        #     before any further shading.
    init_y: Array       # (R,)
    f_time: Array       # (R,)  shutter fraction (zeros when static)


class GlobalState(NamedTuple):
    lanes: LaneState
    counter: Array      # ()   uint32 next unclaimed work item
    film: Array         # (n_pix + 1, S_film); row n_pix is the drop slot
    n_iters: Array      # ()   int32 iteration counter (reporting)


def _work_pixel_sample(work, n_pix, sample_offset):
    pid = work % jnp.uint32(n_pix)
    sid = sample_offset + work // jnp.uint32(n_pix)
    return pid, sid


def _camera_ray(scene: FlatScene, pixel_id, sample_id, seed, width, height):
    pid = pixel_id
    px = (pid % width.astype(jnp.uint32)).astype(jnp.float32)
    py = (pid // width.astype(jnp.uint32)).astype(jnp.float32)
    jx = rng.uniform(seed, pid, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed, pid, sample_id, 0, Decision.PIXEL_Y)
    if scene.camera.kind == CameraKind.EQUIRECTANGULAR:
        return sample_camera_rays_equirect(
            scene.camera, px + jx, py + jy, width, height)
    lx = rng.uniform(seed, pid, sample_id, 0, Decision.LENS_U)
    ly = rng.uniform(seed, pid, sample_id, 0, Decision.LENS_V)
    return sample_camera_rays(
        scene.camera, px + jx, py + jy, width, height, lx, ly)


def _fresh_sample(scene: FlatScene, pixel_id, sample_id, seed, width, height,
                  s: int, spectral: bool):
    """Everything a lane needs to start the sample (pixel_id, sample_id)."""
    rays = _camera_ray(scene, pixel_id, sample_id, seed, width, height)
    u_wl = rng.uniform(seed, pixel_id, sample_id, 0, Decision.WL_SELECT)
    if spectral:
        from ..spectrum.spectral import sample_wavelengths

        u_off = rng.uniform(seed, pixel_id, sample_id, 0, Decision.WAVELENGTH)
        wls = sample_wavelengths(u_off, u_wl)
        lambdas = wls.lambdas
        hero = wls.hero
    else:
        lambdas = jnp.zeros(pixel_id.shape + (s,), jnp.float32)
        hero = jnp.minimum((u_wl * s).astype(jnp.int32), s - 1)
    if scene.instances is not None:
        f_time = rng.uniform(seed, pixel_id, sample_id, 0, Decision.TIME)
    else:
        f_time = jnp.zeros(pixel_id.shape, jnp.float32)
    return rays, hero, lambdas, f_time


def _sample_value(radiance, cam_weight, lambdas, spectral: bool):
    """One finished sample -> film-space contribution (R, S_film)."""
    weighted = cam_weight[:, None] * radiance
    if spectral:
        from ..spectrum.spectral import (
            NUM_SPECTRAL_SAMPLES, WL_HI, WL_LO, bin_to_strata)

        return bin_to_strata(
            lambdas, weighted / (NUM_SPECTRAL_SAMPLES / (WL_HI - WL_LO)))
    return weighted


@partial(jax.jit, static_argnames=("n_pix", "n_lanes", "max_depth",
                                   "sort_rays", "ranged"))
def _run_wavefront(scene: FlatScene, n_pix: int, spp_end, seed, width, height,
                   sample_offset, max_depth: int, n_lanes: int | None = None,
                   sort_rays: bool = True, ranged: bool = False,
                   work_lo=0, work_hi=0):
    """`ranged=True` restricts the dynamic work queue to global work items
    [work_lo, work_hi) — the multi-chip form: each shard drains its own
    contiguous slice of the (pixel, sample) work space with its own lanes
    and film, and films psum at the end (parallel/mesh.py). The
    counter-based RNG keys by (pixel, sample), so the estimate for every
    work item is bit-identical regardless of which shard traces it."""
    from ..spectrum.spectral import NUM_SPECTRAL_SAMPLES, NUM_STRATA

    spectral = scene.stex.spectral
    s = NUM_SPECTRAL_SAMPLES if spectral else scene.stex.value.shape[-1]
    s_film = NUM_STRATA if spectral else s
    r = n_lanes or n_pix
    seed = jnp.asarray(seed, jnp.uint32)
    width = jnp.asarray(width, jnp.uint32)
    height = jnp.asarray(height, jnp.uint32)
    sample_offset = jnp.asarray(sample_offset, jnp.uint32)
    spp_end = jnp.asarray(spp_end, jnp.uint32)
    total = (spp_end - sample_offset) * jnp.uint32(n_pix)
    if ranged:
        work_lo = jnp.asarray(work_lo, jnp.uint32)
        total = jnp.minimum(jnp.asarray(work_hi, jnp.uint32), total)
    else:
        work_lo = jnp.uint32(0)

    work0 = work_lo + jnp.arange(r, dtype=jnp.uint32)
    pid0, sid0 = _work_pixel_sample(work0, n_pix, sample_offset)
    rays, hero, lambdas, f_time = _fresh_sample(
        scene, pid0, sid0, seed, width, height, s, spectral)
    ones = jnp.ones((r, s), jnp.float32)
    lanes = LaneState(
        work=work0,
        bounce=jnp.zeros((r,), jnp.int32),
        ray_o=rays.o,
        ray_d=rays.d,
        alpha=ones,
        radiance=jnp.zeros((r, s), jnp.float32),
        cam_weight=rays.weight,
        hero=hero,
        lambdas=lambdas,
        wl_selected=jnp.zeros((r,), bool),
        prev_pdf=jnp.zeros((r,), jnp.float32),
        prev_delta=jnp.zeros((r,), bool),
        last=jnp.zeros((r,), bool),
        rr_scale=jnp.ones((r,), jnp.float32),
        init_y=importance(ones, hero),
        f_time=f_time,
    )
    state = GlobalState(
        lanes=lanes,
        counter=work_lo + jnp.uint32(r),
        film=jnp.zeros((n_pix + 1, s_film), jnp.float32),
        n_iters=jnp.zeros((), jnp.int32),
    )

    def cond(state: GlobalState):
        return jnp.any(state.lanes.work < total)

    def body(state: GlobalState):
        lane = state.lanes
        lane_on = lane.work < total
        pixel_id, sample_id = _work_pixel_sample(lane.work, n_pix,
                                                 sample_offset)
        ft = lane.f_time if scene.instances is not None else None
        lam_s = lane.lambdas if spectral else None

        # ---- cast the in-flight ray ------------------------------------
        hit = scene_intersect_alpha(scene, lane.ray_o, lane.ray_d, f=ft,
                                    active=lane_on)
        sp = resolve_sp(scene, hit, lane.ray_o, lane.ray_d, f=ft)
        hit_ok = lane_on & hit.mask
        first = lane.bounce == 0

        # ---- emission at the hit / environment on miss ------------------
        cos_out = dot(-lane.ray_d, sp.sn)
        le = emitted_radiance(scene, sp.mat_id, sp.uv, cos_out, lam_s)
        dp_ = sp.p - lane.ray_o
        d2 = jnp.maximum(dot(dp_, dp_), 1e-12)
        cos_g = jnp.abs(dot(lane.ray_d, sp.gn))
        l_prob = _area_light_prob(scene)
        light_pdf_hit = l_prob * sp.area_pdf * d2 / jnp.maximum(cos_g, 1e-12)
        mis_b = jnp.where(
            first | lane.prev_delta, 1.0,
            power_heuristic(lane.prev_pdf, light_pdf_hit))
        emissive = hit_ok & is_emissive(scene.materials, sp.mat_id)
        radiance = lane.radiance + jnp.where(
            emissive[:, None], lane.alpha * le * mis_b[:, None], 0.0)

        if scene.has_env:
            esc = lane_on & jnp.logical_not(hit.mask)
            eu, ev = _env_uv_from_direction(lane.ray_d)
            env_le = _env_radiance(scene, eu, ev, lam_s)
            env_uvpdf = pdf_continuous_2d(scene.env.dist, eu, ev)
            env_pdf = (scene.lights.env_prob * env_uvpdf
                       / jnp.maximum(2.0 * jnp.pi**2
                                     * jnp.sin(ev * jnp.pi), 1e-8))
            mis_env = jnp.where(
                first | lane.prev_delta, 1.0,
                power_heuristic(lane.prev_pdf, env_pdf))
            radiance = radiance + jnp.where(
                esc[:, None], lane.alpha * env_le * mis_env[:, None], 0.0)

        # ---- shade: NEE + BSDF sample + RR (pt.py bounce body) ----------
        # Shading (NEE + next-segment throughput) sees the RR-divided alpha;
        # the emission above intentionally saw the undivided one.
        alpha_sh = lane.alpha * lane.rr_scale[:, None]
        bounce_id = (lane.bounce + 1).astype(jnp.uint32)
        fx, fy, fz = sp.tangent, sp.bitangent, sp.sn
        wo = frame_to_local(fx, fy, fz, -lane.ray_d)
        gn_sn = frame_to_local(fx, fy, fz, sp.gn)
        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, lam_s)
        nondelta = bsdf_has_nondelta(lobes)

        u_sel = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                            Decision.LIGHT_SELECT)
        lu0 = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                          Decision.LIGHT_POS_U)
        lu1 = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                          Decision.LIGHT_POS_V)
        light_tri, light_prob, is_env = _select_light(scene, u_sel)
        lp = sample_triangle_point(scene.geometry, light_tri, lu0, lu1)

        delta_p = lp.p - sp.p
        dist2 = jnp.maximum(dot(delta_p, delta_p), 1e-12)
        dist = jnp.sqrt(dist2)
        area_dir = delta_p / dist[:, None]
        if scene.has_env:
            ex, ey, uvpdf = sample_continuous_2d(scene.env.dist, lu0, lu1)
            e_theta = ey * jnp.pi
            e_dir = _env_direction(ex * 2 * jnp.pi, e_theta)
            env_area_pdf = uvpdf / jnp.maximum(
                2.0 * jnp.pi**2 * jnp.sin(e_theta), 1e-8)
            shadow_dir = jnp.where(is_env[:, None], e_dir, area_dir)
            shadow_tmax = jnp.where(is_env, 4.0 * scene.world_radius,
                                    dist * (1.0 - 1e-3))
        else:
            shadow_dir = area_dir
            shadow_tmax = dist * (1.0 - 1e-3)

        # Depth accounting matches pt.py exactly: NEE at hit b contributes a
        # path of b+1 segments, allowed iff b < max_depth; the same condition
        # gates extending (cast b+1). The final allowed hit gets Le only.
        depth_ok = (lane.bounce < max_depth) & jnp.logical_not(lane.last)
        vis = jnp.logical_not(scene_occluded(
            scene, sp.p, shadow_dir, RAY_EPSILON, shadow_tmax, f=ft,
            active=hit_ok & depth_ok & nondelta))
        shadow_dir_sn = frame_to_local(fx, fy, fz, shadow_dir)
        fs_nee = bsdf_evaluate(lobes, wo, shadow_dir_sn, gn_sn, lane.hero)
        pdf_bsdf_w = bsdf_pdf(lobes, wo, shadow_dir_sn, gn_sn, lane.hero)

        cos_light_s = dot(-shadow_dir, lp.sn)
        le_nee = emitted_radiance(scene, lp.mat_id, lp.uv, cos_light_s, lam_s)
        light_pdf = light_prob * lp.area_pdf
        cos_light = jnp.abs(dot(-shadow_dir, lp.gn))
        bsdf_pdf_sa = pdf_bsdf_w * cos_light / dist2
        mis_w = power_heuristic(light_pdf, bsdf_pdf_sa)
        g = jnp.abs(dot(shadow_dir_sn, gn_sn)) * cos_light / dist2
        contrib_nee = (alpha_sh * le_nee * fs_nee
                       * (g * mis_w / jnp.maximum(light_pdf, 1e-30))[:, None])
        nee_ok = (hit_ok & depth_ok & nondelta & vis & (light_pdf > 0)
                  & jnp.logical_not(is_env))
        radiance = radiance + jnp.where(nee_ok[:, None], contrib_nee, 0.0)

        if scene.has_env:
            le_env = _env_radiance(scene, ex, ey, lam_s)
            env_light_pdf = light_prob * env_area_pdf
            mis_env2 = power_heuristic(env_light_pdf, pdf_bsdf_w)
            g_env = jnp.abs(dot(shadow_dir_sn, gn_sn))
            contrib_env = (
                alpha_sh * le_env * fs_nee
                * (g_env * mis_env2
                   / jnp.maximum(env_light_pdf, 1e-30))[:, None])
            env_ok = (hit_ok & depth_ok & nondelta & vis & is_env
                      & (env_light_pdf > 0))
            radiance = radiance + jnp.where(env_ok[:, None], contrib_env, 0.0)

        uc = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                         Decision.BSDF_COMPONENT)
        u0 = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                         Decision.BSDF_U)
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                         Decision.BSDF_V)
        smp = bsdf_sample(lobes, wo, gn_sn, lane.hero, lane.wl_selected,
                          uc, u0, u1)
        smp = smp._replace(wi=jax.lax.stop_gradient(smp.wi),
                           pdf=jax.lax.stop_gradient(smp.pdf))
        dir_pdf = jnp.where(smp.dispersive, smp.pdf / s, smp.pdf)
        wl_sel_new = lane.wl_selected | smp.dispersive

        cos_sn = jnp.abs(dot(smp.wi, gn_sn))
        new_alpha = alpha_sh * smp.fs * (
            cos_sn / jnp.maximum(dir_pdf, 1e-30))[:, None]
        sample_ok = hit_ok & (dir_pdf > 0) & jnp.logical_not(
            jnp.all(smp.fs == 0.0, axis=-1))

        cont_p = jax.lax.stop_gradient(jnp.minimum(
            importance(new_alpha, lane.hero)
            / jnp.maximum(lane.init_y, 1e-30), 1.0))
        u_rr = rng.uniform(seed, pixel_id, sample_id, bounce_id,
                           Decision.RR)
        survive = u_rr < cont_p
        # RR-killed paths still cast this final segment (its implicit-hit Le
        # is collected with the UNdivided alpha, as in pt.py / the reference)
        # but are flagged `last` so the next iteration only banks Le. The
        # survivor division is deferred via rr_scale: the next hit's Le must
        # see the undivided alpha (PathTracingRenderer.cpp order: implicit-hit
        # accumulation at :232-249 precedes the RR divide at :253-258).
        rr_next = jnp.where(
            survive, 1.0 / jnp.maximum(cont_p, 1e-30), 1.0)

        extend = sample_ok & depth_ok
        dying = extend & jnp.logical_not(survive)

        # ---- bank finished samples & claim new work ---------------------
        finish = lane_on & jnp.logical_not(extend)
        values = _sample_value(radiance, lane.cam_weight, lane.lambdas,
                               spectral)
        bank_idx = jnp.where(finish, pixel_id, jnp.uint32(n_pix))
        film = state.film.at[bank_idx].add(
            jnp.where(finish[:, None], values, 0.0)
        )

        # Dynamic work claiming: the lock-step analogue of `atomicAdd` on a
        # global counter — finished lanes take counter + (their rank among
        # this iteration's finishers).
        fin_u = finish.astype(jnp.uint32)
        rank = jnp.cumsum(fin_u) - fin_u   # exclusive prefix sum
        new_work = jnp.where(finish, state.counter + rank, lane.work)
        counter = state.counter + jnp.sum(fin_u)

        regen = finish & (new_work < total)
        n_pid, n_sid = _work_pixel_sample(new_work, n_pix, sample_offset)
        n_rays, n_hero, n_lam, n_ft = _fresh_sample(
            scene, n_pid, n_sid, seed, width, height, s, spectral)

        def pick(cond_v, a, b):
            c = cond_v.reshape((-1,) + (1,) * (a.ndim - 1))
            return jnp.where(c, a, b)

        new_lane = LaneState(
            work=new_work,
            bounce=jnp.where(finish, 0, lane.bounce + 1),
            ray_o=pick(regen, n_rays.o, sp.p),
            ray_d=pick(regen, n_rays.d,
                       frame_from_local(fx, fy, fz, smp.wi)),
            alpha=pick(finish, ones, new_alpha),
            radiance=jnp.where(finish[:, None], 0.0, radiance),
            cam_weight=pick(regen, n_rays.weight, lane.cam_weight),
            hero=pick(regen, n_hero, lane.hero),
            lambdas=pick(regen, n_lam, lane.lambdas),
            wl_selected=jnp.where(finish, False, wl_sel_new),
            prev_pdf=jnp.where(finish, 0.0, dir_pdf),
            prev_delta=jnp.where(finish, False, smp.is_delta),
            last=jnp.where(finish, False, dying),
            rr_scale=jnp.where(finish, 1.0, rr_next),
            init_y=pick(regen, importance(ones, n_hero), lane.init_y),
            f_time=pick(regen, n_ft, lane.f_time),
        )

        # ---- optional coherence re-sort (ONE packed row gather) ---------
        if sort_rays:
            from ..core.permute import permute_rows

            active_next = new_lane.work < total
            key = _ray_sort_key(scene, new_lane.ray_o, new_lane.ray_d,
                                active_next)
            order = jnp.argsort(key)
            new_lane = permute_rows(new_lane, order)

        return GlobalState(lanes=new_lane, counter=counter, film=film,
                           n_iters=state.n_iters + 1)

    state = jax.lax.while_loop(cond, body, state)
    return state.film[:n_pix], state.n_iters


# Lane-count cap: lanes are decoupled from pixels by the dynamic work
# queue, and the per-iteration state (sort keys, gathers, film scatters)
# stops scaling once every block is full of useful work — past ~256k lanes
# the working set thrashes HBM bandwidth and large frames REGRESS (r3: 1108
# ks/s at 1024x768 vs 1308 at 256x192). Swept on TPU v5e (BASELINE.md):
# 1024x768 throughput peaks ~49-65k lanes (1171 ks/s) and falls to 442
# ks/s at 786k lanes.
DEFAULT_LANE_CAP = 49152


def render_wavefront(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_depth: int = DEFAULT_MAX_DEPTH,
    sample_offset: int = 0,
    return_iters: bool = False,
    sort_rays: bool = True,
    n_lanes: int | None = None,
):
    """Drop-in replacement for pt.render with regeneration scheduling.
    Returns (H, W, S) mean linear radiance (develop with render/film.py)."""
    from ..spectrum.spectral import strata_to_rgb

    n_pix = width * height
    if n_lanes is None:
        n_lanes = min(n_pix, DEFAULT_LANE_CAP)
    film, n_iters = _run_wavefront(
        scene, n_pix, spp + sample_offset, seed, width, height,
        sample_offset, max_depth, n_lanes=n_lanes, sort_rays=sort_rays)
    film = (film / spp).reshape(height, width, -1)
    if scene.stex.spectral:
        film = strata_to_rgb(film)
    if return_iters:
        return film, int(n_iters)
    return film
