"""Wavefront unidirectional path tracer with NEE + power-heuristic MIS.

Faithful TPU reformulation of the reference estimator
(libSLR/Renderers/PathTracingRenderer.cpp:137-262):

* per-bounce: NEE with two-level light selection (env vs area, uniform over
  area lights — SurfaceObject.cpp:431-449), shadow visibility, power-heuristic
  MIS on both strategies (:195-198, :243-246);
* BSDF sampling through the MultiBSDF aggregate, dispersive hero-collapse
  (:211-214), Russian roulette on hero-channel importance (:253-258);
* implicit emitter hits weighted against the light-sampling pdf (:232-249).

The per-ray `while(true)` loop becomes a masked `lax.fori_loop` over a static
MAX_DEPTH: the whole wavefront advances one bounce per iteration; terminated
lanes idle. Randomness is counter-based per (pixel, sample, bounce, decision)
(core/rng.py), making results independent of wavefront sharding.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.intersect import (
    RAY_EPSILON,
    Hit,
    intersect_brute,
    resolve_surface_point,
    sample_triangle_point,
)
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
from ..scene.types import CameraKind
from ..core import rng
from ..core.math3d import Array, cross as _cross, dot, frame_from_local, frame_to_local, normalize
from ..core.rng import Decision
from ..core.sampling import (
    pdf_continuous_2d,
    power_heuristic,
    sample_continuous_2d,
    sample_discrete_1d,
)
from ..scene.types import FlatScene
from ..spectrum.rgb import importance


def scene_intersect(scene: FlatScene, o: Array, d: Array,
                    tmin=RAY_EPSILON, tmax=jnp.inf, f: Array | None = None,
                    active: Array | None = None) -> Hit:
    """Accelerator dispatch (static pytree structure): the fused Pallas
    Plücker kernel on TPU, the XLA Plücker path elsewhere; BVH / scan-brute
    remain available for validation and very large scenes.

    The single-level accelerators cover the static triangle prefix; scenes
    with instanced/animated geometry additionally traverse the two-level
    structure at shutter fraction `f` and the closer hit wins (the analogue
    of the aggregate + TransformedSurfaceObject mix, SurfaceObject.cpp)."""
    geom = scene.geometry
    if scene.instances is not None and scene.n_static >= 0:
        # Brute-force scans must not see the local-space instanced tail.
        geom = geom.replace(
            tri_vidx=geom.tri_vidx[: scene.n_static],
            tri_mat=geom.tri_mat[: scene.n_static],
            tri_alpha=geom.tri_alpha[: scene.n_static],
            tri_ntex=geom.tri_ntex[: scene.n_static],
        )
    if scene.pallas_tris is not None and jax.default_backend() not in (
        "cpu", "gpu"
    ):
        from ..accel.pallas_intersect import intersect_pallas

        if scene.instances is not None:
            # The instanced kernel covers static + instanced geometry in
            # one traversal (entries carry (chunk, instance) pairs and the
            # ray block is transformed in-kernel at each lane's shutter
            # fraction) — no XLA two-level while_loop on the TPU path.
            f_ = jnp.zeros(o.shape[:1], jnp.float32) if f is None else f
            return intersect_pallas(
                geom, scene.pallas_tris, o, d, tmin, tmax, active=active,
                f=f_, instances=scene.instances,
            )
        hit = intersect_pallas(geom, scene.pallas_tris, o, d, tmin, tmax,
                               active=active)
    elif scene.plucker is not None:
        from ..accel.plucker import intersect_plucker

        hit = intersect_plucker(geom, scene.plucker, o, d, tmin, tmax)
    elif scene.bvh is not None:
        from ..accel.lbvh import intersect_bvh

        hit = intersect_bvh(geom, scene.bvh, o, d, tmin, tmax)
    else:
        hit = intersect_brute(geom, o, d, tmin, tmax)
    if scene.instances is None:
        return hit
    from ..accel.twolevel import intersect_instances

    f = jnp.zeros(o.shape[:1], jnp.float32) if f is None else f
    hit2 = intersect_instances(
        scene.geometry, scene.instances, o, d, f, tmin, tmax
    )
    closer = hit2.mask & (hit2.t < jnp.where(hit.mask, hit.t, jnp.inf))
    return Hit(
        t=jnp.where(closer, hit2.t, hit.t),
        tri=jnp.where(closer, hit2.tri, hit.tri),
        b0=jnp.where(closer, hit2.b0, hit.b0),
        b1=jnp.where(closer, hit2.b1, hit.b1),
        mask=hit.mask | hit2.mask,
        inst=jnp.where(closer, hit2.inst, -1),
    )


def scene_intersect_alpha(scene: FlatScene, o: Array, d: Array,
                          tmin=RAY_EPSILON, tmax=jnp.inf,
                          f: Array | None = None,
                          active: Array | None = None) -> Hit:
    """Closest hit honoring alpha-cutout textures (Triangle::intersect alpha
    test, TriangleMesh.cpp:163-168): hits whose alpha texture evaluates to 0
    are re-cast past until resolution — an unbounded `lax.while_loop`, like
    the reference's retry loop (no fixed recast cap)."""
    hit = scene_intersect(scene, o, d, tmin, tmax, f, active=active)
    if not scene.has_alpha:
        return hit
    from ..scene.textures import eval_float_texture

    def alpha_zero(h: Hit) -> Array:
        from ..accel.intersect import fetch_tri_row

        tri = jnp.maximum(h.tri, 0)
        if scene.geometry.tri_table is not None:
            row = fetch_tri_row(scene.geometry.tri_table, tri)
            aid = row.alpha_id
            b2 = (1.0 - h.b0 - h.b1)[..., None]
            uv = (h.b0[..., None] * row.uv0 + h.b1[..., None] * row.uv1
                  + b2 * row.uv2)
        else:
            aid = scene.geometry.tri_alpha[tri]
            vidx = scene.geometry.tri_vidx[tri]
            uv = (
                h.b0[..., None] * scene.geometry.uvs[vidx[:, 0]]
                + h.b1[..., None] * scene.geometry.uvs[vidx[:, 1]]
                + (1.0 - h.b0 - h.b1)[..., None]
                * scene.geometry.uvs[vidx[:, 2]]
            )
        a = eval_float_texture(scene.ftex, aid, uv,
                               scene.stex.images, scene.stex.image_hw)
        return h.mask & (aid >= 0) & (a == 0.0)

    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), hit.t.shape)
    has_inst = hit.inst is not None

    def cond(carry):
        hit, _ = carry
        return jnp.any(alpha_zero(hit))

    def body(carry):
        hit, tmin_b = carry
        cut = alpha_zero(hit)
        tmin_b = jnp.where(cut, hit.t + RAY_EPSILON, tmin_b)
        rehit = scene_intersect(scene, o, d, tmin_b, tmax, f, active=cut)
        hit = Hit(
            t=jnp.where(cut, rehit.t, hit.t),
            tri=jnp.where(cut, rehit.tri, hit.tri),
            b0=jnp.where(cut, rehit.b0, hit.b0),
            b1=jnp.where(cut, rehit.b1, hit.b1),
            mask=jnp.where(cut, rehit.mask, hit.mask),
            inst=None if not has_inst
            else jnp.where(cut, rehit.inst, hit.inst),
        )
        return hit, tmin_b

    hit, _ = jax.lax.while_loop(cond, body, (hit, tmin_b))
    return hit


def resolve_sp(scene: FlatScene, hit: Hit, o: Array, d: Array,
               f: Array | None = None):
    """Surface-point resolution + optional bump-map frame perturbation
    (BumpSingleSurfaceObject, SurfaceObject.cpp:122-134). For instanced hits
    the shading frame is brought from instance-local to world space at the
    ray's shutter fraction — the analogue of the transform-stack unwind in
    Intersection::getSurfacePoint (SurfaceObject.cpp:329-336). The hit
    position is already world-space (o + d*t with a world-parameter t)."""
    sp = resolve_surface_point(scene.geometry, hit, o, d)
    if scene.instances is not None and hit.inst is not None:
        from ..core.math3d import normalize as _normalize
        from ..core.transform import trs_apply_normal, trs_apply_vector, trs_at

        inst = scene.instances
        f_ = jnp.zeros(hit.t.shape, jnp.float32) if f is None else f
        i = jnp.maximum(hit.inst, 0)
        T, R, S = trs_at(
            inst.t0_T[i], inst.t0_R[i], inst.t0_S[i],
            inst.t1_T[i], inst.t1_R[i], inst.t1_S[i], f_,
        )
        on_inst = (hit.inst >= 0)[..., None]
        gn_w = _normalize(trs_apply_normal(T, R, S, sp.gn))
        sn_w = _normalize(trs_apply_normal(T, R, S, sp.sn))
        tan_w = _normalize(trs_apply_vector(T, R, S, sp.tangent))
        sn = jnp.where(on_inst, sn_w, sp.sn)
        tangent = jnp.where(on_inst, tan_w, sp.tangent)
        sp = sp._replace(
            gn=jnp.where(on_inst, gn_w, sp.gn),
            sn=sn,
            tangent=tangent,
            bitangent=jnp.where(
                on_inst, _cross(sn_w, tan_w), sp.bitangent
            ),
        )
    if scene.has_normal_map:
        from ..scene.textures import eval_normal_texture, perturb_frame

        tri = jnp.maximum(hit.tri, 0)
        ntex_id = scene.geometry.tri_ntex[tri]
        nlocal = eval_normal_texture(
            scene.ntex, scene.stex.images, scene.stex.image_hw, ntex_id, sp.uv
        )
        sp = perturb_frame(sp, nlocal)
    return sp


def scene_occluded(scene: FlatScene, o: Array, d: Array, tmin, tmax,
                   f: Array | None = None, active: Array | None = None
                   ) -> Array:
    """Occlusion-only query (bool per ray). Uses the cheap any-hit Pallas
    kernel when applicable; alpha-cutout scenes need the closest-hit + recast
    path so a fully cut-out surface doesn't cast a shadow."""
    if scene.has_alpha:
        return scene_intersect_alpha(scene, o, d, tmin, tmax, f=f,
                                     active=active).mask
    if scene.pallas_tris is not None and jax.default_backend() not in (
        "cpu", "gpu"
    ):
        from ..accel.pallas_intersect import anyhit_pallas

        f_ = (jnp.zeros(o.shape[:1], jnp.float32) if f is None else f) \
            if scene.instances is not None else None
        # The instanced kernel's entries cover the BLAS tail, so one
        # any-hit call answers the whole two-level query.
        return anyhit_pallas(scene.geometry, scene.pallas_tris, o, d, tmin,
                             tmax, active=active, f=f_)
    return scene_intersect(scene, o, d, tmin, tmax, f).mask


def test_visibility(scene: FlatScene, p_from: Array, p_to: Array,
                    f: Array | None = None, active: Array | None = None
                    ) -> Array:
    """Shadow test (Scene::testVisibility, SurfaceObject.cpp:417-429).
    Returns True when mutually visible."""
    delta = p_to - p_from
    dist = jnp.sqrt(jnp.maximum(dot(delta, delta), 1e-40))
    d = delta / jnp.maximum(dist, 1e-20)[..., None]
    occ = scene_occluded(
        scene, p_from, d, tmin=RAY_EPSILON, tmax=dist * (1.0 - 1e-3), f=f,
        active=active,
    )
    return jnp.logical_not(occ)


def _env_direction(phi: Array, theta: Array) -> Array:
    """(phi, theta) -> world direction, reference convention
    (SurfaceObject.cpp:178): p = (-sin(phi) sin(theta), cos(theta),
    cos(phi) sin(theta))."""
    st = jnp.sin(theta)
    return jnp.stack([-jnp.sin(phi) * st, jnp.cos(theta), jnp.cos(phi) * st],
                     axis=-1)


def _env_uv_from_direction(d: Array) -> tuple[Array, Array]:
    """Inverse mapping: direction -> (u, v) in [0,1)^2 equirect coords."""
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-d[..., 0], d[..., 2])
    phi = jnp.where(phi < 0, phi + 2 * jnp.pi, phi)
    return phi / (2 * jnp.pi), theta / jnp.pi


def _env_radiance(scene: FlatScene, u: Array, v: Array,
                  lambdas: Array | None) -> Array:
    """Le of the environment at equirect (u, v): texture x scale
    (IBLEmission::emittance x IBLEDF = pi*tex*scale * 1/pi)."""
    from ..scene.textures import eval_stex

    tex_id = jnp.broadcast_to(scene.env.stex, u.shape)
    uv = jnp.stack([u, v], axis=-1)
    val = eval_stex(scene.stex, tex_id, uv, lambdas)
    return val * scene.env.scale


class PathState(NamedTuple):
    ray_o: Array       # (R, 3)
    ray_d: Array       # (R, 3)
    alpha: Array       # (R, S) throughput
    radiance: Array    # (R, S)
    active: Array      # (R,) bool
    hero: Array        # (R,) int32 hero channel
    wl_selected: Array  # (R,) bool
    prev_pdf: Array    # (R,) BSDF pdf of the ray (for implicit MIS)
    prev_delta: Array  # (R,) bool previous bounce was delta
    init_y: Array      # (R,) initial importance for RR


def _ray_sort_key(scene: FlatScene, o: Array, d: Array, active: Array,
                  contact: bool = True) -> Array:
    """Coherence key for wavefront re-sorting: direction octant (3 bits) +
    Morton code of the quantized estimated CONTACT point (27 bits). Inactive
    lanes key to the maximum so they pack into trailing ray blocks, where the
    Pallas kernels' block-granular opt-out skips them entirely.

    The contact point is o + tn*d with tn the near distance of the nearest
    super-box the ray enters (pallas_intersect.nearest_super_tn) — a coarse
    "where does this ray first meet geometry" estimate. Grouping rays by
    contact locality instead of origin collapses the per-block worklist
    UNIONS the traversal kernel pays for: on the RTC3-class grass scene,
    mean entries/block drops 176 -> 32 for primaries (all sharing one
    origin, useless as a key) and 284 -> 86 for scrambled bounce rays —
    kernel 186 -> 57 ms / 236 -> 63 ms (tools/exp_locality_sort.py). For
    rays whose origin already touches geometry tn ~ 0 and the key reduces
    to the old origin key.

    Sorting is statistically invisible: the RNG is keyed per (pixel, sample,
    bounce, decision), so each lane draws identical randoms in any order and
    the caller un-permutes with the carried `orig` indices. Results agree
    with the unsorted path to fp tolerance (XLA fuses the two programs
    differently around the gathers)."""
    lo = scene.world_center - scene.world_radius
    ext = jnp.maximum(2.0 * scene.world_radius, 1e-12)
    p_key = o
    if contact and scene.super_boxes_blob is not None:
        from ..accel.pallas_intersect import T_FAR, nearest_super_tn

        # Static bytes -> XLA constant (deliberately NOT a traced scene
        # leaf; see FlatScene.super_boxes_blob).
        sup = jnp.asarray(
            np.frombuffer(scene.super_boxes_blob, np.float32).reshape(-1, 8))
        tn = nearest_super_tn(o, d, sup)
        p_key = o + jnp.where(tn < T_FAR, tn, 0.0)[:, None] * d
    q = jnp.clip((p_key - lo) / ext * 511.0, 0.0, 511.0).astype(jnp.uint32)

    def expand9(v):
        # Spread 9 bits to every 3rd position (fits 27 bits).
        v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
        v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
        v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
        v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
        return v

    morton = (
        (expand9(q[..., 0]) << jnp.uint32(2))
        | (expand9(q[..., 1]) << jnp.uint32(1))
        | expand9(q[..., 2])
    )
    octant = (
        ((d[..., 0] < 0).astype(jnp.uint32) << jnp.uint32(2))
        | ((d[..., 1] < 0).astype(jnp.uint32) << jnp.uint32(1))
        | (d[..., 2] < 0).astype(jnp.uint32)
    )
    key = (octant << jnp.uint32(27)) | morton
    return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))


def _select_light(scene: FlatScene, u: Array):
    """Two-level light pick. Returns (tri (R,), prob (R,), remapped u, is_env)."""
    env_prob = scene.lights.env_prob
    is_env = u < env_prob
    u_area = jnp.clip(
        (u - env_prob) / jnp.maximum(1.0 - env_prob, 1e-12), 0.0, 1.0 - 1e-7
    )
    idx, pmf, _ = sample_discrete_1d(scene.lights.dist, u_area)
    nl = scene.lights.tri_idx.shape[0]
    if nl <= 1024:
        oh = idx[..., None] == jnp.arange(nl, dtype=jnp.int32)
        tri = jnp.sum(jnp.where(oh, scene.lights.tri_idx, 0), axis=-1)
    else:
        tri = scene.lights.tri_idx[idx]
    prob = jnp.where(is_env, env_prob, (1.0 - env_prob) * pmf)
    return tri, prob, is_env


def _area_light_prob(scene: FlatScene) -> Array:
    """evaluateProb for an area light triangle (uniform pmf over area lights,
    scaled by the aggregate-vs-env importance split)."""
    n_lights = scene.lights.tri_idx.shape[0]
    return (1.0 - scene.lights.env_prob) / n_lights


@partial(jax.jit, static_argnames=("max_depth", "sort_rays"))
def trace_radiance(
    scene: FlatScene,
    o: Array,
    d: Array,
    pixel_id: Array,
    sample_id: Array,
    seed,
    max_depth: int = 16,
    sort_rays: bool = False,
) -> Array:
    """Estimate radiance for a wavefront of camera rays. Returns (R, S).

    In spectral scenes S = 16 hero-wavelength samples; the caller converts to
    film strata. In RGB scenes S = 3. Also returns the wavelength set for
    spectral scenes via trace_radiance_spectral."""
    radiance, _ = _trace_core(scene, o, d, pixel_id, sample_id, seed,
                              max_depth, sort_rays)
    return radiance


@partial(jax.jit,
         static_argnames=("max_depth", "cast_fns", "resolve_fn"))
def trace_radiance_spectral(scene, o, d, pixel_id, sample_id, seed,
                            max_depth=16, cast_fns=None, resolve_fn=None):
    """Spectral variant returning (radiance (R, N), lambdas (R, N)).
    `cast_fns=(intersect_fn, occluded_fn)` swaps the accelerator casts and
    `resolve_fn` the surface-point resolution — the scene-sharded render
    path (parallel/scene_shard.py) routes them through mesh-partitioned
    chunk AND shading tables."""
    return _trace_core(scene, o, d, pixel_id, sample_id, seed, max_depth,
                       cast_fns=cast_fns, resolve_fn=resolve_fn)


def _trace_core(
    scene: FlatScene,
    o: Array,
    d: Array,
    pixel_id: Array,
    sample_id: Array,
    seed,
    max_depth: int,
    sort_rays: bool = False,
    cast_fns=None,
    resolve_fn=None,
):
    from ..spectrum.spectral import NUM_SPECTRAL_SAMPLES, sample_wavelengths

    isect_fn, occl_fn = (cast_fns if cast_fns is not None
                         else (scene_intersect_alpha, scene_occluded))
    if resolve_fn is None:
        resolve_fn = resolve_sp

    r = o.shape[0]
    spectral = scene.stex.spectral
    s = NUM_SPECTRAL_SAMPLES if spectral else scene.stex.value.shape[-1]
    seed = jnp.asarray(seed, jnp.uint32)

    # Wavelength sampling (WavelengthSamples::createWithEqualOffsets,
    # SpectrumTypes.h:54-64). In RGB mode the hero is a channel index.
    u_wl = rng.uniform(seed, pixel_id, sample_id, 0, Decision.WL_SELECT)
    if spectral:
        u_off = rng.uniform(seed, pixel_id, sample_id, 0, Decision.WAVELENGTH)
        wls = sample_wavelengths(u_off, u_wl)
        lambdas = wls.lambdas
        hero = wls.hero
    else:
        lambdas = None
        hero = jnp.minimum((u_wl * s).astype(jnp.int32), s - 1)

    # Shutter-fraction sampling (the reference's time sample, Decision.TIME;
    # PathTracingRenderer.cpp:105). Only scenes with animated/instanced
    # content trace the two-level structure, so static scenes skip it.
    if scene.instances is not None:
        f_time = rng.uniform(seed, pixel_id, sample_id, 0, Decision.TIME)
    else:
        f_time = None

    hit = isect_fn(scene, o, d, f=f_time)
    sp = resolve_fn(scene, hit, o, d, f=f_time)

    alpha = jnp.ones((r, s), jnp.float32)
    radiance = jnp.zeros((r, s), jnp.float32)

    # First-hit emitter: no MIS (PathTracingRenderer.cpp:152-156).
    cos_out = dot(-d, sp.sn)
    le = emitted_radiance(scene, sp.mat_id, sp.uv, cos_out, lambdas)
    radiance = radiance + jnp.where(hit.mask[..., None], alpha * le, 0.0)

    # Primary ray escaping to the environment sphere (atInfinity, no MIS).
    if scene.has_env:
        eu, ev = _env_uv_from_direction(d)
        env_le0 = _env_radiance(scene, eu, ev, lambdas)
        radiance = radiance + jnp.where(
            jnp.logical_not(hit.mask)[..., None], env_le0, 0.0
        )

    active = hit.mask
    init_y = importance(alpha, hero)

    state = PathState(
        ray_o=o,
        ray_d=d,
        alpha=alpha,
        radiance=radiance,
        active=active,
        hero=hero,
        wl_selected=jnp.zeros((r,), bool),
        prev_pdf=jnp.zeros((r,), jnp.float32),
        prev_delta=jnp.zeros((r,), bool),
        init_y=init_y,
    )
    # Per-lane streams the bounce loop draws from / bins by; when sorting,
    # these ride along with their lane through every permutation, and `orig`
    # un-permutes the film at the end.
    aux = (pixel_id, sample_id, f_time, lambdas,
           jnp.arange(r, dtype=jnp.int32))

    def bounce(b, carry):
        state, sp, aux = carry
        pixel_id, sample_id, f_time, lambdas, orig = aux
        bounce_id = jnp.uint32(b + 1)

        wo_world = -state.ray_d
        # Shading frame at current hits.
        fx, fy, fz = sp.tangent, sp.bitangent, sp.sn
        wo = frame_to_local(fx, fy, fz, wo_world)
        gn_sn = frame_to_local(fx, fy, fz, sp.gn)

        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, lambdas)
        nondelta = bsdf_has_nondelta(lobes)

        # --- Next-event estimation -------------------------------------
        u_sel = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.LIGHT_SELECT)
        lu0 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.LIGHT_POS_U)
        lu1 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.LIGHT_POS_V)
        light_tri, light_prob, is_env = _select_light(scene, u_sel)
        lp = sample_triangle_point(scene.geometry, light_tri, lu0, lu1)

        # ONE shadow ray per bounce (like the reference, which samples one
        # light and casts one visibility ray, PathTracingRenderer.cpp:
        # 169-204): env lanes aim at the sampled env direction with an open
        # tmax, area lanes at the sampled light point. BSDF eval/pdf are also
        # shared between the two branches.
        delta_p = lp.p - sp.p
        dist2 = jnp.maximum(dot(delta_p, delta_p), 1e-12)
        dist = jnp.sqrt(dist2)
        area_dir = delta_p / dist[..., None]

        if scene.has_env:
            ex, ey, uvpdf = sample_continuous_2d(scene.env.dist, lu0, lu1)
            e_theta = ey * jnp.pi
            e_dir = _env_direction(ex * 2 * jnp.pi, e_theta)
            env_area_pdf = uvpdf / jnp.maximum(
                2.0 * jnp.pi**2 * jnp.sin(e_theta), 1e-8
            )
            shadow_dir = jnp.where(is_env[..., None], e_dir, area_dir)
            # Env rays only need to clear the world bounding sphere; a huge
            # tmax would overflow the any-hit kernel's multiply-form range
            # test (tmax * n·d with unnormalized n).
            env_tmax = 4.0 * scene.world_radius
            shadow_tmax = jnp.where(is_env, env_tmax, dist * (1.0 - 1e-3))
        else:
            shadow_dir = area_dir
            shadow_tmax = dist * (1.0 - 1e-3)

        # Only lanes that will use the NEE estimate cast a shadow ray; the
        # rest opt out at block granularity inside the kernel.
        vis = jnp.logical_not(occl_fn(
            scene, sp.p, shadow_dir, RAY_EPSILON, shadow_tmax, f=f_time,
            active=state.active & nondelta,
        ))
        shadow_dir_sn = frame_to_local(fx, fy, fz, shadow_dir)
        fs_nee = bsdf_evaluate(lobes, wo, shadow_dir_sn, gn_sn, state.hero)
        pdf_bsdf_w = bsdf_pdf(lobes, wo, shadow_dir_sn, gn_sn, state.hero)

        # EDF at the light point toward the shading point (area lanes).
        cos_light_s = dot(-shadow_dir, lp.sn)
        le_nee = emitted_radiance(scene, lp.mat_id, lp.uv, cos_light_s,
                                  lambdas)  # includes 1/pi and side test
        light_pdf = light_prob * lp.area_pdf
        cos_light = jnp.abs(dot(-shadow_dir, lp.gn))
        bsdf_pdf_sa = pdf_bsdf_w * cos_light / dist2
        mis_w = power_heuristic(light_pdf, bsdf_pdf_sa)
        g = jnp.abs(dot(shadow_dir_sn, gn_sn)) * cos_light / dist2
        contrib_nee = (
            state.alpha
            * le_nee
            * fs_nee
            * (g * mis_w / jnp.maximum(light_pdf, 1e-30))[..., None]
        )
        nee_ok = (
            state.active & nondelta & vis & (light_pdf > 0) & jnp.logical_not(is_env)
        )
        radiance = state.radiance + jnp.where(nee_ok[..., None], contrib_nee, 0.0)

        # --- NEE on the environment sphere -----------------------------
        # InfiniteSphereSurfaceObject::sample (SurfaceObject.cpp:158-185):
        # importance-sample (phi, theta); areaPDF = uvPDF/(2 pi^2 sin) with
        # dist2 = 1 and unit cosine at the infinite light. Compiled only for
        # scenes that have an environment (static flag).
        if scene.has_env:
            env_vis = vis
            le_env = _env_radiance(scene, ex, ey, lambdas)
            fs_env = fs_nee
            env_light_pdf = light_prob * env_area_pdf
            mis_env = power_heuristic(env_light_pdf, pdf_bsdf_w)
            g_env = jnp.abs(dot(shadow_dir_sn, gn_sn))
            contrib_env = (
                state.alpha * le_env * fs_env
                * (g_env * mis_env / jnp.maximum(env_light_pdf, 1e-30))[..., None]
            )
            env_nee_ok = (
                state.active & nondelta & env_vis & is_env
                & (env_light_pdf > 0)
            )
            radiance = radiance + jnp.where(
                env_nee_ok[..., None], contrib_env, 0.0
            )

        # --- BSDF sampling ----------------------------------------------
        uc = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_COMPONENT)
        u0 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_U)
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_V)
        smp = bsdf_sample(lobes, wo, gn_sn, state.hero, state.wl_selected, uc, u0, u1)

        # Detached-sampling differentiability (SURVEY.md §7 delta 4): sampled
        # directions and pdfs are treated as constants under reverse-mode AD;
        # gradients flow through fs / Le / throughput only. Identity in the
        # primal computation.
        smp = smp._replace(
            wi=jax.lax.stop_gradient(smp.wi),
            pdf=jax.lax.stop_gradient(smp.pdf),
        )
        dir_pdf = smp.pdf
        wl_selected = state.wl_selected | smp.dispersive
        dir_pdf = jnp.where(smp.dispersive, dir_pdf / s, dir_pdf)

        cos_sn = jnp.abs(dot(smp.wi, gn_sn))
        new_alpha = state.alpha * smp.fs * (
            cos_sn / jnp.maximum(dir_pdf, 1e-30)
        )[..., None]
        sample_ok = state.active & (dir_pdf > 0) & jnp.logical_not(
            jnp.all(smp.fs == 0.0, axis=-1)
        )

        wi_world = frame_from_local(fx, fy, fz, smp.wi)
        new_o = sp.p
        new_d = wi_world

        # --- Wavefront re-sort for coherence ----------------------------
        # Secondary bounces scatter rays across the scene; re-ordering by
        # (direction octant, origin Morton) keeps each Pallas ray block's
        # chunk worklist short and packs terminated lanes into trailing
        # blocks (which the kernels skip wholesale). Pure permutation —
        # per-lane results agree to fp tolerance, un-permuted at trace end.
        is_delta = smp.is_delta
        if sort_rays:
            from ..core.permute import permute_rows

            key = _ray_sort_key(scene, new_o, new_d, sample_ok)
            order = jnp.argsort(key)
            # ONE packed row gather for the whole carried state (scalar-core
            # per-leaf gathers cost ~0.2 ms each on 49k lanes; see
            # core/permute.py).
            (state, new_o, new_d, sample_ok, new_alpha, radiance, dir_pdf,
             is_delta, wl_selected, pixel_id, sample_id, f_time, lambdas,
             orig) = permute_rows(
                (state, new_o, new_d, sample_ok, new_alpha, radiance,
                 dir_pdf, is_delta, wl_selected, pixel_id, sample_id,
                 f_time, lambdas, orig),
                order,
            )

        # --- Next intersection ------------------------------------------
        hit = isect_fn(scene, new_o, new_d, f=f_time,
                       active=sample_ok)
        sp_next = resolve_fn(scene, hit, new_o, new_d, f=f_time)
        still = sample_ok & hit.mask

        # Implicit emitter hit with MIS (PathTracingRenderer.cpp:232-249).
        cos_out_n = dot(-new_d, sp_next.sn)
        le_hit = emitted_radiance(
            scene, sp_next.mat_id, sp_next.uv, cos_out_n, lambdas
        )
        dp_next = sp_next.p - new_o
        d2 = jnp.maximum(dot(dp_next, dp_next), 1e-12)
        cos_g = jnp.abs(dot(new_d, sp_next.gn))
        l_prob = _area_light_prob(scene)
        light_pdf_hit = l_prob * sp_next.area_pdf * d2 / jnp.maximum(cos_g, 1e-12)
        mis_bsdf = jnp.where(
            is_delta, 1.0, power_heuristic(dir_pdf, light_pdf_hit)
        )
        emissive_hit = still & is_emissive(scene.materials, sp_next.mat_id)
        radiance = radiance + jnp.where(
            emissive_hit[..., None], new_alpha * le_hit * mis_bsdf[..., None], 0.0
        )

        # Escaped ray hits the environment sphere: implicit light sampling
        # with MIS against the env importance map (dist2 = 1, cos = 1).
        if scene.has_env:
            esc = sample_ok & jnp.logical_not(hit.mask)
            ieu, iev = _env_uv_from_direction(new_d)
            env_le_hit = _env_radiance(scene, ieu, iev, lambdas)
            env_uvpdf_hit = pdf_continuous_2d(scene.env.dist, ieu, iev)
            env_pdf_hit = (
                scene.lights.env_prob
                * env_uvpdf_hit
                / jnp.maximum(2.0 * jnp.pi**2 * jnp.sin(iev * jnp.pi), 1e-8)
            )
            mis_env_hit = jnp.where(
                is_delta, 1.0, power_heuristic(dir_pdf, env_pdf_hit)
            )
            radiance = radiance + jnp.where(
                esc[..., None],
                new_alpha * env_le_hit * mis_env_hit[..., None],
                0.0,
            )

        # --- Russian roulette -------------------------------------------
        cont_p = jax.lax.stop_gradient(
            jnp.minimum(
                importance(new_alpha, state.hero)
                / jnp.maximum(state.init_y, 1e-30),
                1.0,
            )
        )
        u_rr = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.RR)
        survive = u_rr < cont_p
        new_alpha = jnp.where(
            survive[..., None],
            new_alpha / jnp.maximum(cont_p, 1e-30)[..., None],
            new_alpha,
        )
        active = still & survive

        new_state = PathState(
            ray_o=new_o,
            ray_d=new_d,
            alpha=jnp.where(active[..., None], new_alpha, state.alpha),
            radiance=radiance,
            active=active,
            hero=state.hero,
            wl_selected=jnp.where(active, wl_selected, state.wl_selected),
            prev_pdf=dir_pdf,
            prev_delta=is_delta,
            init_y=state.init_y,
        )
        return new_state, sp_next, (pixel_id, sample_id, f_time, lambdas,
                                    orig)

    state, _, aux_out = jax.lax.fori_loop(0, max_depth, bounce,
                                          (state, sp, aux))
    radiance_out = state.radiance
    if sort_rays:
        orig = aux_out[-1]
        radiance_out = jnp.zeros_like(radiance_out).at[orig].set(radiance_out)
    return radiance_out, lambdas


def render(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_depth: int = 16,
    ray_batch: int | None = None,
    sample_offset: int = 0,
) -> Array:
    """Render an image by accumulating spp sample passes. Returns (H, W, S)
    of *linear* mean radiance (develop with render/film.py).

    Sample streams are keyed by (seed, absolute sample id = sample_offset+i),
    so splitting an N-spp render into passes — or checkpoint-resuming one —
    reproduces the uninterrupted result bit for bit."""
    from ..spectrum.spectral import NUM_STRATA, strata_to_rgb

    n_pix = width * height
    spectral = scene.stex.spectral
    s_film = NUM_STRATA if spectral else scene.stex.value.shape[-1]

    # Fixed-size ray batches: ONE compiled program (module-level jit; seed,
    # sample ids and resolution are traced data) serves every batch, pass,
    # resolution and seed — remote XLA compiles cost minutes, so any
    # per-call recompile would dominate wall time.
    batch = int(ray_batch or min(n_pix, 65536))
    n_batches = -(-n_pix // batch)

    w_j = jnp.int32(width)
    h_j = jnp.int32(height)
    seed_j = jnp.uint32(seed)
    # Accumulate per batch ON DEVICE and transfer once at the end: a
    # host sync per pass would serialize the tunnel round-trip into every
    # dispatch (PathTracingRenderer's per-tile jobs have no such sync).
    acc: list = [None] * n_batches
    for i in range(spp):
        for b in range(n_batches):
            pixel_id = jnp.arange(
                b * batch, (b + 1) * batch, dtype=jnp.uint32
            )
            sample_id = jnp.full((batch,), sample_offset + i, jnp.uint32)
            out = render_batch(
                scene, pixel_id, sample_id, seed_j, w_j, h_j, max_depth
            )
            acc[b] = out if acc[b] is None else acc[b] + out
    film = np.concatenate([np.asarray(a) for a in acc], axis=0)
    film = jnp.asarray(film[:n_pix]) / spp
    film = film.reshape(height, width, s_film)
    if spectral:
        film = strata_to_rgb(film)
    return film


@partial(jax.jit, static_argnames=("max_depth",))
def render_batch(
    scene: FlatScene,
    pixel_id: Array,
    sample_id: Array,
    seed: Array,
    width: Array,
    height: Array,
    max_depth: int,
) -> Array:
    """One sample pass over one ray batch -> per-pixel film contributions
    ((B, 3) RGB or (B, 16) spectral strata). Everything except max_depth and
    the batch size is traced data, so one compile serves all resolutions,
    seeds and sample indices."""
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES,
        WL_HI,
        WL_LO,
        bin_to_strata,
    )

    pid_c = jnp.minimum(pixel_id, (width * height - 1).astype(jnp.uint32))
    px = (pid_c % width.astype(jnp.uint32)).astype(jnp.float32)
    py = (pid_c // width.astype(jnp.uint32)).astype(jnp.float32)
    jx = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed, pid_c, sample_id, 0, Decision.PIXEL_Y)
    if scene.camera.kind == CameraKind.EQUIRECTANGULAR:
        rays = sample_camera_rays_equirect(
            scene.camera, px + jx, py + jy, width, height
        )
    else:
        lx = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_U)
        ly = rng.uniform(seed, pid_c, sample_id, 0, Decision.LENS_V)
        rays = sample_camera_rays(
            scene.camera, px + jx, py + jy, width, height, lx, ly
        )
    c, lambdas = _trace_core(
        scene, rays.o, rays.d, pid_c, sample_id, seed, max_depth,
        sort_rays=True,
    )
    weight = rays.weight[..., None] * c
    if scene.stex.spectral:
        # selectWLPDF division (PathTracingRenderer.cpp:126) followed by
        # film stratum binning (ImageSensor.cpp:125-139).
        select_wl_pdf = NUM_SPECTRAL_SAMPLES / (WL_HI - WL_LO)
        return bin_to_strata(lambdas, weight / select_wl_pdf)
    return weight


@partial(jax.jit, static_argnames=("width", "height", "spp", "max_depth"))
def render_fused(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_depth: int = 16,
) -> Array:
    """Whole-frame render in a single device program: the spp loop runs as a
    `lax.fori_loop` on-device, avoiding per-pass host dispatch (the axon
    tunnel adds seconds per call). Same estimator as `render`."""
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES,
        NUM_STRATA,
        WL_HI,
        WL_LO,
        bin_to_strata,
        strata_to_rgb,
    )

    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px_i = (pixel_id % width).astype(jnp.float32)
    py_i = (pixel_id // width).astype(jnp.float32)
    spectral = scene.stex.spectral
    s_film = NUM_STRATA if spectral else scene.stex.value.shape[-1]
    seed_u = jnp.uint32(seed)

    def one_pass(i, film):
        sample_id = jnp.full((n_pix,), i, jnp.uint32)
        jx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_X)
        jy = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_Y)
        if scene.camera.kind == CameraKind.EQUIRECTANGULAR:
            rays = sample_camera_rays_equirect(
                scene.camera, px_i + jx, py_i + jy, width, height
            )
        else:
            lx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_U)
            ly = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_V)
            rays = sample_camera_rays(
                scene.camera, px_i + jx, py_i + jy, width, height, lx, ly
            )
        c, lambdas = _trace_core(
            scene, rays.o, rays.d, pixel_id, sample_id, seed_u, max_depth,
            sort_rays=True,
        )
        weight = rays.weight[..., None] * c
        if spectral:
            select_wl_pdf = NUM_SPECTRAL_SAMPLES / (WL_HI - WL_LO)
            return film + bin_to_strata(lambdas, weight / select_wl_pdf)
        return film + weight

    film = jax.lax.fori_loop(
        0, spp, one_pass, jnp.zeros((n_pix, s_film), jnp.float32)
    )
    film = (film / spp).reshape(height, width, s_film)
    if spectral:
        film = strata_to_rgb(film)
    return film
