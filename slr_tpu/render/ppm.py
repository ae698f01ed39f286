"""Progressive photon mapping with adaptive-MCMC photon paths (AMCMCPPM).

TPU-native re-design of the reference's dormant AMCMCPPM renderer
(libSLR/Renderers/AMCMCPPMRenderer.{h,cpp}, Hachisuka & Jensen 2011):

* reference: KD-tree over hitpoints + per-photon range queries
  (AMCMCPPMRenderer.h:27-47, 62-75) → here: a uniform hash grid with
  photons sorted by cell code; hitpoints gather from the 8 neighbour
  cells with a static per-cell photon cap (searchsorted + fixed-K
  gathers — every shape static, fully vectorized on the VPU);
* reference: per-pixel progressive radius/flux statistics → here the same
  SPPM update rule (alpha = 0.7): N' = N + a·M, r²' = r²·N'/(N+M),
  tau' = (tau + sum fs·phi)·r²'/r²;
* reference: primary-sample-space adaptive MCMC mutations of photon paths
  with replica exchange between a uniform and an adaptive sampler
  (PrimarySample::adaptiveMutateElement, AMCMCPPMRenderer.h:77-96;
  ReplicaExchangeSampler h:143-174) → here: a fixed-dimension PSS vector
  per chain (light pick, light position, EDF direction, and per-bounce
  BSDF/RR decisions), Hachisuka's pow-law mutation kernel, mutation size
  adapted toward the measured uniform-visibility rate, and replica
  exchange by swapping in visible uniform candidates. Chain contributions
  are weighted by the running visibility-ratio estimate so the estimator
  stays consistent.

Eye paths pass through delta (specular) vertices like the reference's
hitpoint distribution pass; direct emitter hits accumulate separately.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.intersect import RAY_EPSILON, sample_triangle_point
from ..bsdf.bsdf import (
    bsdf_evaluate,
    bsdf_has_nondelta,
    bsdf_sample,
    emitted_radiance,
    gather_lobes,
    is_emissive,
)
from ..camera.perspective import sample_camera_rays
from ..core import rng
from ..core.math3d import Array, dot, frame_from_local, frame_to_local
from ..core.rng import Decision
from ..core.sampling import cosine_sample_hemisphere
from ..render.pt import _select_light, resolve_sp, scene_intersect_alpha
from ..scene.types import FlatScene

SPPM_ALPHA = 0.7          # progressive shrink rate (Hachisuka 2008)
MUTATE_S1 = 1.0 / 1024.0  # pow-law mutation kernel bounds
MUTATE_S2 = 1.0 / 16.0


class HitPoints(NamedTuple):
    """Per-pixel measurement points (reference HitpointMap entries)."""

    p: Array          # (H, 3) world position
    tangent: Array    # (H, 3)
    bitangent: Array  # (H, 3)
    sn: Array         # (H, 3)
    gn: Array         # (H, 3)
    uv: Array         # (H, 2)
    mat_id: Array     # (H,) int32
    wo: Array         # (H, 3) world direction toward the camera
    alpha: Array      # (H, S) eye-path throughput
    direct: Array     # (H, S) emitter radiance seen directly (no gathering)
    valid: Array      # (H,) bool — landed on a non-delta surface


class PPMState(NamedTuple):
    """Progressive per-pixel statistics + MCMC chain state."""

    r2: Array         # (H,) current gather radius^2
    n: Array          # (H,) accumulated photon count (fractional)
    tau: Array        # (H, S) accumulated unnormalized flux
    direct: Array     # (H, S) accumulated direct radiance
    n_emitted: Array  # () total photons emitted
    # adaptive-MCMC chain state
    chain_u: Array    # (C, D) primary sample of each adaptive chain
    chain_alive: Array  # (C,) bool chain holds a visible path
    mutation_size: Array  # () global adaptive mutation size
    n_visible: Array  # () uniform candidates that were visible
    n_uniform: Array  # () uniform candidates tried


def _pss_dims(max_bounces: int) -> int:
    # light select, pos u, pos v, dir u, dir v + (comp, u, v, rr) per bounce
    return 5 + 4 * max_bounces


def _trace_hitpoints(scene: FlatScene, width: int, height: int,
                     seed: Array, iteration: Array, spectral_s: int,
                     max_specular: int = 4,
                     f_iter: Array | None = None) -> HitPoints:
    """Eye pass: one ray per pixel, followed through delta interactions
    until the first non-delta surface (the reference distributes hitpoints
    the same way before each photon wave)."""
    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    sample_id = jnp.broadcast_to(iteration.astype(jnp.uint32), (n_pix,))
    jx = rng.uniform(seed, pixel_id, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed, pixel_id, sample_id, 0, Decision.PIXEL_Y)
    lu = rng.uniform(seed, pixel_id, sample_id, 0, Decision.LENS_U)
    lv = rng.uniform(seed, pixel_id, sample_id, 0, Decision.LENS_V)
    px = (pixel_id % width).astype(jnp.float32) + jx
    py = (pixel_id // width).astype(jnp.float32) + jy
    rays = sample_camera_rays(scene.camera, px, py, width, height, lu, lv)

    o, d = rays.o, rays.d
    alpha = jnp.ones((n_pix, spectral_s), jnp.float32) * rays.weight[:, None]
    direct = jnp.zeros((n_pix, spectral_s), jnp.float32)
    settled = jnp.zeros((n_pix,), bool)

    f_px = (None if f_iter is None
            else jnp.broadcast_to(f_iter, (n_pix,)))
    hit = scene_intersect_alpha(scene, o, d, f=f_px)
    sp = resolve_sp(scene, hit, o, d, f=f_px)
    le = emitted_radiance(scene, sp.mat_id, sp.uv, dot(-d, sp.sn), None)
    direct = direct + jnp.where(hit.mask[:, None], alpha * le, 0.0)
    alive = hit.mask
    wo_world = -d

    for b in range(max_specular):
        bounce_id = jnp.uint32(b + 1)
        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, None)
        nondelta = bsdf_has_nondelta(lobes)
        # Lanes on a non-delta surface settle here; pure-delta lanes extend.
        settle_now = alive & nondelta & jnp.logical_not(settled)
        settled = settled | settle_now
        extend = alive & jnp.logical_not(settled)

        fx, fy, fz = sp.tangent, sp.bitangent, sp.sn
        wo = frame_to_local(fx, fy, fz, wo_world)
        gn_sn = frame_to_local(fx, fy, fz, sp.gn)
        uc = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_COMPONENT)
        u0 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_U)
        u1 = rng.uniform(seed, pixel_id, sample_id, bounce_id, Decision.BSDF_V)
        smp = bsdf_sample(lobes, wo, gn_sn, jnp.zeros((n_pix,), jnp.int32),
                          jnp.zeros((n_pix,), bool), uc, u0, u1)
        cos_i = jnp.abs(dot(smp.wi, gn_sn))
        w = smp.fs * (cos_i / jnp.maximum(smp.pdf, 1e-30))[:, None]
        new_d = frame_from_local(fx, fy, fz, smp.wi)
        ok = extend & (smp.pdf > 0)

        new_hit = scene_intersect_alpha(scene, sp.p, new_d, f=f_px)
        new_sp = resolve_sp(scene, new_hit, sp.p, new_d, f=f_px)
        le2 = emitted_radiance(scene, new_sp.mat_id, new_sp.uv,
                               dot(-new_d, new_sp.sn), None)
        step = ok & new_hit.mask
        direct = direct + jnp.where(step[:, None], alpha * w * le2, 0.0)
        alpha = jnp.where(step[:, None], alpha * w, alpha)
        wo_world = jnp.where(step[:, None], -new_d, wo_world)
        sp = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                step.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            new_sp, sp)
        alive = jnp.where(extend, step, alive)

    return HitPoints(
        p=sp.p, tangent=sp.tangent, bitangent=sp.bitangent, sn=sp.sn,
        gn=sp.gn, uv=sp.uv, mat_id=sp.mat_id, wo=wo_world,
        alpha=alpha, direct=direct, valid=settled,
    )


class Photons(NamedTuple):
    p: Array      # (P, 3) deposit position
    wi: Array     # (P, 3) world direction the photon ARRIVED from
    power: Array  # (P, S) flux / n.a. (already divided by pdfs)
    valid: Array  # (P,) bool
    path: Array   # (P,) int32 originating photon-path index


def _trace_photons_pss(scene: FlatScene, u: Array, spectral_s: int,
                       max_bounces: int,
                       f_iter: Array | None = None) -> Photons:
    """Trace one photon path per row of the PSS matrix `u` (P, D), depositing
    at every non-delta surface hit. Deterministic in `u` — the requirement
    for MCMC in primary sample space."""
    p_cnt = u.shape[0]
    tri, light_prob, _ = _select_light(scene, u[:, 0])
    lp = sample_triangle_point(scene.geometry, tri, u[:, 1], u[:, 2])
    # Diffuse EDF: Le = emittance/pi; sampled cosine direction.
    le = emitted_radiance(scene, lp.mat_id, lp.uv,
                          jnp.ones((p_cnt,), jnp.float32), None)
    wi_local = cosine_sample_hemisphere(u[:, 3], u[:, 4])
    dir_pdf = jnp.maximum(wi_local[..., 2], 1e-8) / jnp.pi
    d = frame_from_local(lp.tangent, lp.bitangent, lp.sn, wi_local)
    pos_pdf = light_prob * lp.area_pdf
    # power = Le * cos / (pos_pdf * dir_pdf); cos = wi_local.z
    power = le * (wi_local[..., 2] / jnp.maximum(pos_pdf * dir_pdf, 1e-30))[:, None]
    o = lp.p
    alive = pos_pdf > 0

    deposits = []
    path_idx = jnp.arange(p_cnt, dtype=jnp.int32)
    f_p = (None if f_iter is None
           else jnp.broadcast_to(f_iter, (p_cnt,)))
    for b in range(max_bounces):
        hit = scene_intersect_alpha(scene, o, d, f=f_p)
        sp = resolve_sp(scene, hit, o, d, f=f_p)
        ok = alive & hit.mask
        lobes = gather_lobes(scene, sp.mat_id, sp.uv, sp.p, None)
        nondelta = bsdf_has_nondelta(lobes)
        deposits.append(Photons(
            p=sp.p, wi=-d,
            power=jnp.where((ok & nondelta)[:, None], power, 0.0),
            valid=ok & nondelta, path=path_idx,
        ))

        base = 5 + 4 * b
        fx, fy, fz = sp.tangent, sp.bitangent, sp.sn
        wo = frame_to_local(fx, fy, fz, -d)
        gn_sn = frame_to_local(fx, fy, fz, sp.gn)
        smp = bsdf_sample(lobes, wo, gn_sn, jnp.zeros((p_cnt,), jnp.int32),
                          jnp.zeros((p_cnt,), bool),
                          u[:, base], u[:, base + 1], u[:, base + 2])
        cos_i = jnp.abs(dot(smp.wi, gn_sn))
        # adjoint transport along light paths: swap the shading-normal
        # correction direction from wi (sample default) to wo
        # (BSDF::evaluate adjoint rule, h:256-258). Using the SAMPLED fs
        # keeps delta lobes (glass/mirror caustic transport) alive.
        corr_wi = jnp.abs(smp.wi[..., 2]) / jnp.maximum(
            jnp.abs(dot(smp.wi, gn_sn)), 1e-6)
        corr_wo = jnp.abs(wo[..., 2]) / jnp.maximum(
            jnp.abs(dot(wo, gn_sn)), 1e-6)
        fs_adj = smp.fs * (corr_wo / jnp.maximum(corr_wi, 1e-6))[:, None]
        w = fs_adj * (cos_i / jnp.maximum(smp.pdf, 1e-30))[:, None]
        # RR by luminance-ish mean throughput ratio
        cont = jnp.minimum(jnp.mean(w, axis=-1), 1.0)
        survive = u[:, base + 3] < cont
        power = power * w / jnp.maximum(cont, 1e-30)[:, None]
        alive = ok & (smp.pdf > 0) & survive
        o = sp.p
        d = frame_from_local(fx, fy, fz, smp.wi)

    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *deposits)


def _cell_code(p: Array, origin: Array, inv_cell: Array, res: int) -> Array:
    """Hash-grid cell id (flattened 3D index, clipped to the grid)."""
    c = jnp.clip(((p - origin) * inv_cell).astype(jnp.int32), 0, res - 1)
    return (c[..., 0] * res + c[..., 1]) * res + c[..., 2]


def _gather(scene: FlatScene, hp: HitPoints, ph: Photons, r2: Array,
            cell: Array, res: int, k_per_cell: int, spectral_s: int):
    """Photon gathering: photons sorted by cell; each hitpoint scans up to
    k_per_cell photons in each of its 8 neighbour cells (cell size >= 2r so
    the ball of radius r overlaps at most 8 cells). Returns
    (flux (H, S), m_count (H,), visible_path (P_paths,) bool)."""
    origin, inv_cell = cell
    h_cnt = hp.p.shape[0]

    codes = _cell_code(ph.p, origin, inv_cell, res)
    codes = jnp.where(ph.valid, codes, res * res * res)  # invalid -> end
    order = jnp.argsort(codes)
    codes_s = codes[order]
    ph_s = jax.tree_util.tree_map(lambda x: x[order], ph)

    # Neighbour cells: floor((p - r) / cell) .. +1 on each axis.
    lo = jnp.clip(((hp.p - jnp.sqrt(r2)[:, None] - origin) * inv_cell)
                  .astype(jnp.int32), 0, res - 1)

    fx, fy, fz = hp.tangent, hp.bitangent, hp.sn
    wo_l = frame_to_local(fx, fy, fz, hp.wo)
    gn_l = frame_to_local(fx, fy, fz, hp.gn)
    lobes = gather_lobes(scene, hp.mat_id, hp.uv, hp.p, None)
    hero0 = jnp.zeros((h_cnt,), jnp.int32)

    # Candidate photon slots: (H, 8 cells * K) — one vmapped evaluation body
    # instead of 8*K unrolled copies (compile-time and VPU-efficiency win).
    offs = jnp.asarray([(dx, dy, dz) for dx in range(2) for dy in range(2)
                        for dz in range(2)], jnp.int32)  # (8, 3)
    cells = jnp.minimum(lo[:, None, :] + offs[None, :, :], res - 1)  # (H,8,3)
    cc = (cells[..., 0] * res + cells[..., 1]) * res + cells[..., 2]  # (H, 8)
    # At grid borders the clipped neighbour offsets can alias to the same
    # cell; visit only the first occurrence so photons aren't double-counted.
    first = jnp.ones_like(cc, bool)
    for k in range(1, 8):
        dup = jnp.zeros((h_cnt,), bool)
        for m in range(k):
            dup = dup | (cc[:, k] == cc[:, m])
        first = first.at[:, k].set(jnp.logical_not(dup))
    cc = jnp.where(first, cc, -1)  # -1 never matches a photon code
    start = jnp.searchsorted(codes_s, cc)  # (H, 8)
    cand = jnp.minimum(
        start[..., None] + jnp.arange(k_per_cell, dtype=jnp.int32),
        codes_s.shape[0] - 1,
    ).reshape(h_cnt, 8 * k_per_cell)
    cc_rep = jnp.repeat(cc, k_per_cell, axis=-1)  # (H, 8K)

    def eval_column(idx, code):
        """One candidate per hitpoint: idx/code (H,)."""
        in_cell = codes_s[idx] == code
        pp = ph_s.p[idx]
        dpp_ = pp - hp.p
        d2 = dot(dpp_, dpp_)
        near = in_cell & (d2 < r2) & hp.valid & ph_s.valid[idx]
        wi_l = frame_to_local(fx, fy, fz, ph_s.wi[idx])
        fs = bsdf_evaluate(lobes, wo_l, wi_l, gn_l, hero0)
        contrib = jnp.where(near[:, None], fs * ph_s.power[idx], 0.0)
        return contrib, near

    contribs, nears = jax.vmap(eval_column, in_axes=(1, 1), out_axes=0)(
        cand, cc_rep)
    flux = jnp.sum(contribs, axis=0)            # (H, S)
    m_count = jnp.sum(nears, axis=0).astype(jnp.float32)  # (H,)
    visible = jnp.zeros((ph.p.shape[0],), jnp.int32).at[
        order[cand].ravel()
    ].max(nears.T.astype(jnp.int32).ravel())
    return flux, m_count, visible > 0


def _mutate_pss(u: Array, size: Array, xi: Array, sign_u: Array) -> Array:
    """Hachisuka's pow-law primary-sample mutation
    (PrimarySample::adaptiveMutateElement, AMCMCPPMRenderer.h:77-96):
    du = ± s2 · exp(-log(s2/s1)·ξ), scaled by the adaptive mutation size;
    result wraps around [0, 1)."""
    du = size * MUTATE_S2 * jnp.exp(-jnp.log(MUTATE_S2 / MUTATE_S1) * xi)
    v = u + jnp.where(sign_u < 0.5, du, -du)
    return v - jnp.floor(v)


@partial(jax.jit, static_argnames=(
    "width", "height", "n_photon_paths", "max_bounces", "grid_res",
    "k_per_cell", "use_mcmc"))
def ppm_iteration(scene: FlatScene, state: PPMState, width: int, height: int,
                  iteration: Array, seed: Array, n_photon_paths: int,
                  max_bounces: int, grid_res: int, k_per_cell: int,
                  use_mcmc: bool):
    """One progressive pass: distribute hitpoints, trace a photon wave
    (uniform + adaptive chains), gather, update per-pixel statistics."""
    s = 3  # RGB photon mapping (spectral gathering not yet supported)
    # One shared shutter-time sample per progressive pass: hitpoints and
    # photons of a wave must see the SAME scene state (a photon deposited at
    # time t1 cannot illuminate a hitpoint at t2); averaging passes over
    # iterations integrates the shutter. Reference analogue: AMCMCPPM's
    # per-sample time (the reference renderer family is time-aware).
    if scene.instances is not None:
        f_iter = rng.uniform(seed, jnp.uint32(0),
                             iteration.astype(jnp.uint32), 0, Decision.TIME)
    else:
        f_iter = None
    hp = _trace_hitpoints(scene, width, height, seed, iteration, s,
                          f_iter=f_iter)

    # --- photon PSS matrices ------------------------------------------------
    d_dim = _pss_dims(max_bounces)
    pid = jnp.arange(n_photon_paths, dtype=jnp.uint32)
    it32 = iteration.astype(jnp.uint32)
    cols = jnp.arange(d_dim, dtype=jnp.uint32)
    u_uniform = jax.vmap(
        lambda c: rng.uniform(seed + 7, pid, it32 + c * 131071, c, Decision.BSDF_U),
    )(cols).T  # (P, D)

    if use_mcmc:
        xi = jax.vmap(
            lambda c: rng.uniform(seed + 11, pid, it32 + c * 999983, c, Decision.BSDF_V),
        )(cols).T
        sg = jax.vmap(
            lambda c: rng.uniform(seed + 13, pid, it32 + c * 57331, c, Decision.RR),
        )(cols).T
        u_chain = _mutate_pss(state.chain_u, state.mutation_size, xi, sg)
        u_all = jnp.concatenate([u_uniform, u_chain], axis=0)
    else:
        u_all = u_uniform

    ph = _trace_photons_pss(scene, u_all, s, max_bounces,
                            f_iter=f_iter)

    # --- hash grid over current radii --------------------------------------
    r_max = jnp.sqrt(jnp.max(jnp.where(hp.valid, state.r2, 0.0)))
    world_lo = jnp.min(hp.p, axis=0) - r_max
    world_hi = jnp.max(hp.p, axis=0) + r_max
    cell_sz = jnp.maximum(2.0 * r_max, (jnp.max(world_hi - world_lo)) / grid_res)
    inv_cell = 1.0 / jnp.maximum(cell_sz, 1e-12)
    cell = (world_lo, jnp.broadcast_to(inv_cell, (3,)))

    flux, m, visible = _gather(scene, hp, ph, state.r2, cell, grid_res,
                               k_per_cell, s)

    # Chain contributions are weighted by the visibility ratio so the
    # combined (uniform + chain) estimator normalizes correctly; visibility
    # bookkeeping below recomputes the running ratio.
    n_paths_total = u_all.shape[0]

    # --- SPPM statistics update ---------------------------------------------
    new_n = state.n + SPPM_ALPHA * m
    shrink = jnp.where(m > 0, new_n / jnp.maximum(state.n + m, 1e-12), 1.0)
    new_r2 = state.r2 * shrink
    new_tau = (state.tau + hp.alpha * flux) * shrink[:, None]
    new_direct = state.direct + hp.direct
    n_emitted = state.n_emitted + jnp.float32(n_paths_total)

    # --- MCMC bookkeeping ----------------------------------------------------
    if use_mcmc:
        # photon -> path visibility (deposits are (bounces) stacked copies of
        # the path axis).
        vis_per_path = visible.reshape(max_bounces, n_paths_total).max(axis=0)
        uni_vis = vis_per_path[:n_photon_paths]
        chain_vis = vis_per_path[n_photon_paths:]
        # replica exchange: a visible uniform candidate replaces the chain
        swap = uni_vis
        new_chain_u = jnp.where(swap[:, None], u_uniform,
                                jnp.where(chain_vis[:, None], u_chain,
                                          state.chain_u))
        new_alive = swap | chain_vis | state.chain_alive
        n_vis = state.n_visible + jnp.sum(uni_vis)
        n_uni = state.n_uniform + n_photon_paths
        # adapt mutation size toward the uniform visibility ratio
        # (AMCMCPPMRenderer.h adaptive rule): accept-rate target = ratio.
        ratio = n_vis / jnp.maximum(n_uni, 1.0)
        accept = jnp.mean(chain_vis.astype(jnp.float32))
        new_size = jnp.clip(
            state.mutation_size
            + (accept - ratio) / (iteration.astype(jnp.float32) + 1.0),
            1e-4, 1.0)
    else:
        new_chain_u = state.chain_u
        new_alive = state.chain_alive
        n_vis = state.n_visible
        n_uni = state.n_uniform
        new_size = state.mutation_size

    return PPMState(
        r2=new_r2, n=new_n, tau=new_tau, direct=new_direct,
        n_emitted=n_emitted, chain_u=new_chain_u, chain_alive=new_alive,
        mutation_size=new_size, n_visible=n_vis, n_uniform=n_uni,
    )


def init_state(scene: FlatScene, width: int, height: int, r0: float,
               n_chains: int, max_bounces: int) -> PPMState:
    n_pix = width * height
    d_dim = _pss_dims(max_bounces)
    return PPMState(
        r2=jnp.full((n_pix,), r0 * r0, jnp.float32),
        n=jnp.zeros((n_pix,), jnp.float32),
        tau=jnp.zeros((n_pix, 3), jnp.float32),
        direct=jnp.zeros((n_pix, 3), jnp.float32),
        n_emitted=jnp.zeros((), jnp.float32),
        chain_u=jnp.full((n_chains, d_dim), 0.5, jnp.float32),
        chain_alive=jnp.zeros((n_chains,), bool),
        mutation_size=jnp.ones((), jnp.float32),
        n_visible=jnp.zeros((), jnp.float32),
        n_uniform=jnp.zeros((), jnp.float32),
    )


def develop_ppm(state: PPMState, width: int, height: int,
                n_iterations: int) -> Array:
    """Radiance estimate: L = tau / (N_emitted * pi * r²) + direct/iters."""
    indirect = state.tau / jnp.maximum(
        state.n_emitted * jnp.pi * state.r2[:, None], 1e-12)
    direct = state.direct / jnp.maximum(n_iterations, 1)
    img = indirect + direct
    return img.reshape(height, width, 3)


def render_ppm(scene: FlatScene, width: int, height: int,
               n_iterations: int = 8, n_photon_paths: int = 4096,
               max_bounces: int = 4, seed: int = 0, r0: float = None,
               grid_res: int = 64, k_per_cell: int = 8,
               use_mcmc: bool = False) -> Array:
    """Full progressive render. Returns (H, W, 3) linear radiance.

    use_mcmc=True enables the adaptive-MCMC photon sampler (doubles the
    photon budget per pass: uniform wave + chain wave)."""
    if r0 is None:
        # ~2.5 pixel footprints at the world scale: small enough that the
        # 8-cell/K-cap gather rarely saturates, large enough to catch photons
        # in the first waves.
        r0 = float(scene.world_radius) * 2.5 / max(width, height)
    state = init_state(scene, width, height, r0, n_photon_paths, max_bounces)
    seed_u = jnp.uint32(seed)
    for i in range(n_iterations):
        state = ppm_iteration(
            scene, state, width, height, jnp.uint32(i), seed_u,
            n_photon_paths, max_bounces, grid_res, k_per_cell, use_mcmc)
    return develop_ppm(state, width, height, n_iterations)
