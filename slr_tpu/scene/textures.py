"""Vectorized texture evaluation over hit batches.

Counterpart of reference libSLR/Textures/* + libSLR/Core/textures.h. The
reference dispatches through `SpectrumTexture::evaluate` virtuals per hit; here
every texture kind is evaluated branchlessly for the whole wavefront and the
per-hit kind tag selects the result (compute-all-select — the standard TPU
pattern; texture math is a handful of VPU flops so the redundancy is free
compared to gathers).

Image lookups are nearest-neighbor with wrap addressing, matching
image_textures.cpp:13-27. Checker matches checker_board_textures.h:22-25.
Voronoi matches voronoi_textures.cpp:14-85 (FNV-1 cell hash + LCG feature
points, Worley closest-feature distance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math3d import Array
from .types import FloatTextures, FTexKind, SpectrumTextures, STexKind


def _wrap01(x: Array) -> Array:
    """fmod into [0,1) matching image_textures.cpp:15-18 (negative-safe)."""
    f = jnp.mod(x, 1.0)
    return jnp.where(f < 0, f + 1.0, f)


# Distributed-atlas hook (parallel/scene_shard.py): when set, EVERY atlas
# texel fetch — spectrum/float/normal textures, env map, alpha cutouts —
# routes through it with the same (image_hw, image_id, u, v) arguments and
# the `images` argument ignored (the traced scene carries an EMPTY atlas;
# each device holds only its image range and texels psum-assemble).
# Installed with try/finally around a sharded render; participates in
# tracing, so callers must not reuse jit caches across override states.
IMAGE_FETCH_OVERRIDE = None


def _image_fetch(images: Array, image_hw: Array, image_id: Array, u: Array,
                 v: Array) -> Array:
    """Nearest-neighbor RGBA fetch from the stacked image atlas.

    images: (NI, Hmax, Wmax, 4); image_hw: (NI, 2); image_id/u/v: (R,).
    """
    if IMAGE_FETCH_OVERRIDE is not None:
        return IMAGE_FETCH_OVERRIDE(image_hw, image_id, u, v)
    if images.shape[0] == 0:
        return jnp.zeros(u.shape + (4,), jnp.float32)
    iid, py, px = texel_coords(image_hw, image_id, u, v, images.shape[0])
    return images[iid, py, px]  # (R, 4)


def texel_coords(image_hw: Array, image_id: Array, u: Array, v: Array,
                 ni_total: int):
    """(clamped image id, texel row, texel col) for a nearest-neighbor
    fetch — shared by the local path and the sharded-atlas override so
    both address identical texels."""
    iid = jnp.clip(image_id, 0, ni_total - 1)
    hw = image_hw[iid]  # (R, 2)
    h = hw[..., 0]
    w = hw[..., 1]
    uu = _wrap01(u)
    vv = _wrap01(v)
    px = jnp.minimum((uu * w.astype(jnp.float32)).astype(jnp.int32), w - 1)
    py = jnp.minimum((vv * h.astype(jnp.float32)).astype(jnp.int32), h - 1)
    return iid, py, px


# ---------------------------------------------------------------------------
# Voronoi (Worley) cell noise — reference voronoi_textures.cpp
# ---------------------------------------------------------------------------

_FNV_OFFSET = jnp.uint32(2166136261)
_FNV_PRIME = jnp.uint32(16777619)


def _fnv1_hash_3i(ix: Array, iy: Array, iz: Array) -> Array:
    """FNV-1 over the 12 little-endian bytes of three int32 coords
    (voronoi_textures.cpp getFNV1Hash32 over iCoord[3])."""
    h = jnp.broadcast_to(_FNV_OFFSET, ix.shape)
    for comp in (ix, iy, iz):
        c = comp.astype(jnp.uint32)
        for shift in (0, 8, 16, 24):
            byte = (c >> shift) & jnp.uint32(0xFF)
            h = (_FNV_PRIME * h) ^ byte
    return h


def _lcg_next(state: Array) -> tuple[Array, Array]:
    """Numerical-Recipes LCG matching reference LinearCongruentialRNG:
    next = 1664525 * state + 1013904223; float = next / 2^32."""
    state = state * jnp.uint32(1664525) + jnp.uint32(1013904223)
    f = state.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    return state, f


def voronoi_cell_feature(p: Array, scale: Array) -> tuple[Array, Array]:
    """Worley closest-feature search over the 2x2x2 neighborhood.

    p: (R, 3) evaluation points (texcoord or world pos), scale: (R,).
    Returns (closest_hash + idx, closest_distance/scale) — the seed feeding the
    per-cell LCG color draw, matching voronoi_textures.cpp:14-85.
    """
    evalp = p / scale[..., None]
    icoord = jnp.floor(evalp).astype(jnp.int32)
    frac = evalp - icoord.astype(jnp.float32)
    range_base = -1 + jnp.round(frac).astype(jnp.int32)  # (R, 3)

    best_dist = jnp.full(p.shape[:-1], jnp.inf, jnp.float32)
    best_seed = jnp.zeros(p.shape[:-1], jnp.uint32)

    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                cx = icoord[..., 0] + range_base[..., 0] + dx
                cy = icoord[..., 1] + range_base[..., 1] + dy
                cz = icoord[..., 2] + range_base[..., 2] + dz
                h = _fnv1_hash_3i(cx, cy, cz)
                state = h
                state, f0 = _lcg_next(state)
                nfp = 1 + jnp.minimum((8.0 * f0).astype(jnp.int32), 8)
                for i in range(9):
                    state, fx = _lcg_next(state)
                    state, fy = _lcg_next(state)
                    state, fz = _lcg_next(state)
                    fp = jnp.stack(
                        [
                            cx.astype(jnp.float32) + fx,
                            cy.astype(jnp.float32) + fy,
                            cz.astype(jnp.float32) + fz,
                        ],
                        axis=-1,
                    )
                    dist = jnp.linalg.norm(evalp - fp, axis=-1)
                    valid = i < nfp
                    closer = jnp.logical_and(valid, dist < best_dist)
                    best_dist = jnp.where(closer, dist, best_dist)
                    best_seed = jnp.where(closer, h + jnp.uint32(i), best_seed)
    return best_seed, best_dist


def _voronoi_rgb(p: Array, scale: Array, brightness: Array) -> Array:
    seed, _ = voronoi_cell_feature(p, scale)
    state = seed
    state, r = _lcg_next(state)
    state, g = _lcg_next(state)
    state, b = _lcg_next(state)
    return jnp.stack([r, g, b], axis=-1) * brightness[..., None]


# ---------------------------------------------------------------------------
# Public evaluation entry points
# ---------------------------------------------------------------------------

def eval_spectrum_texture(
    stex: SpectrumTextures, tex_id: Array, uv: Array, wpos: Array | None = None
) -> Array:
    """Evaluate spectrum textures for a batch of hits.

    tex_id: (R,) int32 (-1 returns zero); uv: (R, 2). Returns (R, S).
    """
    tid = jnp.clip(tex_id, 0, stex.kind.shape[0] - 1)
    kind = stex.kind[tid]
    scale = stex.map_scale[tid]
    offset = stex.map_offset[tid]
    tc = uv * scale + offset

    out = stex.value[tid]  # CONST

    if stex.has_checker:
        # CHECKER: ((int)(2u) + (int)(2v)) % 2 picks value vs value2.
        sel = jnp.mod(
            (tc[..., 0] * 2).astype(jnp.int32)
            + (tc[..., 1] * 2).astype(jnp.int32), 2
        )
        checker = jnp.where(
            (sel == 0)[..., None], stex.value[tid], stex.value2[tid]
        )
        out = jnp.where((kind == STexKind.CHECKER)[..., None], checker, out)

    # IMAGE
    any_image = bool(stex.images.shape[0] > 0)
    if any_image:
        rgba = _image_fetch(
            stex.images, stex.image_hw, stex.image_id[tid], tc[..., 0], tc[..., 1]
        )
        img_val = rgba[..., :3] * stex.value[tid]  # value holds a scale (ones default)
        out = jnp.where((kind == STexKind.IMAGE)[..., None], img_val, out)

    # VORONOI: value[...,0] stores cell scale, value2[...,0] brightness.
    if stex.has_voronoi:
        p3 = (
            wpos
            if wpos is not None
            else jnp.concatenate([tc, jnp.zeros_like(tc[..., :1])], axis=-1)
        )
        is_vor = kind == STexKind.VORONOI
        vor = _voronoi_rgb(p3, stex.value[tid][..., 0], stex.value2[tid][..., 0])
        if out.shape[-1] == 3:
            out = jnp.where(is_vor[..., None], vor, out)

    return jnp.where((tex_id >= 0)[..., None], out, jnp.zeros_like(out))


def eval_spectrum_texture_spectral(
    stex: SpectrumTextures,
    tex_id: Array,
    uv: Array,
    lambdas: Array,
    wpos: Array | None = None,
) -> Array:
    """Spectral-mode texture evaluation: returns per-wavelength samples (R, N).

    CONST/CHECKER store Meng-Simon (u, v, scale) triples in value/value2
    (pre-converted at build time exactly like the reference's uvs16Fx3 texel
    format, Image.h:24-25); CURVE interpolates a tabulated SPD; IMAGE fetches
    RGB texels and converts on the fly (sRGB->uvs->basis spectra); VORONOI
    draws a cell RGB and upsamples (voronoi_textures.cpp:75-80).
    """
    from ..core.tables import onehot_fetch, pack_columns
    from ..spectrum.spectral import rgb_to_spectrum, upsample_eval

    tid = jnp.clip(tex_id, 0, stex.kind.shape[0] - 1)
    s_val = stex.value.shape[-1]
    row = onehot_fetch(
        pack_columns(stex.kind, stex.map_scale, stex.map_offset, stex.value,
                     stex.value2, stex.curve_id, stex.image_id),
        tid,
    )
    kind = row[..., 0].astype(jnp.int32)
    tc = uv * row[..., 1:3] + row[..., 3:5]
    value = row[..., 5:5 + s_val]
    value2 = row[..., 5 + s_val:5 + 2 * s_val]
    curve_id = row[..., 5 + 2 * s_val].astype(jnp.int32)
    image_id = row[..., 6 + 2 * s_val].astype(jnp.int32)

    def upsample_uvs(uvs: Array) -> Array:
        return upsample_eval(uvs[..., 0], uvs[..., 1], uvs[..., 2], lambdas)

    if stex.has_const:
        out = upsample_uvs(value)  # CONST path
    else:
        # Build pre-tabulated every CONST spectrum into a per-nm curve, so
        # no row needs the grid machinery (compute-all would pay it for
        # every lane otherwise).
        out = jnp.zeros(tid.shape + (lambdas.shape[-1],), jnp.float32)

    if stex.has_checker:
        sel = jnp.mod(
            (tc[..., 0] * 2).astype(jnp.int32)
            + (tc[..., 1] * 2).astype(jnp.int32), 2
        )
        checker_uvs = jnp.where((sel == 0)[..., None], value, value2)
        out = jnp.where(
            (kind == STexKind.CHECKER)[..., None], upsample_uvs(checker_uvs), out
        )

    if stex.has_curve and stex.curves_wl is not None and stex.curves_wl.shape[0] > 0:
        import numpy as _np

        from ..spectrum.spectral import WL_HI, WL_LO

        # Gather-free curve lookup: tables are per-nm regular grids (build
        # time), re-laid into per-stratum windows and fetched with one
        # one-hot matmul + static window selects — TPU element-gathers
        # (and the per-lane searchsorted before them) are catastrophically
        # slow. Same stratified-λ contract as upsample_eval.
        k_n, g = stex.curves_v.shape
        n = lambdas.shape[-1]
        cstarts = _np.floor(_np.arange(n) * (g - 1) / n).astype(_np.int32)
        cw = int(_np.ceil((g - 1) / n)) + 2
        cv = jnp.pad(stex.curves_v, ((0, 0), (0, cw)))
        win = jnp.stack([cv[:, int(s):int(s) + cw] for s in cstarts], axis=1)
        win = win.reshape(k_n, n * cw)

        cid = jnp.clip(curve_id, 0, k_n - 1)
        r = cid.shape[0]
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, (r, k_n), 1) == cid[:, None]
        ).astype(jnp.float32)
        crow = (one_hot @ win).reshape(r, n, cw)

        x = (lambdas - WL_LO) / (WL_HI - WL_LO) * (g - 1)
        xi = jnp.clip(x.astype(jnp.int32), 0, g - 2)
        frac = jnp.clip(x - xi, 0.0, 1.0)
        starts_j = jnp.asarray(cstarts)[None, :]
        loc = jnp.clip(xi - starts_j, 0, cw - 1)[..., None]
        loc_hi = jnp.clip(xi + 1 - starts_j, 0, cw - 1)[..., None]
        wiota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cw), 2)
        selw = (
            (wiota == loc) * (1.0 - frac)[..., None]
            + (wiota == loc_hi) * frac[..., None]
        )
        curve = jnp.sum(crow * selw, axis=-1)
        curve = curve * value[..., 0:1]  # scale stored in value[0]
        out = jnp.where((kind == STexKind.CURVE)[..., None], curve, out)

    if stex.images.shape[0] > 0:
        rgba = _image_fetch(
            stex.images, stex.image_hw, image_id, tc[..., 0], tc[..., 1]
        )
        img_spec = rgb_to_spectrum(rgba[..., :3], lambdas) * value[..., 2:3]
        out = jnp.where((kind == STexKind.IMAGE)[..., None], img_spec, out)

    if stex.has_voronoi:
        p3 = (
            wpos
            if wpos is not None
            else jnp.concatenate([tc, jnp.zeros_like(tc[..., :1])], axis=-1)
        )
        is_vor = kind == STexKind.VORONOI
        vor = rgb_to_spectrum(
            _voronoi_rgb(p3, value[..., 0], value2[..., 0]), lambdas
        )
        out = jnp.where(is_vor[..., None], vor, out)

    return jnp.where((tex_id >= 0)[..., None], out, jnp.zeros_like(out))


def eval_stex(
    stex: SpectrumTextures,
    tex_id: Array,
    uv: Array,
    lambdas: Array | None = None,
    wpos: Array | None = None,
) -> Array:
    """Mode dispatch: RGB (S=3) vs spectral (per-wavelength) evaluation.
    `stex.spectral` is static metadata, so jit specializes one branch."""
    if stex.spectral:
        assert lambdas is not None, "spectral scene requires wavelength samples"
        return eval_spectrum_texture_spectral(stex, tex_id, uv, lambdas, wpos)
    return eval_spectrum_texture(stex, tex_id, uv, wpos)


def _eval_ftex_base(ftex: FloatTextures, tid: Array, uv: Array,
                    images: Array | None, image_hw: Array | None,
                    wpos: Array | None) -> Array:
    """Evaluate the non-recursive float-texture kinds at table rows `tid`.
    All per-row attributes arrive via ONE one-hot row fetch
    (core/tables.py) instead of seven element-gathers."""
    from ..core.tables import onehot_fetch, pack_columns

    row = onehot_fetch(
        pack_columns(ftex.kind, ftex.value, ftex.value2, ftex.map_scale,
                     ftex.map_offset, ftex.image_id),
        tid,
    )
    kind = row[..., 0].astype(jnp.int32)
    value = row[..., 1]
    value2 = row[..., 2]
    tc = uv * row[..., 3:5] + row[..., 5:7]
    image_id = row[..., 7].astype(jnp.int32)

    out = value  # CONST
    sel = jnp.mod(
        (tc[..., 0] * 2).astype(jnp.int32) + (tc[..., 1] * 2).astype(jnp.int32), 2
    )
    checker = jnp.where(sel == 0, value, value2)
    out = jnp.where(kind == FTexKind.CHECKER, checker, out)
    if ftex.has_image and images is not None and images.shape[0] > 0:
        rgba = _image_fetch(images, image_hw, image_id,
                            tc[..., 0], tc[..., 1])
        lum = (0.2126 * rgba[..., 0] + 0.7152 * rgba[..., 1]
               + 0.0722 * rgba[..., 2])
        chan = jnp.where(value2 >= 3.0, rgba[..., 3], lum)
        out = jnp.where(kind == FTexKind.IMAGE, chan * value, out)
    if ftex.has_voronoi:
        p3 = (wpos if wpos is not None
              else jnp.concatenate([tc, jnp.zeros_like(tc[..., :1])], axis=-1))
        seed, _ = voronoi_cell_feature(p3, value2)
        _, f = _lcg_next(seed)
        out = jnp.where(kind == FTexKind.VORONOI, f * value, out)
    return out


def eval_float_texture(ftex: FloatTextures, tex_id: Array, uv: Array,
                       images: Array | None = None,
                       image_hw: Array | None = None,
                       wpos: Array | None = None) -> Array:
    """Evaluate float textures. tex_id: (R,) (-1 returns 0). Returns (R,).

    Covers the reference FloatTexture variants (textures.h:54-80): constant,
    image (luminance or alpha channel), checkerboard, Worley/voronoi, plus
    the ONE_MINUS complement used by texture-lerped MixedSurfaceMaterial."""
    tid = jnp.clip(tex_id, 0, ftex.kind.shape[0] - 1)
    out = _eval_ftex_base(ftex, tid, uv, images, image_hw, wpos)
    if ftex.has_one_minus:
        src = jnp.clip(ftex.image_id[tid], 0, ftex.kind.shape[0] - 1)
        inv = 1.0 - _eval_ftex_base(ftex, src, uv, images, image_hw, wpos)
        out = jnp.where(ftex.kind[tid] == FTexKind.ONE_MINUS, inv, out)
    return jnp.where(tex_id >= 0, out, jnp.zeros_like(out))


def eval_float_texture_default1(ftex: FloatTextures, tex_id: Array, uv: Array,
                                images: Array | None = None,
                                image_hw: Array | None = None,
                                wpos: Array | None = None) -> Array:
    """Like eval_float_texture but -1 means 1.0 (lobe weight default)."""
    v = eval_float_texture(ftex, tex_id, uv, images, image_hw, wpos)
    return jnp.where(tex_id >= 0, v, jnp.ones_like(v))


def eval_normal_texture(
    ntex, images: Array, image_hw: Array, tex_id: Array, uv: Array
) -> Array:
    """Tangent-space normal from the normal-map table. tex_id: (R,), -1 ->
    (0,0,1). Image maps decode rgb*2-1 (standard normal-map encoding);
    checker synthesizes step edges per CheckerBoardNormal3DTexture
    (checker_board_textures.cpp:16-44).
    """
    from .types import NTexKind

    tid = jnp.clip(tex_id, 0, ntex.kind.shape[0] - 1)
    kind = ntex.kind[tid]
    tc = uv * ntex.map_scale[tid] + ntex.map_offset[tid]

    out = jnp.zeros(uv.shape[:-1] + (3,), jnp.float32).at[..., 2].set(1.0)

    if images.shape[0] > 0:
        rgba = _image_fetch(images, image_hw, ntex.image_id[tid], tc[..., 0],
                            tc[..., 1])
        n_img = rgba[..., :3] * 2.0 - 1.0
        n_img = n_img / jnp.maximum(
            jnp.linalg.norm(n_img, axis=-1, keepdims=True), 1e-6
        )
        out = jnp.where((kind == NTexKind.IMAGE)[..., None], n_img, out)

    # Checker step edges.
    hw = ntex.step_width[tid] * 0.5
    wu = jnp.mod(jnp.abs(tc[..., 0]), 1.0)
    wv = jnp.mod(jnp.abs(tc[..., 1]), 1.0)
    ucomp = jnp.where(
        (wu < hw * 0.5) | (wu > 1.0 - hw * 0.5), 1.0,
        jnp.where((wu > 0.5 - hw * 0.5) & (wu < 0.5 + hw * 0.5), -1.0, 0.0),
    )
    vcomp = jnp.where(
        (wv < hw * 0.5) | (wv > 1.0 - hw * 0.5), 1.0,
        jnp.where((wv > 0.5 - hw * 0.5) & (wv < 0.5 + hw * 0.5), -1.0, 0.0),
    )
    ucomp = jnp.where(wv > 0.5, -ucomp, ucomp)
    vcomp = jnp.where(wu > 0.5, -vcomp, vcomp)
    rev = ntex.reverse[tid] > 0.5
    ucomp = jnp.where(rev, -ucomp, ucomp)
    vcomp = jnp.where(rev, -vcomp, vcomp)
    n_chk = jnp.stack([ucomp, vcomp, jnp.ones_like(ucomp)], axis=-1)
    n_chk = n_chk / jnp.linalg.norm(n_chk, axis=-1, keepdims=True)
    out = jnp.where((kind == NTexKind.CHECKER)[..., None], n_chk, out)

    default = jnp.zeros_like(out).at[..., 2].set(1.0)
    return jnp.where((tex_id >= 0)[..., None], out, default)


def perturb_frame(sp, nlocal: Array):
    """Bump mapping: rebuild the shading frame from a tangent-space normal
    (BumpSingleSurfaceObject::getSurfacePoint, SurfaceObject.cpp:122-134)."""
    from ..core.math3d import frame_from_local, normalize

    ex = jnp.zeros_like(nlocal).at[..., 0].set(1.0)
    ey = jnp.zeros_like(nlocal).at[..., 1].set(1.0)
    ndx = jnp.sum(nlocal * ex, axis=-1, keepdims=True)
    ndy = jnp.sum(nlocal * ey, axis=-1, keepdims=True)
    t_local = ex - ndx * nlocal
    b_local = ey - ndy * nlocal
    fx, fy, fz = sp.tangent, sp.bitangent, sp.sn
    t = normalize(frame_from_local(fx, fy, fz, t_local))
    b = normalize(frame_from_local(fx, fy, fz, b_local))
    n = normalize(frame_from_local(fx, fy, fz, nlocal))
    return sp._replace(tangent=t, bitangent=b, sn=n)
