"""Full spectral pipeline: hero-wavelength sampling, Meng-Simon upsampling,
continuous-spectrum evaluation, and the 16-strata sensor reduction.

Reference semantics reproduced here:
  - WavelengthSamples::createWithEqualOffsets (SpectrumTypes.h:54-64):
    N=16 stratified wavelengths over [360, 830]nm, hero index from uLambda,
    PDF = N / range.
  - UpsampledContinuousSpectrum::evaluate (SpectrumTypes.h:239-339): uv-grid
    cell lookup in the Meng-Simon 12x14 grid; inside cells do 4-point
    bilinear interpolation of 95-sample basis spectra, boundary cells walk a
    triangle fan and use barycentric weights. Vectorized here: the fan walk
    becomes a masked unrolled loop over at most 5 triangles.
  - Upsampling::sRGB_to_uvs (Spectrum.h:148-170), xy_to_uv (:136-141).
  - DiscretizedSpectrum strata CMFs (SpectrumTypes.h:744-800) and
    SpectrumStorage::add stratum binning (:826-835): the per-stratum
    integrated CMFs come from trapezoid integration of the 1nm CIE tables.
  - Regular/Irregular continuous spectra (libSLR/Core/distributions-adjacent
    RegularContinuousSpectrum / IrregularContinuousSpectrum): linear interp.

Data tables live in spectrum/data/*.npz (extracted public data; see
tools/extract_spectral_data.py).
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math3d import Array

WL_LO = 360.0
WL_HI = 830.0
NUM_SPECTRAL_SAMPLES = 16   # references.h:39 NumSpectralSamples
NUM_STRATA = 16             # references.h:40 NumStrataForStorage
GRID_W = 12
GRID_H = 14
MAX_FAN = 6

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@functools.cache
def _raw(name: str):
    return np.load(os.path.join(_DATA_DIR, name))


@functools.cache
def upsampling_tables():
    """Meng-Simon grid tables.

    Cached as NUMPY arrays on purpose: jit embeds them as program constants,
    and caching `jnp.asarray` results would trap tracers if the first call
    happened under a trace (UnexpectedTracerError on the next program)."""
    d = _raw("upsampling.npz")
    return {
        "inside": d["grid_inside"].astype(np.int32),
        "num_points": d["grid_num_points"].astype(np.int32),
        "idx": d["grid_idx"].astype(np.int32),
        "dp_uv": np.asarray(d["dp_uv"]),
        "dp_spectra": np.asarray(d["dp_spectra"]),
        "eer": float(d["equal_energy_reflectance"]),
    }


@functools.cache
def cie_tables():
    # numpy on purpose — see upsampling_tables.
    d = _raw("cie.npz")
    return {
        "xbar": np.asarray(d["xbar"]),
        "ybar": np.asarray(d["ybar"]),
        "zbar": np.asarray(d["zbar"]),
        "d65": np.asarray(d["d65"]),
        "colorchecker": np.asarray(d["colorchecker"]),
    }


@functools.cache
def strata_cmfs() -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Per-stratum integrated CMFs (DiscretizedSpectrum::init semantics):
    trapezoid-integrate the 1nm CMF tables into NUM_STRATA bins over
    [360, 830]; integralCMF = sum of the ybar strata."""
    d = _raw("cie.npz")
    n = d["xbar"].shape[0]
    wl = np.linspace(WL_LO, WL_HI, n)
    bins = np.linspace(WL_LO, WL_HI, NUM_STRATA + 1)
    out = []
    for key in ("xbar", "ybar", "zbar"):
        f = d[key].astype(np.float64)
        acc = np.zeros(NUM_STRATA)
        # trapezoid integration with bin-boundary splitting
        for i in range(n - 1):
            a, b = wl[i], wl[i + 1]
            fa, fb = f[i], f[i + 1]
            ia = min(int((a - WL_LO) / (WL_HI - WL_LO) * NUM_STRATA), NUM_STRATA - 1)
            ib = min(int((b - WL_LO) / (WL_HI - WL_LO) * NUM_STRATA), NUM_STRATA - 1)
            if ia == ib:
                acc[ia] += 0.5 * (fa + fb) * (b - a)
            else:
                mid = bins[ia + 1]
                t = (mid - a) / (b - a)
                fm = fa * (1 - t) + fb * t
                acc[ia] += 0.5 * (fa + fm) * (mid - a)
                acc[ib] += 0.5 * (fm + fb) * (b - mid)
        out.append(acc.astype(np.float32))
    integral = float(out[1].sum())
    return out[0], out[1], out[2], integral


class WavelengthSamples(NamedTuple):
    lambdas: Array   # (R, N) wavelengths in nm
    hero: Array      # (R,) int32 selected hero index
    pdf: Array       # () or (R,) selection pdf = N / range


def sample_wavelengths(offset: Array, u_select: Array) -> WavelengthSamples:
    """Stratified hero-wavelength set (SpectrumTypes.h:54-64)."""
    n = NUM_SPECTRAL_SAMPLES
    i = jnp.arange(n, dtype=jnp.float32)
    lambdas = WL_LO + (WL_HI - WL_LO) * (i[None, :] + offset[..., None]) / n
    hero = jnp.minimum((u_select * n).astype(jnp.int32), n - 1)
    pdf = jnp.full_like(offset, n / (WL_HI - WL_LO))
    return WavelengthSamples(lambdas=lambdas, hero=hero, pdf=pdf)


# ---------------------------------------------------------------------------
# RGB -> uvs (Meng-Simon coordinates)
# ---------------------------------------------------------------------------

_sRGB_E_to_XYZ = np.array(
    [[0.4969, 0.3391, 0.1640], [0.2562, 0.6782, 0.0656], [0.0233, 0.1130, 0.8637]],
    np.float32,
)
_sRGB_to_XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    np.float32,
)


def xy_to_uv(xy: Array) -> Array:
    """Spectrum.h:136-141."""
    u = 16.730260708356887 * xy[..., 0] + 7.7801960340706 * xy[..., 1] - 2.170152247475828
    v = -7.530081094743006 * xy[..., 0] + 16.192422314095225 * xy[..., 1] + 1.1125529268825947
    return jnp.stack([u, v], axis=-1)


def srgb_to_uvs(rgb: Array, illuminant: bool = False) -> Array:
    """rgb (..., 3) -> (u, v, scale) per Upsampling::sRGB_to_uvs
    (Spectrum.h:148-170). Reflectance/IoR use the equal-energy sRGB matrix."""
    m = jnp.asarray(_sRGB_to_XYZ if illuminant else _sRGB_E_to_XYZ)
    xyz = jnp.einsum("ij,...j->...i", m, rgb)
    b = jnp.sum(xyz, axis=-1)
    safe_b = jnp.where(b == 0, 1.0, b)
    xy = jnp.stack(
        [
            jnp.where(b == 0, 1.0 / 3, xyz[..., 0] / safe_b),
            jnp.where(b == 0, 1.0 / 3, xyz[..., 1] / safe_b),
        ],
        axis=-1,
    )
    uv = xy_to_uv(xy)
    return jnp.concatenate([uv, b[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Upsampled spectrum evaluation
# ---------------------------------------------------------------------------

WIN_W = 8  # per-stratum basis-column window width (covers ceil(94/16)+2)


@functools.cache
def upsampling_packed():
    """Gather-free evaluation tables (numpy; embedded as jit constants).

    TPU element-gathers cost ~7ns/element, so the original formulation
    (7 point-row gathers + 14 per-lane column gathers per call) ran at
    >100ms per 49k-lane evaluation. This packing turns every lookup into
    either one small one-hot matmul or a static window select:

    cell:   (168, 20) per-grid-cell row = [inside, num_points, idx0..5,
            uv0..uv5] — ONE one-hot(168) matmul fetches everything the
            bilinear/fan logic needs, including the data-point uv positions.
    win:    (P, 16*WIN_W) basis spectra re-laid per wavelength stratum: for
            hero-stratified sample sets, stratum i's basis column index
            always falls in [starts[i], starts[i]+WIN_W-2], so the λ
            interpolation is a static window select after one (R,P)@(P,128)
            MXU contraction.
    starts: (16,) window origins, floor(i*(C-1)/16).
    """
    t = upsampling_tables()
    spectra = t["dp_spectra"]
    p_n, c = spectra.shape
    n = NUM_SPECTRAL_SAMPLES
    starts = np.floor(np.arange(n) * (c - 1) / n).astype(np.int32)
    win = np.zeros((p_n, n, WIN_W), np.float32)
    for i, s0 in enumerate(starts):
        e = min(s0 + WIN_W, c)
        win[:, i, : e - s0] = spectra[:, s0:e]
    idx = t["idx"]  # (168, 6)
    uv6 = t["dp_uv"][np.clip(idx, 0, p_n - 1)].reshape(idx.shape[0], 12)
    cell = np.concatenate(
        [
            t["inside"].astype(np.float32)[:, None],
            t["num_points"].astype(np.float32)[:, None],
            idx.astype(np.float32),
            uv6.astype(np.float32),
        ],
        axis=1,
    )
    return {
        "win": win.reshape(p_n, n * WIN_W),
        "starts": starts,
        "cell": cell.astype(np.float32),
        "n_points": p_n,
        "n_basis": c,
    }


def upsample_eval(u: Array, v: Array, scale: Array, lambdas: Array) -> Array:
    """Evaluate the Meng-Simon upsampled spectrum at `lambdas`.

    u/v/scale: (..., ) grid coords + brightness; lambdas: (..., N) nm.
    Returns (..., N). Same math as UpsampledContinuousSpectrum::evaluate
    (SpectrumTypes.h:239-339), reformulated gather-free for TPU: one-hot
    matmuls against packed tables + per-stratum window selects (see
    upsampling_packed). Contract: lambda sample i must lie near wavelength
    stratum i — true for every stratified hero set and for monotone
    16-λ grids; arbitrary per-slot wavelengths are clamped to the window.
    """
    pk = upsampling_packed()
    lead = u.shape
    n = lambdas.shape[-1]
    r = int(np.prod(lead)) if lead else 1
    u = u.reshape(r)
    v = v.reshape(r)
    scale_f = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), lead).reshape(r)
    lam = lambdas.reshape(r, n)

    in_grid = (u >= 0) & (u < GRID_W) & (v >= 0) & (v < GRID_H)
    uc = jnp.clip(u, 0.0, GRID_W - 1e-4)
    vc = jnp.clip(v, 0.0, GRID_H - 1e-4)
    ui = uc.astype(jnp.int32)
    vi = vc.astype(jnp.int32)
    cell = ui + GRID_W * vi

    # ONE one-hot matmul fetches the whole per-cell row.
    cell_tab = jnp.asarray(pk["cell"])  # (168, 20)
    n_cells = cell_tab.shape[0]
    cell_1h = (
        jax.lax.broadcasted_iota(jnp.int32, (r, n_cells), 1)
        == cell[:, None]
    ).astype(jnp.float32)
    row = cell_1h @ cell_tab  # (R, 20)
    inside = row[:, 0] > 0.5
    num_points = row[:, 1].astype(jnp.int32)
    idx6 = row[:, 2:8].astype(jnp.int32)          # (R, 6) data-point ids
    uv6 = row[:, 8:20].reshape(r, 6, 2)           # (R, 6, 2) their uvs

    # --- inside: bilinear over the 4 quad corners (slots 0..3) -------------
    s = uc - ui
    tt = vc - vi
    w_in4 = jnp.stack(
        [(1 - s) * (1 - tt), s * (1 - tt), (1 - s) * tt, s * tt], axis=-1
    )

    # --- boundary: triangle fan around slot 0 ------------------------------
    p0 = uv6[:, 0]
    ex = uc - p0[:, 0]
    ey = vc - p0[:, 1]
    found = jnp.zeros((r,), bool)
    slot_w_fan = jnp.zeros((r, MAX_FAN), jnp.float32)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (r, MAX_FAN), 1)

    e_prev = uv6[:, 1] - p0
    uu = e_prev[:, 0] * ey - ex * e_prev[:, 1]
    for i in range(1, MAX_FAN):
        denom = jnp.maximum(num_points - 1, 1)
        sel_slot = jnp.mod(i, denom) + 1           # (R,) in 1..5
        sel_uv = jnp.sum(
            jnp.where((slot_ids == sel_slot[:, None])[..., None], uv6, 0.0),
            axis=1,
        )
        e1 = sel_uv - p0
        vv = ex * e1[:, 1] - e1[:, 0] * ey
        area = e_prev[:, 0] * e1[:, 1] - e1[:, 0] * e_prev[:, 1]
        safe_area = jnp.where(area == 0, 1.0, area)
        bu = uu / safe_area
        bv = vv / safe_area
        bw = 1.0 - bu - bv
        valid_iter = (i < num_points) & jnp.logical_not(found)
        hit = (
            valid_iter & (bu >= -1e-6) & (bv >= -1e-6) & (bw >= -1e-6)
            & (area != 0)
        )
        # Winning barycentrics attach to slots (sel_slot, i, 0).
        add = (
            bu[:, None] * (slot_ids == sel_slot[:, None])
            + bv[:, None] * (slot_ids == i)
            + bw[:, None] * (slot_ids == 0)
        )
        slot_w_fan = jnp.where(hit[:, None], add, slot_w_fan)
        found = found | hit
        cont = valid_iter & jnp.logical_not(hit)
        uu = jnp.where(cont, -vv, uu)
        e_prev = jnp.where(cont[:, None], e1, e_prev)

    slot_w = jnp.where(
        inside[:, None],
        jnp.concatenate([w_in4, jnp.zeros((r, MAX_FAN - 4))], axis=1),
        slot_w_fan,
    )
    ok = in_grid & (inside | found)
    slot_w = jnp.where(ok[:, None], slot_w, 0.0) * scale_f[:, None]

    # --- combine basis spectra on the MXU ----------------------------------
    # Linearity: interp_λ(Σ_k w_k·basis[p_k]) = Σ_k w_k·interp_λ(basis[p_k]),
    # so one accumulated one-hot weight matrix + one matmul replaces seven
    # row gathers.
    p_n = pk["n_points"]
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (r, p_n), 1)
    a = jnp.zeros((r, p_n), jnp.float32)
    for k in range(MAX_FAN):
        a = a + slot_w[:, k:k + 1] * (iota_p == idx6[:, k:k + 1])
    spw = (a @ jnp.asarray(pk["win"])).reshape(r, n, WIN_W)

    # --- per-stratum window select at the sample wavelengths ---------------
    n_basis = pk["n_basis"]
    p = (lam - WL_LO) / (WL_HI - WL_LO)
    sbinf = jnp.clip(p, 0.0, 1.0) * (n_basis - 1)
    sbin = jnp.minimum(sbinf.astype(jnp.int32), n_basis - 1)
    sbin_next = jnp.minimum(sbin + 1, n_basis - 1)
    frac = sbinf - sbin
    starts = jnp.asarray(pk["starts"])[None, :]   # (1, N)
    loc = jnp.clip(sbin - starts, 0, WIN_W - 1)[..., None]
    loc_hi = jnp.clip(sbin_next - starts, 0, WIN_W - 1)[..., None]
    wiota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN_W), 2)
    sel = (
        (wiota == loc) * (1.0 - frac)[..., None]
        + (wiota == loc_hi) * frac[..., None]
    )
    val = jnp.sum(spw * sel, axis=-1)
    return val.reshape(*lead, n)


def upsample_tabulate_host(u: float, v: float, scale: float,
                           lam_grid: np.ndarray) -> np.ndarray:
    """Host-side (numpy) evaluation of one upsampled spectrum on a dense
    wavelength grid — used at scene build to pre-tabulate CONSTANT spectral
    textures into per-nm curves (the basis spectra are piecewise-linear with
    exactly 5nm knots, so a per-nm resample is exact). Direct port of
    UpsampledContinuousSpectrum::evaluate (SpectrumTypes.h:239-339)."""
    t = upsampling_tables()
    if not (0 <= u < GRID_W and 0 <= v < GRID_H):
        return np.zeros_like(lam_grid, dtype=np.float32)
    ui, vi = int(u), int(v)
    cell = ui + GRID_W * vi
    inside = int(t["inside"][cell]) == 1
    num_points = int(t["num_points"][cell])
    idx = t["idx"][cell]
    spectra = t["dp_spectra"]

    if inside:
        s, tt = u - ui, v - vi
        pts = [
            (idx[0], (1 - s) * (1 - tt)),
            (idx[1], s * (1 - tt)),
            (idx[2], (1 - s) * tt),
            (idx[3], s * tt),
        ]
    else:
        dp_uv = t["dp_uv"]
        p0 = dp_uv[idx[0]]
        ex, ey = u - p0[0], v - p0[1]
        e_prev = dp_uv[idx[1]] - p0
        uu = e_prev[0] * ey - ex * e_prev[1]
        pts = None
        for i in range(1, max(num_points, 1)):
            sel_slot = i % max(num_points - 1, 1) + 1
            sel = idx[sel_slot]
            e1 = dp_uv[sel] - p0
            vv = ex * e1[1] - e1[0] * ey
            area = e_prev[0] * e1[1] - e1[0] * e_prev[1]
            if area != 0:
                bu, bv = uu / area, vv / area
                bw = 1.0 - bu - bv
                if bu >= -1e-6 and bv >= -1e-6 and bw >= -1e-6:
                    pts = [(sel, bu), (idx[min(i, MAX_FAN - 1)], bv),
                           (idx[0], bw)]
                    break
            uu = -vv
            e_prev = e1
        if pts is None:
            return np.zeros_like(lam_grid, dtype=np.float32)

    basis = sum(w * spectra[p] for p, w in pts)
    c = spectra.shape[1]
    x = np.clip((lam_grid - WL_LO) / (WL_HI - WL_LO), 0.0, 1.0) * (c - 1)
    xi = np.minimum(x.astype(np.int32), c - 1)
    xn = np.minimum(xi + 1, c - 1)
    frac = x - xi
    return (basis[xi] * (1 - frac) + basis[xn] * frac).astype(
        np.float32
    ) * np.float32(scale)


def rgb_to_spectrum(rgb: Array, lambdas: Array, illuminant: bool = False) -> Array:
    """Full RGB -> spectrum chain for reflectance-type inputs.

    The reference pre-converts texels to uvs with s/EqualEnergyReflectance
    (Image.h uvs16Fx3 path; image_textures.cpp:24-27); the same normalization
    makes rgb (1,1,1) evaluate to a flat reflectance of 1.
    """
    uvs = srgb_to_uvs(rgb, illuminant=illuminant)
    t = upsampling_tables()
    scale = uvs[..., 2] / (1.0 if illuminant else t["eer"])
    return upsample_eval(uvs[..., 0], uvs[..., 1], scale, lambdas)


# ---------------------------------------------------------------------------
# Regular / irregular tabulated spectra (D65, IORs, ColorChecker)
# ---------------------------------------------------------------------------

def eval_regular_spectrum(values: Array, wl_lo: float, wl_hi: float,
                          lambdas: Array) -> Array:
    """Linear interpolation of a regularly sampled SPD; zero outside."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    x = (lambdas - wl_lo) / (wl_hi - wl_lo) * (n - 1)
    xi = jnp.clip(x.astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(x - xi, 0.0, 1.0)
    v = values[xi] * (1 - frac) + values[xi + 1] * frac
    return jnp.where((lambdas >= wl_lo) & (lambdas <= wl_hi), v, 0.0)


def eval_irregular_spectrum(wls: Array, values: Array, lambdas: Array) -> Array:
    """Piecewise-linear interp over irregular sample positions."""
    idx = jnp.clip(jnp.searchsorted(wls, lambdas) - 1, 0, wls.shape[0] - 2)
    lo = wls[idx]
    hi = wls[idx + 1]
    frac = jnp.clip((lambdas - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)
    v = values[idx] * (1 - frac) + values[idx + 1] * frac
    return jnp.where((lambdas >= wls[0]) & (lambdas <= wls[-1]), v, 0.0)


@functools.cache
def ior_spectrum(name: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lambdas, etas, ks) arrays for a named IOR (SpectrumLibrary::IORs)."""
    d = _raw("iors.npz")
    return d[f"{name}_lambdas"], d[f"{name}_etas"], d[f"{name}_ks"]


def d65_spectrum(lambdas: Array) -> Array:
    return eval_regular_spectrum(cie_tables()["d65"], 300.0, 830.0, lambdas)


def colorchecker_spectrum(patch: int, lambdas: Array) -> Array:
    return eval_regular_spectrum(
        cie_tables()["colorchecker"][patch], 380.0, 730.0, lambdas
    )


# ---------------------------------------------------------------------------
# Sensor: stratum binning + XYZ/sRGB development
# ---------------------------------------------------------------------------

def bin_to_strata(lambdas: Array, values: Array) -> Array:
    """SpectrumStorage::add (SpectrumTypes.h:826-835): scatter the N hero
    samples into 16 wavelength strata, scaled by strata/range. Returns (R, 16)."""
    rec_bin_width = NUM_STRATA / (WL_HI - WL_LO)
    sbin = jnp.minimum(
        ((lambdas - WL_LO) / (WL_HI - WL_LO) * NUM_STRATA).astype(jnp.int32),
        NUM_STRATA - 1,
    )
    onehot = jax.nn.one_hot(sbin, NUM_STRATA, dtype=values.dtype)  # (R, N, 16)
    return jnp.einsum("rn,rns->rs", values * rec_bin_width, onehot)


def strata_to_rgb(strata: Array) -> Array:
    """DiscretizedSpectrum::getRGB (SpectrumTypes.h:700-722): strata -> XYZ
    via integrated CMFs / integralCMF -> linear sRGB."""
    xb, yb, zb, integral = strata_cmfs()
    xyz = jnp.stack(
        [
            strata @ jnp.asarray(xb),
            strata @ jnp.asarray(yb),
            strata @ jnp.asarray(zb),
        ],
        axis=-1,
    ) / integral
    m = jnp.asarray(
        np.array(
            [
                [3.2404542, -1.5371385, -0.4985314],
                [-0.9692660, 1.8760108, 0.0415560],
                [0.0556434, -0.2040259, 1.0572252],
            ],
            np.float32,
        )
    )
    return jnp.einsum("ij,...j->...i", m, xyz)
