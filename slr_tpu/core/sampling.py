"""Sampling routines and piecewise-constant distributions.

TPU-native counterpart of reference libSLR/Core/distributions.{h,cpp}:
analytic mappings (:15-64), RegularConstantDiscrete1D (:68-89),
RegularConstantContinuous1D (:93-112), RegularConstantContinuous2D (:116-133).

Distributions are plain pytrees of (values, cdf) arrays; sampling is a
vectorized `searchsorted`, which XLA lowers to a fused branchless binary
search — the TPU analogue of the reference's per-sample linear/binary scans.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math3d import Array


# ---------------------------------------------------------------------------
# Analytic mappings (reference distributions.h:15-64)
# ---------------------------------------------------------------------------

def concentric_sample_disk(u0: Array, u1: Array) -> tuple[Array, Array]:
    """Shirley-Chiu concentric disk mapping, branchless.

    Reference: concentricSampleDisk (distributions.cpp:37-70). The four
    square regions map to the four disk quadrants with a SIGNED radius —
    `r = sx` (not |sx|) in region 1, etc.; collapsing the sign funnels half
    the square into one quadrant and biases every cosine-sampled direction."""
    sx = 2.0 * u0 - 1.0
    sy = 2.0 * u1 - 1.0
    r12 = sx >= -sy
    r1 = r12 & (sx > sy)
    r2 = r12 & jnp.logical_not(sx > sy)
    r4 = jnp.logical_not(r12) & (sx > sy)
    safe_x = jnp.where(sx == 0.0, 1.0, sx)
    safe_y = jnp.where(sy == 0.0, 1.0, sy)
    r = jnp.where(r1, sx,
        jnp.where(r2, sy, jnp.where(r4, -sy, -sx)))
    theta8 = jnp.where(r1, sy / safe_x,
        jnp.where(r2, 2.0 - sx / safe_y,
            jnp.where(r4, 6.0 + sx / safe_y, 4.0 + sy / safe_x)))
    theta = theta8 * (jnp.pi / 4.0)
    zero = (sx == 0.0) & (sy == 0.0)
    r = jnp.where(zero, 0.0, r)
    return r * jnp.cos(theta), r * jnp.sin(theta)


def cosine_sample_hemisphere(u0: Array, u1: Array) -> Array:
    """Cosine-weighted hemisphere (z-up) via concentric disk + projection."""
    x, y = concentric_sample_disk(u0, u1)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
    return jnp.stack([x, y, z], axis=-1)


def uniform_sample_hemisphere(u0: Array, u1: Array) -> Array:
    z = u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_sphere(u0: Array, u1: Array) -> Array:
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sample_cone(u0: Array, u1: Array, cos_theta_max: Array) -> Array:
    cos_theta = (1.0 - u0) + u0 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * jnp.pi * u1
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_sample_triangle(u0: Array, u1: Array) -> tuple[Array, Array]:
    """Returns barycentric (b0, b1). Reference: distributions.h uniformSampleTriangle."""
    sqrt_u0 = jnp.sqrt(u0)
    return 1.0 - sqrt_u0, u1 * sqrt_u0


# ---------------------------------------------------------------------------
# Piecewise-constant distributions
# ---------------------------------------------------------------------------

class Discrete1D(NamedTuple):
    """Discrete distribution over N items (reference RegularConstantDiscrete1D).

    pmf: (N,) probabilities, cdf: (N+1,) with cdf[0]=0, cdf[N]=1.
    """

    pmf: Array
    cdf: Array

    @property
    def num(self) -> int:
        return self.pmf.shape[-1]


def build_discrete_1d(weights: Array) -> Discrete1D:
    w = jnp.maximum(jnp.asarray(weights, jnp.float32), 0.0)
    total = jnp.sum(w)
    pmf = jnp.where(total > 0, w / jnp.maximum(total, 1e-30), 1.0 / w.shape[-1])
    cdf = jnp.concatenate([jnp.zeros((1,), pmf.dtype), jnp.cumsum(pmf)])
    cdf = cdf / cdf[-1]
    return Discrete1D(pmf=pmf, cdf=cdf)


def sample_discrete_1d(dist: Discrete1D, u: Array) -> tuple[Array, Array, Array]:
    """Sample index ~ pmf. Returns (index, prob, remapped_u).

    `remapped_u` rescales u within the chosen bin so it can be reused for a
    nested decision, matching the reference's remapped-u light selection
    (distributions.cpp RegularConstantDiscrete1D::sample)."""
    n = dist.num
    if n <= 1024:
        # Broadcast-compare + one-hot fetch: per-lane gathers lower to the
        # TPU scalar core (~0.2 ms per 49k-lane gather) — four of them per
        # call is milliseconds; the (R, N) compare is VPU-cheap for small N.
        cmp = dist.cdf <= u[..., None]                    # (..., N+1)
        idx = jnp.clip(jnp.sum(cmp.astype(jnp.int32), axis=-1) - 1, 0, n - 1)
        iota = jnp.arange(n + 1, dtype=jnp.int32)
        oh_lo = idx[..., None] == iota
        oh_hi = (idx + 1)[..., None] == iota
        lo = jnp.sum(jnp.where(oh_lo, dist.cdf, 0.0), axis=-1)
        hi = jnp.sum(jnp.where(oh_hi, dist.cdf, 0.0), axis=-1)
        prob = jnp.sum(jnp.where(oh_lo[..., :n], dist.pmf, 0.0), axis=-1)
    else:
        idx = jnp.clip(
            jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, n - 1
        )
        lo = dist.cdf[idx]
        hi = dist.cdf[idx + 1]
        prob = dist.pmf[idx]
    remapped = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0 - 1e-7)
    return idx, prob, remapped


class Continuous1D(NamedTuple):
    """Piecewise-constant continuous distribution on [0,1] with N bins.

    pdf: (N,) bin densities (integrate to 1), cdf: (N+1,).
    Reference: RegularConstantContinuous1D (distributions.h:93-112).
    """

    pdf: Array
    cdf: Array
    integral: Array  # unnormalized integral of the input values

    @property
    def num(self) -> int:
        return self.pdf.shape[-1]


def build_continuous_1d(values: Array) -> Continuous1D:
    v = jnp.maximum(jnp.asarray(values, jnp.float32), 0.0)
    n = v.shape[-1]
    integral = jnp.sum(v, axis=-1) / n
    safe = jnp.maximum(integral, 1e-30)
    pdf = v / safe[..., None]
    cdf = jnp.concatenate(
        [jnp.zeros(v.shape[:-1] + (1,), v.dtype), jnp.cumsum(v, axis=-1)], axis=-1
    )
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-30)
    return Continuous1D(pdf=pdf, cdf=cdf, integral=integral)


def sample_continuous_1d(dist: Continuous1D, u: Array) -> tuple[Array, Array]:
    """Returns (x in [0,1), pdf(x))."""
    idx = jnp.clip(
        jnp.searchsorted(dist.cdf, u, side="right") - 1, 0, dist.num - 1
    )
    lo = dist.cdf[idx]
    hi = dist.cdf[idx + 1]
    frac = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 1.0)
    x = (idx.astype(u.dtype) + frac) / dist.num
    return x, dist.pdf[idx]


class Continuous2D(NamedTuple):
    """2D piecewise-constant distribution: marginal over rows + conditional per
    row — the environment-map importance sampler
    (reference RegularConstantContinuous2D, distributions.h:116-133).

    cond_pdf/cond_cdf: (H, W)/(H, W+1) per-row conditionals.
    marg_pdf/marg_cdf: (H,)/(H+1,) row marginal.
    """

    cond_pdf: Array
    cond_cdf: Array
    marg_pdf: Array
    marg_cdf: Array

    @property
    def shape(self) -> tuple[int, int]:
        return self.cond_pdf.shape[-2], self.cond_pdf.shape[-1]


def build_continuous_2d(values: Array) -> Continuous2D:
    """values: (H, W) nonnegative importance (e.g. luminance * sin(theta))."""
    v = jnp.maximum(jnp.asarray(values, jnp.float32), 0.0)
    cond = build_continuous_1d(v)  # batched over rows
    marg = build_continuous_1d(cond.integral)
    return Continuous2D(
        cond_pdf=cond.pdf, cond_cdf=cond.cdf, marg_pdf=marg.pdf, marg_cdf=marg.cdf
    )


def sample_continuous_2d(
    dist: Continuous2D, u0: Array, u1: Array
) -> tuple[Array, Array, Array]:
    """Sample (x, y) in [0,1)^2 with joint density. Returns (x, y, pdf)."""
    h, w = dist.shape
    # Row (y) from marginal.
    yidx = jnp.clip(jnp.searchsorted(dist.marg_cdf, u1, side="right") - 1, 0, h - 1)
    ylo = dist.marg_cdf[yidx]
    yhi = dist.marg_cdf[yidx + 1]
    yfrac = jnp.clip((u1 - ylo) / jnp.maximum(yhi - ylo, 1e-30), 0.0, 1.0)
    y = (yidx.astype(jnp.float32) + yfrac) / h
    # Column (x) from the selected row's conditional.
    row_cdf = dist.cond_cdf[yidx]  # (..., W+1)
    xidx = jnp.clip(
        jnp.sum((row_cdf <= u0[..., None]).astype(jnp.int32), axis=-1) - 1, 0, w - 1
    )
    xlo = jnp.take_along_axis(row_cdf, xidx[..., None], axis=-1)[..., 0]
    xhi = jnp.take_along_axis(row_cdf, xidx[..., None] + 1, axis=-1)[..., 0]
    xfrac = jnp.clip((u0 - xlo) / jnp.maximum(xhi - xlo, 1e-30), 0.0, 1.0)
    x = (xidx.astype(jnp.float32) + xfrac) / w
    pdf = dist.marg_pdf[yidx] * dist.cond_pdf[yidx, xidx]
    return x, y, pdf


def pdf_continuous_2d(dist: Continuous2D, x: Array, y: Array) -> Array:
    h, w = dist.shape
    xi = jnp.clip((x * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((y * h).astype(jnp.int32), 0, h - 1)
    return dist.marg_pdf[yi] * dist.cond_pdf[yi, xi]


def power_heuristic(f: Array, g: Array) -> Array:
    """Power heuristic (beta=2) MIS weight, as used throughout the reference
    renderers (PathTracingRenderer.cpp:195-198, 243-246)."""
    f2 = f * f
    g2 = g * g
    return jnp.where(f2 + g2 > 0, f2 / jnp.maximum(f2 + g2, 1e-38), 0.0)


def export_continuous_2d_bmp(dist: Continuous2D, path: str) -> None:
    """Dump the 2D importance table as a grayscale BMP — the reference's
    RegularConstantContinuous2D::exportBMP debug aid (distributions.h:132,
    distributions.cpp:227): per-texel pdf normalized to [0, 1]."""
    import numpy as np

    from ..render.film import save_bmp

    pdf = np.asarray(dist.cond_pdf) * np.asarray(dist.marg_pdf)[:, None]
    mx = pdf.max()
    img = pdf / mx if mx > 0 else pdf
    save_bmp(path, np.repeat(img[..., None], 3, axis=-1))
