"""Pallas TPU closest-hit kernel: fused Plücker intersection.

The XLA version (accel/plucker.py) materializes (R, chunk) intermediates in
HBM between the MXU products and the min-reduction — bandwidth-bound. This
kernel fuses the whole per-chunk pipeline in VMEM: the grid is
(ray_blocks, tri_chunks); triangle chunks stream through VMEM with automatic
double buffering; each program does the side-test contraction on the MXU,
the plane-distance math on the VPU, and folds the argmin into per-ray-block
accumulators that only touch HBM once.

Data layout (built once at scene build):
  rays:    (NB, 8, RB)  rows = [ox oy oz dx dy dz tmin tmax], rays on lanes
  edges:   (NC, 6, 3C)  edge Plücker 6-vectors, column = edge*C + tri
  normals: (NC, 3, C)
  d0:      (NC, 1, C)
  valid:   (NC, 1, C)   1.0 / 0.0
  outputs: best_t (NB, RB) f32, best_idx (NB, RB) i32
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.math3d import Array
from ..scene.types import Geometry
from .intersect import Hit, RAY_EPSILON, moller_trumbore

RB = 128          # rays per program instance
DEFAULT_CHUNK = 512


def _kernel(rays_ref, edges_ref, normals_ref, d0_ref, valid_ref,
            t_ref, idx_ref, *, chunk: int):
    j = pl.program_id(1)

    rays = rays_ref[0]          # (8, RB)
    o = rays[0:3, :]            # (3, RB)
    d = rays[3:6, :]
    tmin = rays[6, :]           # (RB,)
    tmax = rays[7, :]

    @pl.when(j == 0)
    def _init():
        t_ref[0, 0, :] = tmax
        idx_ref[0, 0, :] = jnp.full((RB,), -1, jnp.int32)

    # Ray Plücker 6-vector r6 = [d, o x d], rays on lanes: (6, RB).
    m0 = o[1] * d[2] - o[2] * d[1]
    m1 = o[2] * d[0] - o[0] * d[2]
    m2 = o[0] * d[1] - o[1] * d[0]
    r6 = jnp.stack([d[0], d[1], d[2], m0, m1, m2], axis=0)

    # MXU: (RB, 3C) = r6^T @ edges, then (RB, C) plane terms.
    sides = jax.lax.dot_general(
        r6, edges_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (RB, 3C)
    s0 = sides[:, 0:chunk]
    s1 = sides[:, chunk:2 * chunk]
    s2 = sides[:, 2 * chunk:3 * chunk]
    through = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | (
        (s0 <= 0) & (s1 <= 0) & (s2 <= 0)
    )

    n_dot_o = jax.lax.dot_general(
        o, normals_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (RB, C)
    n_dot_d = jax.lax.dot_general(
        d, normals_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    denom_ok = jnp.abs(n_dot_d) > 1e-12
    t = (d0_ref[0][0:1, :] - n_dot_o) / jnp.where(denom_ok, n_dot_d, 1.0)

    tmin_col = tmin[:, None]
    best_col = t_ref[0, 0, :][:, None]
    hit = (
        through
        & denom_ok
        & (valid_ref[0][0:1, :] > 0.5)
        & (t >= tmin_col)
        & (t < best_col)
    )
    t_hit = jnp.where(hit, t, jnp.inf)
    t_min = jnp.min(t_hit, axis=1)       # (RB,)
    a_min = jnp.argmin(t_hit, axis=1).astype(jnp.int32)
    closer = t_min < t_ref[0, 0, :]
    t_ref[0, 0, :] = jnp.where(closer, t_min, t_ref[0, 0, :])
    idx_ref[0, 0, :] = jnp.where(
        closer, j * chunk + a_min, idx_ref[0, 0, :]
    )


from typing import NamedTuple


class PallasTris(NamedTuple):
    """Triangle tables in kernel layout (pytree; host-built, device-resident).
    chunk / n_chunks are derived statically from shapes."""

    edges: Array    # (NC, 6, 3C)
    normals: Array  # (NC, 3, C)
    d0: Array       # (NC, 1, C)
    valid: Array    # (NC, 1, C)

    @property
    def chunk(self) -> int:
        return self.normals.shape[-1]

    @property
    def n_chunks(self) -> int:
        return self.edges.shape[0]


def build_pallas_tris(geom: Geometry, chunk: int = DEFAULT_CHUNK) -> PallasTris:
    if True:
        pos = np.asarray(geom.positions)
        tri = np.asarray(geom.tri_vidx)
        p0, p1, p2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
        t = len(tri)
        nc = -(-t // chunk)
        pad = nc * chunk - t

        def edge6(a, b):
            return np.concatenate([np.cross(a, b), b - a], axis=-1)

        e = np.stack([edge6(p0, p1), edge6(p1, p2), edge6(p2, p0)], axis=1)
        n = np.cross(p1 - p0, p2 - p0)
        d0 = np.einsum("ij,ij->i", n, p0)
        valid = np.ones((t,), np.float32)
        if pad:
            e = np.concatenate([e, np.zeros((pad, 3, 6), e.dtype)])
            n = np.concatenate([n, np.zeros((pad, 3), n.dtype)])
            d0 = np.concatenate([d0, np.zeros((pad,), d0.dtype)])
            valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
        e = e.reshape(nc, chunk, 3, 6).transpose(0, 3, 2, 1).reshape(
            nc, 6, 3 * chunk
        )
        return PallasTris(
            edges=jnp.asarray(e.astype(np.float32)),
            normals=jnp.asarray(
                n.reshape(nc, chunk, 3).transpose(0, 2, 1).astype(np.float32)
            ),
            d0=jnp.asarray(d0.reshape(nc, 1, chunk).astype(np.float32)),
            valid=jnp.asarray(valid.reshape(nc, 1, chunk)),
        )


@functools.partial(jax.jit, static_argnames=("chunk", "n_chunks", "interpret"))
def _run_kernel(rays, edges, normals, d0, valid, chunk, n_chunks,
                interpret=False):
    nb = rays.shape[0]
    grid = (nb, n_chunks)
    kernel = functools.partial(_kernel, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, RB), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 6, 3 * chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, RB), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, RB), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, RB), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, RB), jnp.int32),
        ],
        interpret=interpret,
    )(rays, edges, normals, d0, valid)


def intersect_pallas(
    geom: Geometry,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    interpret: bool = False,
) -> Hit:
    """Closest hit via the fused kernel. o/d: (R, 3)."""
    r = o.shape[0]
    nb = -(-r // RB)
    pad = nb * RB - r
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(
        jnp.where(jnp.isinf(jnp.asarray(tmax, jnp.float32)), 3e38,
                  jnp.asarray(tmax, jnp.float32)), (r,)
    )
    rays = jnp.concatenate(
        [o, d, tmin_a[:, None], tmax_a[:, None]], axis=1
    )  # (R, 8)
    if pad:
        filler = jnp.zeros((pad, 8), jnp.float32).at[:, 5].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)
    rays = rays.reshape(nb, RB, 8).transpose(0, 2, 1)  # (NB, 8, RB)

    best_t, best_idx = _run_kernel(
        rays, pt.edges, pt.normals, pt.d0, pt.valid, pt.chunk, pt.n_chunks,
        interpret,
    )
    best_t = best_t.reshape(-1)[:r]
    tri = best_idx.reshape(-1)[:r]
    mask = (tri >= 0) & (best_t < 3e38) & (best_t < tmax_a * (1.0 + 1e-6))

    tri_c = jnp.maximum(tri, 0)
    vidx = geom.tri_vidx[tri_c]
    p0 = geom.positions[vidx[:, 0]]
    p1 = geom.positions[vidx[:, 1]]
    p2 = geom.positions[vidx[:, 2]]
    t_mt, b1, b2, _ = moller_trumbore(o, d, p0, p1, p2, 0.0, jnp.inf)
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0)
    t_final = jnp.where(mask, t_mt, jnp.inf)
    return Hit(t=t_final, tri=jnp.where(mask, tri, -1), b0=1.0 - b1 - b2,
               b1=b1, mask=mask)
