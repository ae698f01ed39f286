"""Pallas TPU closest-hit / any-hit kernels: fused Plücker intersection.

The XLA version (accel/plucker.py) materializes (R, chunk) intermediates in
HBM between the MXU products and the min-reduction — bandwidth-bound. These
kernels fuse the whole per-chunk pipeline in VMEM: the grid is
(ray_blocks, tri_chunks); triangle chunks stream through VMEM with automatic
double buffering; each program does ONE MXU contraction that yields the three
edge side-terms, n·d, and (d0 - n·o) together, then folds hit selection into
per-ray-block accumulators that only touch HBM once.

Data layout (rays packed per call; triangles once at scene build):
  rays: (NB, 16, RB)  rows = [dx dy dz mx my mz ox oy oz 1 tmin tmax 0*4],
                      m = o x d (ray Plücker moment, computed OUTSIDE the
                      kernel so it isn't redone per triangle chunk)
  tris: (NC, 16, 5C)  columns: [edge0 | edge1 | edge2 | n·d | d0 - n·o]
                      edge cols carry the edge Plücker 6-vector in rows 0-5;
                      the n·d col carries n in rows 0-2; the num col carries
                      -n in rows 6-8 and d0 in row 9.
  valid: (NC, 1, C)   1.0 / 0.0
  outputs: best_t (NB, RB) f32, best_idx (NB, RB) i32 — or occluded i32.

Reference for the intersection predicate: Triangle::intersect
(Möller-Trumbore, TriangleMesh.cpp:131-178) — reformulated as Plücker side
tests so the inner loop is a matrix product on the 128x128 systolic array.
Barycentrics for the winning triangle are recovered afterwards with one
Möller-Trumbore evaluation per ray (exact, outside the kernel).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..core.math3d import Array
from ..scene.types import Geometry
from .intersect import Hit, RAY_EPSILON, moller_trumbore

RB = 256          # default rays per program instance (tunable per call)
DEFAULT_CHUNK = 512
ROWS = 16         # packed ray rows (sublane-aligned)


def _contract(rays16, tris_ref, chunk: int):
    """(RB, 5C) = rays16^T @ tris — side terms, n·d, and num in one MXU op."""
    acc = jax.lax.dot_general(
        rays16, tris_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s0 = acc[:, 0:chunk]
    s1 = acc[:, chunk:2 * chunk]
    s2 = acc[:, 2 * chunk:3 * chunk]
    den = acc[:, 3 * chunk:4 * chunk]    # n·d
    num = acc[:, 4 * chunk:5 * chunk]    # d0 - n·o  (= t * den)
    through = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | (
        (s0 <= 0) & (s1 <= 0) & (s2 <= 0)
    )
    return through, den, num


def _block_hits_box(rays16, box, upper):
    """True if ANY ray in the block can hit the chunk AABB closer than its
    current upper bound (slab test over the whole block — ~30 VPU ops on
    (rb,) vectors, vs ~10^5 for the full chunk pipeline it can skip)."""
    o = rays16[6:9, :]
    d = rays16[0:3, :]
    tmin = rays16[10, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d >= 0, 1e-20, -1e-20), d)
    tn = jnp.full_like(tmin, -jnp.inf)
    tf = jnp.full_like(tmin, jnp.inf)
    for axis in range(3):
        t0 = (box[axis] - o[axis]) * inv[axis]
        t1 = (box[3 + axis] - o[axis]) * inv[axis]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf >= tmin) & (tn <= upper)
    return jnp.any(ok) & (box[6] > 0.5)


def _kernel(rays_ref, tris_ref, valid_ref, boxes_ref, t_ref, idx_ref,
            *, chunk: int, rb: int):
    j = pl.program_id(1)
    rays16 = rays_ref[0]          # (16, RB)
    tmin = rays16[10, :]
    tmax = rays16[11, :]

    @pl.when(j == 0)
    def _init():
        t_ref[0, 0, :] = tmax
        idx_ref[0, 0, :] = jnp.full((rb,), -1, jnp.int32)

    box = boxes_ref[0][0]

    @pl.when(_block_hits_box(rays16, box, t_ref[0, 0, :]))
    def _chunk():
        through, den, num = _contract(rays16, tris_ref, chunk)
        denom_ok = jnp.abs(den) > 1e-12
        t = num / jnp.where(denom_ok, den, 1.0)

        best_col = t_ref[0, 0, :][:, None]
        hit = (
            through
            & denom_ok
            & (valid_ref[0][0:1, :] > 0.5)
            & (t >= tmin[:, None])
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


def _kernel_any(rays_ref, tris_ref, valid_ref, boxes_ref, hit_ref,
                *, chunk: int, rb: int):
    """Any-hit (shadow) variant: no argmin, no division. A triangle occludes
    iff t = num/den lies in [tmin, tmax], tested as sign conditions on
    (num - tmin*den)·(num - tmax*den) — fmas instead of a divide."""
    j = pl.program_id(1)
    rays16 = rays_ref[0]
    tmin = rays16[10, :]
    tmax = rays16[11, :]

    @pl.when(j == 0)
    def _init():
        hit_ref[0, 0, :] = jnp.zeros((rb,), jnp.int32)

    box = boxes_ref[0][0]

    @pl.when(_block_hits_box(rays16, box, tmax))
    def _chunk():
        through, den, num = _contract(rays16, tris_ref, chunk)
        lo = num - tmin[:, None] * den       # den * (t - tmin)
        hi = num - tmax[:, None] * den
        in_range = (lo * hi <= 0) & (jnp.abs(den) > 1e-12)
        occluded = through & in_range & (valid_ref[0][0:1, :] > 0.5)
        any_hit = jnp.any(occluded, axis=1).astype(jnp.int32)
        hit_ref[0, 0, :] = hit_ref[0, 0, :] | any_hit


class PallasTris(NamedTuple):
    """Triangle tables in kernel layout (pytree; host-built, device-resident).
    chunk / n_chunks are derived statically from shapes.

    Triangles are MORTON-ORDERED so each chunk is spatially tight; `boxes`
    carries the chunk AABB (lanes 0-5 = lo/hi, lane 6 = nonempty flag) and
    the kernels skip a chunk's whole pipeline when no ray in the block can
    hit its box — the wavefront analogue of BVH early-out for coherent ray
    blocks. `remap` maps kernel slots back to original triangle ids."""

    tris: Array     # (NC, 16, 5C)
    valid: Array    # (NC, 1, C)
    boxes: Array    # (NC, 1, 128) chunk AABB + flag
    remap: Array    # (NC*C,) int32 slot -> original triangle id

    @property
    def chunk(self) -> int:
        return self.valid.shape[-1]

    @property
    def n_chunks(self) -> int:
        return self.tris.shape[0]


def _morton_order(cent: np.ndarray) -> np.ndarray:
    lo = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo, 1e-12)
    q = np.clip((cent - lo) / ext * 1023.0, 0, 1023).astype(np.uint64)

    def expand(v):
        v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
        return v

    code = (expand(q[:, 0]) << np.uint64(2)) | (expand(q[:, 1]) << np.uint64(1)) \
        | expand(q[:, 2])
    return np.argsort(code, kind="stable").astype(np.int32)


def build_pallas_tris(geom: Geometry, chunk: int = DEFAULT_CHUNK) -> PallasTris:
    pos = np.asarray(geom.positions)
    tri = np.asarray(geom.tri_vidx)
    p0, p1, p2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    t = len(tri)
    # Spatial (Morton) ordering so chunks are compact in space.
    if t > 1:
        order = _morton_order((p0 + p1 + p2) / 3.0)
    else:
        order = np.zeros((1,), np.int32)
    p0, p1, p2 = p0[order], p1[order], p2[order]
    nc = max(-(-t // chunk), 1)
    pad = nc * chunk - t

    def edge6(a, b):
        return np.concatenate([np.cross(a, b), b - a], axis=-1)

    e = np.stack([edge6(p0, p1), edge6(p1, p2), edge6(p2, p0)], axis=1)
    n = np.cross(p1 - p0, p2 - p0)
    d0 = np.einsum("ij,ij->i", n, p0)
    valid = np.ones((t,), np.float32)
    remap = order.astype(np.int32)
    if pad:
        e = np.concatenate([e, np.zeros((pad, 3, 6), e.dtype)])
        n = np.concatenate([n, np.zeros((pad, 3), n.dtype)])
        d0 = np.concatenate([d0, np.zeros((pad,), d0.dtype)])
        valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
        p0 = np.concatenate([p0, np.zeros((pad, 3), p0.dtype)])
        p1 = np.concatenate([p1, np.zeros((pad, 3), p1.dtype)])
        p2 = np.concatenate([p2, np.zeros((pad, 3), p2.dtype)])
        remap = np.concatenate([remap, np.zeros((pad,), np.int32)])
    tt = nc * chunk
    tris = np.zeros((tt, ROWS, 5), np.float32)
    tris[:, 0:6, 0] = e[:, 0]       # edge0 Plücker
    tris[:, 0:6, 1] = e[:, 1]
    tris[:, 0:6, 2] = e[:, 2]
    tris[:, 0:3, 3] = n             # n·d column
    tris[:, 6:9, 4] = -n            # num column: -n·o ...
    tris[:, 9, 4] = d0              # ... + d0 * 1
    # (tt, 16, 5) -> (nc, 16, 5C) with column = col*C + tri
    tris = tris.reshape(nc, chunk, ROWS, 5).transpose(0, 2, 3, 1).reshape(
        nc, ROWS, 5 * chunk
    )
    # Per-chunk AABBs over the valid prefix of each chunk.
    boxes = np.zeros((nc, 1, 128), np.float32)
    vmask = valid.reshape(nc, chunk) > 0
    allp = np.stack([p0, p1, p2], axis=1).reshape(nc, chunk, 3, 3)
    for c in range(nc):
        m = vmask[c]
        if m.any():
            pts = allp[c][m].reshape(-1, 3)
            boxes[c, 0, 0:3] = pts.min(axis=0)
            boxes[c, 0, 3:6] = pts.max(axis=0)
            boxes[c, 0, 6] = 1.0
    return PallasTris(
        tris=jnp.asarray(tris),
        valid=jnp.asarray(valid.reshape(nc, 1, chunk)),
        boxes=jnp.asarray(boxes),
        remap=jnp.asarray(remap),
    )


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_chunks", "rb", "interpret"))
def _run_kernel(rays, tris, valid, boxes, chunk, n_chunks, rb=RB,
                interpret=False):
    nb = rays.shape[0]
    grid = (nb, n_chunks)
    kernel = functools.partial(_kernel, chunk=chunk, rb=rb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROWS, rb), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ROWS, 5 * chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, rb), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, rb), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, rb), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32),
        ],
        interpret=interpret,
    )(rays, tris, valid, boxes)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_chunks", "rb", "interpret"))
def _run_kernel_any(rays, tris, valid, boxes, chunk, n_chunks, rb=RB,
                    interpret=False):
    nb = rays.shape[0]
    grid = (nb, n_chunks)
    kernel = functools.partial(_kernel_any, chunk=chunk, rb=rb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ROWS, rb), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ROWS, 5 * chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, rb), lambda i, j: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32)],
        interpret=interpret,
    )(rays, tris, valid, boxes)


def _pack_rays(o, d, tmin_a, tmax_a, rb=RB):
    """(R, 3)x2 + (R,)x2 -> (NB, 16, rb) with the Plücker moment m = o x d
    precomputed once per ray (XLA fuses this into the surrounding graph)."""
    r = o.shape[0]
    nb = -(-r // rb)
    pad = nb * rb - r
    m = jnp.cross(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    zeros = jnp.zeros((r, ROWS - 12), jnp.float32)
    rays = jnp.concatenate(
        [d, m, o, ones, tmin_a[:, None], tmax_a[:, None], zeros], axis=1
    )  # (R, 16)
    if pad:
        filler = jnp.zeros((pad, ROWS), jnp.float32).at[:, 2].set(1.0)
        rays = jnp.concatenate([rays, filler], axis=0)
    return rays.reshape(nb, rb, ROWS).transpose(0, 2, 1), nb


def anyhit_pallas(
    geom: Geometry,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    interpret: bool = False,
    rb: int = RB,
) -> Array:
    """Occlusion query (bool per ray): True if anything lies in [tmin, tmax].
    The shadow-ray path of Scene::testVisibility — cheaper than closest-hit
    (no per-triangle divide, no argmin)."""
    r = o.shape[0]
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(
        jnp.where(jnp.isinf(jnp.asarray(tmax, jnp.float32)), 3e38,
                  jnp.asarray(tmax, jnp.float32)), (r,)
    )
    rays, _ = _pack_rays(o, d, tmin_a, tmax_a, rb)
    (hit,) = _run_kernel_any(
        rays, pt.tris, pt.valid, pt.boxes, pt.chunk, pt.n_chunks, rb=rb,
        interpret=interpret,
    )
    return hit.reshape(-1)[:r] > 0


def intersect_pallas(
    geom: Geometry,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    interpret: bool = False,
    rb: int = RB,
) -> Hit:
    """Closest hit via the fused kernel. o/d: (R, 3)."""
    r = o.shape[0]
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(
        jnp.where(jnp.isinf(jnp.asarray(tmax, jnp.float32)), 3e38,
                  jnp.asarray(tmax, jnp.float32)), (r,)
    )
    rays, _ = _pack_rays(o, d, tmin_a, tmax_a, rb)

    best_t, best_idx = _run_kernel(
        rays, pt.tris, pt.valid, pt.boxes, pt.chunk, pt.n_chunks, rb=rb,
        interpret=interpret,
    )
    best_t = best_t.reshape(-1)[:r]
    slot = best_idx.reshape(-1)[:r]
    tri = jnp.where(slot >= 0, pt.remap[jnp.maximum(slot, 0)], -1)
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
