"""MXU-accelerated ray-triangle intersection via Plücker coordinates.

TPU-native redesign of the intersection hot loop (SURVEY.md §7: "keep the
FLOPs on the MXU"). A ray (o, d) has Plücker coordinates r6 = [d, o x d]; a
triangle edge a->b has e6 = [a x b, b - a]; the permuted inner product
side = r6 . e6 tells on which side of the edge line the ray passes. A ray
hits a triangle iff the three edge sides share a sign, and the hit distance
comes from the plane equation — all of which are (R,6)@(6,3T) and
(R,3)@(3,T) matrix products that run on the 128x128 systolic array instead
of the VPU, unlike classic per-pair Möller-Trumbore (intersect.py), which is
kept as the correctness oracle.

The closest hit reduces over triangle chunks with a `lax.scan` carrying the
running minimum; the winning triangle's barycentrics are recomputed exactly
once per ray afterwards (VPU, f32).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math3d import Array, cross, dot
from ..scene.types import Geometry
from .intersect import Hit, RAY_EPSILON, moller_trumbore


class PluckerTris(NamedTuple):
    """Precomputed per-triangle data (device arrays, padded to `chunk`).

    edges: (n_chunks, 6, 3*chunk)  — edge Plücker 6-vectors, edge-major
    normals: (n_chunks, 3, chunk)  — geometric (unnormalized) normals
    d0: (n_chunks, chunk)          — dot(n, p0) plane offsets
    valid: (n_chunks, chunk)       — padding mask
    chunk is derived statically from the edges shape.
    """

    edges: Array
    normals: Array
    d0: Array
    valid: Array

    @property
    def chunk(self) -> int:
        return self.edges.shape[-1] // 3


def build_plucker(geom: Geometry, chunk: int = 1024) -> PluckerTris:
    """Host/scene-build-time precompute of the Plücker tables."""
    pos = np.asarray(geom.positions)
    tri = np.asarray(geom.tri_vidx)
    p0, p1, p2 = pos[tri[:, 0]], pos[tri[:, 1]], pos[tri[:, 2]]
    t = len(tri)
    n_chunks = -(-t // chunk)
    pad = n_chunks * chunk - t

    def edge6(a, b):
        return np.concatenate([np.cross(a, b), b - a], axis=-1)  # (T, 6)

    e = np.stack([edge6(p0, p1), edge6(p1, p2), edge6(p2, p0)], axis=1)  # (T,3,6)
    n = np.cross(p1 - p0, p2 - p0)  # (T, 3)
    d0 = np.einsum("ij,ij->i", n, p0)
    valid = np.ones((t,), bool)
    if pad:
        e = np.concatenate([e, np.zeros((pad, 3, 6), e.dtype)])
        n = np.concatenate([n, np.zeros((pad, 3), n.dtype)])
        d0 = np.concatenate([d0, np.zeros((pad,), d0.dtype)])
        valid = np.concatenate([valid, np.zeros((pad,), bool)])
    # reshape: (n_chunks, chunk, 3, 6) -> (n_chunks, 6, 3*chunk) with triangle-
    # major layout inside: column index = edge * chunk + tri
    e = e.reshape(n_chunks, chunk, 3, 6).transpose(0, 3, 2, 1).reshape(
        n_chunks, 6, 3 * chunk
    )
    n = n.reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    return PluckerTris(
        edges=jnp.asarray(e.astype(np.float32)),
        normals=jnp.asarray(n.astype(np.float32)),
        d0=jnp.asarray(d0.reshape(n_chunks, chunk).astype(np.float32)),
        valid=jnp.asarray(valid.reshape(n_chunks, chunk)),
    )


def intersect_plucker(
    geom: Geometry,
    pt: PluckerTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
) -> Hit:
    """Closest hit over all triangles. o/d: (R, 3)."""
    r = o.shape[0]
    chunk = pt.chunk
    m = cross(o, d)
    r6 = jnp.concatenate([d, m], axis=-1)  # (R, 6)
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax0 = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))

    def body(carry, blk):
        best_t, best_tri = carry
        edges, normals, d0, valid, base = blk
        # Edge side tests: one MXU contraction for all 3 edges of the chunk.
        sides = jnp.dot(r6, edges, preferred_element_type=jnp.float32)
        sides = sides.reshape(r, 3, chunk)
        pos_all = jnp.all(sides >= 0.0, axis=1)
        neg_all = jnp.all(sides <= 0.0, axis=1)
        through = pos_all | neg_all
        # Plane distance: t = (d0 - n.o) / (n.d)
        n_dot_o = jnp.dot(o, normals, preferred_element_type=jnp.float32)
        n_dot_d = jnp.dot(d, normals, preferred_element_type=jnp.float32)
        denom_ok = jnp.abs(n_dot_d) > 1e-12
        t = (d0[None, :] - n_dot_o) / jnp.where(denom_ok, n_dot_d, 1.0)
        hit = (
            through
            & denom_ok
            & valid[None, :]
            & (t >= tmin[:, None])
            & (t <= jnp.minimum(tmax0, best_t)[:, None])
        )
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        t_min = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        closer = t_min < best_t
        best_t = jnp.where(closer, t_min, best_t)
        best_tri = jnp.where(closer, base + j, best_tri)
        return (best_t, best_tri), None

    n_chunks = pt.edges.shape[0]
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (tmax0, jnp.full((r,), -1, jnp.int32))
    (t, tri), _ = jax.lax.scan(
        body, init, (pt.edges, pt.normals, pt.d0, pt.valid, bases)
    )
    mask = tri >= 0

    # Recompute exact barycentrics for the winners (one MT evaluation per ray).
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
