"""Ray-triangle intersection over SoA wavefronts.

Counterpart of reference Triangle::intersect (Möller-Trumbore,
libSLR/Surface/TriangleMesh.cpp:131-178) and Triangle::getSurfacePoint
(:180-215), vectorized: a wavefront of R rays is tested against triangle
blocks with a `lax.scan` carrying the running closest hit. The scan keeps
peak memory at (R, BLOCK) while XLA fuses the test+reduce into one pass —
the brute-force path is itself TPU-efficient for small scenes and is the
correctness oracle for the BVH path (accel/lbvh.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math3d import Array, cross, dot, normalize
from ..scene.types import Geometry

RAY_EPSILON = 1e-4  # reference Ray::Epsilon (geometry.h:24-35) is 1e-4f


class Hit(NamedTuple):
    t: Array        # (R,) hit distance (inf if miss)
    tri: Array      # (R,) int32 triangle id (-1 if miss)
    b0: Array       # (R,) barycentric of v0 (reference isect.u)
    b1: Array       # (R,) barycentric of v1 (reference isect.v)
    mask: Array     # (R,) bool
    inst: Array = None  # (R,) int32 instance id (-1 = static geometry)


class SurfacePoint(NamedTuple):
    """Resolved shading data at hits (reference SurfacePoint, geometry.h:239-258)."""

    p: Array         # (R, 3)
    gn: Array        # (R, 3) geometric normal
    sn: Array        # (R, 3) shading normal (frame z)
    tangent: Array   # (R, 3) shading tangent (frame x)
    bitangent: Array  # (R, 3) frame y
    uv: Array        # (R, 2) texture coordinates
    mat_id: Array    # (R,) int32
    area_pdf: Array  # (R,) 1/area of the hit triangle


def _tri_vertices(geom: Geometry, tri: Array):
    vidx = geom.tri_vidx[tri]  # (..., 3)
    p0 = geom.positions[vidx[..., 0]]
    p1 = geom.positions[vidx[..., 1]]
    p2 = geom.positions[vidx[..., 2]]
    return vidx, p0, p1, p2


# ---------------------------------------------------------------------------
# Packed per-triangle shading table
# ---------------------------------------------------------------------------
# TPU lowers per-lane gathers to the scalar core (~0.2 ms per 49k-lane gather
# on v5e); the SoA vertex indirection costs ~15 of them per cast. Packing all
# per-hit attributes into ONE (T, 40) row makes surface-point resolution a
# single row gather + slices.
TRI_TABLE_COLS = 40
# column layout:
#  0:3 p0 | 3:6 e01 | 6:9 e02 | 9:12 n0 | 12:15 n1 | 15:18 n2
# 18:21 t0 | 21:24 t1 | 24:27 t2 | 27:29 uv0 | 29:31 uv1 | 31:33 uv2
# 33 mat_id | 34 inv_area | 35 alpha_ftex | 36 ntex | 37:40 gn (normalized)


def build_tri_table(positions, normals, tangents, uvs, tri_vidx, tri_mat,
                    tri_alpha, tri_ntex):
    """Host-side (numpy) construction of the packed per-tri table."""
    import numpy as np

    p = np.asarray(positions, np.float32)
    n = np.asarray(normals, np.float32)
    tg = np.asarray(tangents, np.float32)
    uv = np.asarray(uvs, np.float32)
    v = np.asarray(tri_vidx, np.int64)
    t = v.shape[0]
    tab = np.zeros((max(t, 1), TRI_TABLE_COLS), np.float32)
    if t == 0:
        return tab
    p0, p1, p2 = p[v[:, 0]], p[v[:, 1]], p[v[:, 2]]
    e01, e02 = p1 - p0, p2 - p0
    gn = np.cross(e01, e02)
    nrm = np.linalg.norm(gn, axis=-1)
    area = 0.5 * nrm
    gn = gn / np.maximum(nrm, 1e-20)[:, None]
    tab[:, 0:3] = p0
    tab[:, 3:6] = e01
    tab[:, 6:9] = e02
    tab[:, 9:12] = n[v[:, 0]]
    tab[:, 12:15] = n[v[:, 1]]
    tab[:, 15:18] = n[v[:, 2]]
    tab[:, 18:21] = tg[v[:, 0]]
    tab[:, 21:24] = tg[v[:, 1]]
    tab[:, 24:27] = tg[v[:, 2]]
    tab[:, 27:29] = uv[v[:, 0]]
    tab[:, 29:31] = uv[v[:, 1]]
    tab[:, 31:33] = uv[v[:, 2]]
    tab[:, 33] = np.asarray(tri_mat, np.float32)
    tab[:, 34] = 1.0 / np.maximum(area, 1e-20)
    tab[:, 35] = np.asarray(tri_alpha, np.float32)
    tab[:, 36] = (np.asarray(tri_ntex, np.float32)
                  if tri_ntex is not None else -1.0)
    tab[:, 37:40] = gn
    return tab


class TriRow(NamedTuple):
    """Slices of one fetched tri-table row (all shapes (R, ...))."""

    p0: Array
    e01: Array
    e02: Array
    n0: Array
    n1: Array
    n2: Array
    t0: Array
    t1: Array
    t2: Array
    uv0: Array
    uv1: Array
    uv2: Array
    mat_id: Array    # int32
    inv_area: Array
    alpha_id: Array  # int32
    ntex_id: Array   # int32
    gn: Array


def fetch_tri_row(table: Array, tri: Array) -> TriRow:
    """One row gather + slices. tri must already be clamped >= 0."""
    row = table[tri]  # (R, 40)
    return TriRow(
        p0=row[..., 0:3], e01=row[..., 3:6], e02=row[..., 6:9],
        n0=row[..., 9:12], n1=row[..., 12:15], n2=row[..., 15:18],
        t0=row[..., 18:21], t1=row[..., 21:24], t2=row[..., 24:27],
        uv0=row[..., 27:29], uv1=row[..., 29:31], uv2=row[..., 31:33],
        mat_id=row[..., 33].astype(jnp.int32),
        inv_area=row[..., 34],
        alpha_id=row[..., 35].astype(jnp.int32),
        ntex_id=row[..., 36].astype(jnp.int32),
        gn=row[..., 37:40],
    )


def moller_trumbore(
    o: Array, d: Array, p0: Array, p1: Array, p2: Array, tmin, tmax
) -> tuple[Array, Array, Array, Array]:
    """Batched Möller-Trumbore. All inputs broadcast; returns (t, b1, b2, hit)."""
    e01 = p1 - p0
    e02 = p2 - p0
    pv = cross(d, e02)
    det = dot(e01, pv)
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tv = o - p0
    b1 = dot(tv, pv) * inv_det
    qv = cross(tv, e01)
    b2 = dot(d, qv) * inv_det
    t = dot(e02, qv) * inv_det
    hit = (
        (det != 0.0)
        & (b1 >= 0.0)
        & (b1 <= 1.0)
        & (b2 >= 0.0)
        & (b1 + b2 <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    return t, b1, b2, hit


def intersect_brute(
    geom: Geometry,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    block: int = 512,
) -> Hit:
    """Closest-hit over all triangles, scanning triangle blocks.

    o/d: (R, 3). Returns Hit over (R,).
    """
    n_tris = geom.num_tris
    n_blocks = -(-n_tris // block)
    pad = n_blocks * block - n_tris
    tri_ids = jnp.arange(n_blocks * block, dtype=jnp.int32)
    valid_tri = tri_ids < n_tris
    tri_ids_c = jnp.minimum(tri_ids, n_tris - 1)
    _, p0, p1, p2 = _tri_vertices(geom, tri_ids_c)
    p0 = p0.reshape(n_blocks, block, 3)
    p1 = p1.reshape(n_blocks, block, 3)
    p2 = p2.reshape(n_blocks, block, 3)
    ids = tri_ids_c.reshape(n_blocks, block)
    valid = valid_tri.reshape(n_blocks, block)

    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), o.shape[:-1])
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), o.shape[:-1])

    def scan_body(carry, blk):
        best_t, best_tri, best_b1, best_b2 = carry
        bp0, bp1, bp2, bids, bvalid = blk
        t, b1, b2, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], bp0[None], bp1[None], bp2[None],
            tmin[:, None], tmax[:, None],
        )  # (R, block)
        hit = hit & bvalid[None, :]
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)  # (R,)
        t_min = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        closer = t_min < best_t
        best_t = jnp.where(closer, t_min, best_t)
        best_tri = jnp.where(closer, bids[j], best_tri)
        best_b1 = jnp.where(
            closer, jnp.take_along_axis(b1, j[:, None], axis=-1)[:, 0], best_b1
        )
        best_b2 = jnp.where(
            closer, jnp.take_along_axis(b2, j[:, None], axis=-1)[:, 0], best_b2
        )
        return (best_t, best_tri, best_b1, best_b2), None

    r = o.shape[0]
    init = (
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    (t, tri, b1, b2), _ = jax.lax.scan(
        scan_body, init, (p0, p1, p2, ids, valid)
    )
    mask = tri >= 0
    return Hit(t=t, tri=tri, b0=1.0 - b1 - b2, b1=b1, mask=mask)


def any_hit_brute(
    geom: Geometry,
    o: Array,
    d: Array,
    tmin: Array | float,
    tmax: Array | float,
    block: int = 512,
) -> Array:
    """Shadow-ray occlusion test (reference Scene::testVisibility,
    SurfaceObject.cpp:417-429). Returns (R,) bool = occluded."""
    hit = intersect_brute(geom, o, d, tmin, tmax, block)
    return hit.mask


def _finish_surface_point(p, gn, n0, n1, n2, t0, t1, t2, uv0, uv1, uv2,
                          mat_id, area_pdf, b0, b1) -> SurfacePoint:
    """Shared barycentric interpolation + tangent re-orthogonalization
    (Triangle::getSurfacePoint, TriangleMesh.cpp:180-215)."""
    b2 = 1.0 - b0 - b1
    sn = normalize(b0 * n0 + b1 * n1 + b2 * n2)
    tangent = normalize(b0 * t0 + b1 * t1 + b2 * t2)
    dot_nt = dot(sn, tangent)
    tangent = jnp.where(
        (jnp.abs(dot_nt) >= 0.01)[..., None],
        normalize(tangent - dot_nt[..., None] * sn),
        tangent,
    )
    return SurfacePoint(
        p=p,
        gn=gn,
        sn=sn,
        tangent=tangent,
        bitangent=cross(sn, tangent),
        uv=b0 * uv0 + b1 * uv1 + b2 * uv2,
        mat_id=mat_id,
        area_pdf=area_pdf,
    )


def resolve_surface_point(geom: Geometry, hit: Hit, o: Array, d: Array
                          ) -> SurfacePoint:
    """Reference Triangle::getSurfacePoint (TriangleMesh.cpp:180-215):
    barycentric shading normal/tangent with re-orthogonalization."""
    tri = jnp.maximum(hit.tri, 0)
    b0 = hit.b0[..., None]
    b1 = hit.b1[..., None]
    # Missed lanes carry t = inf; clamp so masked-out lanes stay finite
    # (inf positions poison reverse-mode AD through jnp.where).
    t_safe = jnp.where(hit.mask, hit.t, 1.0)
    p = o + d * t_safe[..., None]
    if geom.tri_table is not None:
        r = fetch_tri_row(geom.tri_table, tri)
        return _finish_surface_point(
            p, r.gn, r.n0, r.n1, r.n2, r.t0, r.t1, r.t2,
            r.uv0, r.uv1, r.uv2, r.mat_id, r.inv_area, b0, b1)
    vidx, p0, p1, p2 = _tri_vertices(geom, tri)
    gn = normalize(cross(p1 - p0, p2 - p0))
    area = 0.5 * jnp.linalg.norm(cross(p1 - p0, p2 - p0), axis=-1)
    return _finish_surface_point(
        p, gn,
        geom.normals[vidx[..., 0]], geom.normals[vidx[..., 1]],
        geom.normals[vidx[..., 2]],
        geom.tangents[vidx[..., 0]], geom.tangents[vidx[..., 1]],
        geom.tangents[vidx[..., 2]],
        geom.uvs[vidx[..., 0]], geom.uvs[vidx[..., 1]],
        geom.uvs[vidx[..., 2]],
        geom.tri_mat[tri], 1.0 / jnp.maximum(area, 1e-20), b0, b1)


def sample_triangle_point(geom: Geometry, tri: Array, u0: Array, u1: Array
                          ) -> SurfacePoint:
    """Uniform area sampling on triangles (reference Triangle::sample,
    TriangleMesh.cpp:224-255). tri: (R,) ids; returns SurfacePoint."""
    from ..core.sampling import uniform_sample_triangle

    b0, b1 = uniform_sample_triangle(u0, u1)
    b0 = b0[..., None]
    b1 = b1[..., None]
    b2 = 1.0 - b0 - b1
    if geom.tri_table is not None:
        r = fetch_tri_row(geom.tri_table, tri)
        p = r.p0 + b1 * r.e01 + b2 * r.e02
        return _finish_surface_point(
            p, r.gn, r.n0, r.n1, r.n2, r.t0, r.t1, r.t2,
            r.uv0, r.uv1, r.uv2, r.mat_id, r.inv_area, b0, b1)
    vidx, p0, p1, p2 = _tri_vertices(geom, tri)
    p = b0 * p0 + b1 * p1 + b2 * p2
    gn = normalize(cross(p1 - p0, p2 - p0))
    area = 0.5 * jnp.linalg.norm(cross(p1 - p0, p2 - p0), axis=-1)
    return _finish_surface_point(
        p, gn,
        geom.normals[vidx[..., 0]], geom.normals[vidx[..., 1]],
        geom.normals[vidx[..., 2]],
        geom.tangents[vidx[..., 0]], geom.tangents[vidx[..., 1]],
        geom.tangents[vidx[..., 2]],
        geom.uvs[vidx[..., 0]], geom.uvs[vidx[..., 1]],
        geom.uvs[vidx[..., 2]],
        geom.tri_mat[tri], 1.0 / jnp.maximum(area, 1e-20), b0, b1)
