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


def resolve_surface_point(geom: Geometry, hit: Hit, o: Array, d: Array
                          ) -> SurfacePoint:
    """Reference Triangle::getSurfacePoint (TriangleMesh.cpp:180-215):
    barycentric shading normal/tangent with re-orthogonalization."""
    tri = jnp.maximum(hit.tri, 0)
    vidx, p0, p1, p2 = _tri_vertices(geom, tri)
    b0 = hit.b0[..., None]
    b1 = hit.b1[..., None]
    b2 = 1.0 - b0 - b1
    # Missed lanes carry t = inf; clamp so masked-out lanes stay finite
    # (inf positions poison reverse-mode AD through jnp.where).
    t_safe = jnp.where(hit.mask, hit.t, 1.0)
    p = o + d * t_safe[..., None]
    gn = normalize(cross(p1 - p0, p2 - p0))
    n0 = geom.normals[vidx[..., 0]]
    n1 = geom.normals[vidx[..., 1]]
    n2 = geom.normals[vidx[..., 2]]
    sn = normalize(b0 * n0 + b1 * n1 + b2 * n2)
    t0 = geom.tangents[vidx[..., 0]]
    t1 = geom.tangents[vidx[..., 1]]
    t2 = geom.tangents[vidx[..., 2]]
    tangent = normalize(b0 * t0 + b1 * t1 + b2 * t2)
    dot_nt = dot(sn, tangent)
    tangent = jnp.where(
        (jnp.abs(dot_nt) >= 0.01)[..., None],
        normalize(tangent - dot_nt[..., None] * sn),
        tangent,
    )
    bitangent = cross(sn, tangent)
    uv0 = geom.uvs[vidx[..., 0]]
    uv1 = geom.uvs[vidx[..., 1]]
    uv2 = geom.uvs[vidx[..., 2]]
    uv = b0 * uv0 + b1 * uv1 + b2 * uv2
    area = 0.5 * jnp.linalg.norm(cross(p1 - p0, p2 - p0), axis=-1)
    return SurfacePoint(
        p=p,
        gn=gn,
        sn=sn,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        mat_id=geom.tri_mat[tri],
        area_pdf=1.0 / jnp.maximum(area, 1e-20),
    )


def sample_triangle_point(geom: Geometry, tri: Array, u0: Array, u1: Array
                          ) -> SurfacePoint:
    """Uniform area sampling on triangles (reference Triangle::sample,
    TriangleMesh.cpp:224-255). tri: (R,) ids; returns SurfacePoint."""
    from ..core.sampling import uniform_sample_triangle

    vidx, p0, p1, p2 = _tri_vertices(geom, tri)
    b0, b1 = uniform_sample_triangle(u0, u1)
    b0 = b0[..., None]
    b1 = b1[..., None]
    b2 = 1.0 - b0 - b1
    p = b0 * p0 + b1 * p1 + b2 * p2
    gn = normalize(cross(p1 - p0, p2 - p0))
    n0 = geom.normals[vidx[..., 0]]
    n1 = geom.normals[vidx[..., 1]]
    n2 = geom.normals[vidx[..., 2]]
    sn = normalize(b0 * n0 + b1 * n1 + b2 * n2)
    t0 = geom.tangents[vidx[..., 0]]
    t1 = geom.tangents[vidx[..., 1]]
    t2 = geom.tangents[vidx[..., 2]]
    tangent = normalize(b0 * t0 + b1 * t1 + b2 * t2)
    dot_nt = dot(sn, tangent)
    tangent = jnp.where(
        (jnp.abs(dot_nt) >= 0.01)[..., None],
        normalize(tangent - dot_nt[..., None] * sn),
        tangent,
    )
    bitangent = cross(sn, tangent)
    uv0 = geom.uvs[vidx[..., 0]]
    uv1 = geom.uvs[vidx[..., 1]]
    uv2 = geom.uvs[vidx[..., 2]]
    uv = b0 * uv0 + b1 * uv1 + b2 * uv2
    area = 0.5 * jnp.linalg.norm(cross(p1 - p0, p2 - p0), axis=-1)
    return SurfacePoint(
        p=p,
        gn=gn,
        sn=sn,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        mat_id=geom.tri_mat[tri],
        area_pdf=1.0 / jnp.maximum(area, 1e-20),
    )
