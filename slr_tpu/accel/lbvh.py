"""BVH build (host) and wavefront traversal (device).

The reference's default accelerator is a recursive spatial-split SBVH built on
the CPU (libSLR/Accelerator/SBVH.h:57-348) with stack-based ordered traversal
(:417-442). The TPU redesign (SURVEY.md §7) separates concerns:

* build: a host-side builder producing *flat arrays* (this file: Morton-sorted
  median-split binary BVH in NumPy; a native C++ binned-SAH builder replaces
  the splitter for production — scene build is one-time host work exactly as
  in the reference).
* traversal: lock-step stack traversal over the whole ray wavefront inside
  `lax.while_loop`; every ray advances one node per iteration with masked
  lanes, the TPU analogue of the reference's per-ray stack loop. Near-child
  ordering follows the sign of the ray direction on the node split axis.

Leaf encoding: child pointer < 0 means leaf primitive `-(ptr) - 1`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math3d import Array
from ..scene.types import BVH, Geometry
from .intersect import Hit, moller_trumbore

MAX_STACK = 64


def build_bvh(positions: np.ndarray, tri_vidx: np.ndarray,
              method: str = "auto") -> BVH:
    """Build the scene BVH. `method`: "sbvh" (native C++ binned-SAH with
    Stich2009 spatial splits — the reference's default accelerator,
    SBVH.h:57-348), "lbvh" (Python Morton median-split), or "auto" (SBVH when
    the native library is available, LBVH otherwise)."""
    if method not in ("auto", "sbvh", "lbvh"):
        raise ValueError(f"unknown BVH method {method!r}")
    if method != "lbvh" and len(tri_vidx) >= 2:
        from ..native import sbvh_build

        positions = np.asarray(positions, np.float32)
        tri_vidx = np.asarray(tri_vidx)
        res = sbvh_build(
            positions[tri_vidx[:, 0]],
            positions[tri_vidx[:, 1]],
            positions[tri_vidx[:, 2]],
        )
        # The lock-step traversal has a fixed MAX_STACK; an overly deep tree
        # falls back to the (balanced) median-split builder.
        if res is not None and res.depth + 2 < MAX_STACK:
            from ..utils.metrics import log_build_stats

            log_build_stats(
                "sbvh", tris=len(tri_vidx), nodes=res.n_nodes,
                refs=res.n_refs, depth=res.depth,
                sah_cost=round(res.sah_cost, 2), budget_hit=res.budget_hit,
            )
            return BVH(
                node_min=jnp.asarray(res.node_min),
                node_max=jnp.asarray(res.node_max),
                node_left=jnp.asarray(res.node_left),
                node_right=jnp.asarray(res.node_right),
                prim_order=jnp.asarray(res.prim_order),
            )
        if method == "sbvh":
            raise RuntimeError("native SBVH build unavailable or tree too deep")
    return build_lbvh(positions, tri_vidx)


def build_lbvh(positions: np.ndarray, tri_vidx: np.ndarray) -> BVH:
    """Median-split BVH over triangle centroids, Morton-presorted.

    Returns flat arrays (see types.BVH). Host-side NumPy; one-time cost.
    """
    p0 = positions[tri_vidx[:, 0]]
    p1 = positions[tri_vidx[:, 1]]
    p2 = positions[tri_vidx[:, 2]]
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    centroids = 0.5 * (tri_min + tri_max)
    n = len(tri_vidx)

    if n == 1:
        return BVH(
            node_min=jnp.asarray(tri_min.reshape(1, 3)),
            node_max=jnp.asarray(tri_max.reshape(1, 3)),
            node_left=jnp.asarray([-1], jnp.int32),
            node_right=jnp.asarray([-1], jnp.int32),
            prim_order=jnp.asarray([0], jnp.int32),
        )

    # Morton presort for locality (LBVH flavor).
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip(((centroids - lo) / ext) * 1023.0, 0, 1023).astype(np.uint64)

    def expand_bits(v):
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    morton = (
        (expand_bits(q[:, 0]) << 2)
        | (expand_bits(q[:, 1]) << 1)
        | expand_bits(q[:, 2])
    )
    order = np.argsort(morton, kind="stable").astype(np.int32)

    s_min = tri_min[order]
    s_max = tri_max[order]
    s_cent = centroids[order]

    # Iterative median-split over sorted ranges.
    num_nodes = n - 1
    node_min = np.zeros((num_nodes, 3), np.float32)
    node_max = np.zeros((num_nodes, 3), np.float32)
    node_left = np.zeros((num_nodes,), np.int32)
    node_right = np.zeros((num_nodes,), np.int32)

    # Prefix AABBs for O(1) range AABB queries.
    pre_min = np.minimum.accumulate(s_min, axis=0)
    # (full-range only; per-range AABB computed on the fly with reductions)

    next_node = [0]
    stack = [(0, n)]  # ranges; root gets node id 0
    ids = {}

    # First pass: assign node ids in DFS order.
    def alloc():
        i = next_node[0]
        next_node[0] += 1
        return i

    # Build with explicit stack carrying (lo, hi, node_id).
    root_id = alloc()
    work = [(0, n, root_id)]
    while work:
        lo_i, hi_i, nid = work.pop()
        rng_min = s_min[lo_i:hi_i].min(axis=0)
        rng_max = s_max[lo_i:hi_i].max(axis=0)
        node_min[nid] = rng_min
        node_max[nid] = rng_max
        count = hi_i - lo_i
        # Median split on the widest centroid axis of this range.
        c = s_cent[lo_i:hi_i]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        local = np.argsort(c[:, axis], kind="stable")
        sel = np.arange(lo_i, hi_i)[local]
        s_min[lo_i:hi_i] = s_min[sel]
        s_max[lo_i:hi_i] = s_max[sel]
        s_cent[lo_i:hi_i] = s_cent[sel]
        order[lo_i:hi_i] = order[sel]
        mid = lo_i + count // 2

        if mid - lo_i == 1:
            node_left[nid] = -(lo_i) - 1
        else:
            cid = alloc()
            node_left[nid] = cid
            work.append((lo_i, mid, cid))
        if hi_i - mid == 1:
            node_right[nid] = -(mid) - 1
        else:
            cid = alloc()
            node_right[nid] = cid
            work.append((mid, hi_i, cid))

    return BVH(
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        node_left=jnp.asarray(node_left),
        node_right=jnp.asarray(node_right),
        prim_order=jnp.asarray(order),
    )


def build_bvh_boxes_np(
    bmin: np.ndarray, bmax: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Median-split BVH over arbitrary AABBs (host NumPy). Returns
    (node_min, node_max, node_left, node_right, order) in the same flat
    layout as BVH; used for the TLAS over instance motion bounds. n >= 2."""
    n = len(bmin)
    assert n >= 2
    s_min = np.asarray(bmin, np.float32).copy()
    s_max = np.asarray(bmax, np.float32).copy()
    s_cent = 0.5 * (s_min + s_max)
    order = np.arange(n, dtype=np.int32)

    num_nodes = n - 1
    node_min = np.zeros((num_nodes, 3), np.float32)
    node_max = np.zeros((num_nodes, 3), np.float32)
    node_left = np.zeros((num_nodes,), np.int32)
    node_right = np.zeros((num_nodes,), np.int32)

    next_id = [0]

    def alloc():
        i = next_id[0]
        next_id[0] += 1
        return i

    work = [(0, n, alloc())]
    while work:
        lo_i, hi_i, nid = work.pop()
        node_min[nid] = s_min[lo_i:hi_i].min(axis=0)
        node_max[nid] = s_max[lo_i:hi_i].max(axis=0)
        c = s_cent[lo_i:hi_i]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        local = np.argsort(c[:, axis], kind="stable")
        sel = np.arange(lo_i, hi_i)[local]
        s_min[lo_i:hi_i] = s_min[sel]
        s_max[lo_i:hi_i] = s_max[sel]
        s_cent[lo_i:hi_i] = s_cent[sel]
        order[lo_i:hi_i] = order[sel]
        mid = lo_i + (hi_i - lo_i) // 2
        if mid - lo_i == 1:
            node_left[nid] = -(lo_i) - 1
        else:
            cid = alloc()
            node_left[nid] = cid
            work.append((lo_i, mid, cid))
        if hi_i - mid == 1:
            node_right[nid] = -(mid) - 1
        else:
            cid = alloc()
            node_right[nid] = cid
            work.append((mid, hi_i, cid))
    return node_min, node_max, node_left, node_right, order


def _slab_test(bmin, bmax, o, inv_d, tmin, tmax):
    """AABB slab test (reference BoundingBox3D::intersect, geometry.h:39-135)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tnear <= tfar) & (tfar >= tmin) & (tnear <= tmax), tnear


def intersect_bvh(
    geom: Geometry,
    bvh: BVH,
    o: Array,
    d: Array,
    tmin: Array | float = 1e-4,
    tmax: Array | float = jnp.inf,
) -> Hit:
    """Closest-hit via lock-step stack traversal. o/d: (R, 3)."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax0 = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)

    sorted_tri = bvh.prim_order  # leaf i -> triangle sorted_tri[i]
    v0 = geom.positions[geom.tri_vidx[:, 0]]
    v1 = geom.positions[geom.tri_vidx[:, 1]]
    v2 = geom.positions[geom.tri_vidx[:, 2]]

    stack = jnp.zeros((r, MAX_STACK), jnp.int32)
    sp = jnp.ones((r,), jnp.int32)  # root (node 0) pre-pushed
    best_t = tmax0
    best_tri = jnp.full((r,), -1, jnp.int32)
    best_b1 = jnp.zeros((r,), jnp.float32)
    best_b2 = jnp.zeros((r,), jnp.float32)

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_tri, best_b1, best_b2 = state
        active = sp > 0
        sp_idx = jnp.maximum(sp - 1, 0)
        entry = jnp.take_along_axis(stack, sp_idx[:, None], axis=1)[:, 0]
        sp_new = jnp.where(active, sp - 1, sp)

        is_leaf = entry < 0
        prim = jnp.maximum(-(entry) - 1, 0)
        tri = sorted_tri[prim]
        t, b1, b2, hit = moller_trumbore(
            o, d, v0[tri], v1[tri], v2[tri], tmin, best_t
        )
        take = active & is_leaf & hit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_tri = jnp.where(take, tri, best_tri)
        best_b1 = jnp.where(take, b1, best_b1)
        best_b2 = jnp.where(take, b2, best_b2)

        # Interior: test child boxes, push far then near.
        node = jnp.maximum(entry, 0)
        left = bvh.node_left[node]
        right = bvh.node_right[node]
        lmin = bvh.node_min[jnp.maximum(left, 0)]
        lmax = bvh.node_max[jnp.maximum(left, 0)]
        rmin = bvh.node_min[jnp.maximum(right, 0)]
        rmax = bvh.node_max[jnp.maximum(right, 0)]
        # Leaf children: use their primitive's AABB via triangle bounds.
        ltri = sorted_tri[jnp.maximum(-(left) - 1, 0)]
        rtri = sorted_tri[jnp.maximum(-(right) - 1, 0)]
        lp = jnp.stack([v0[ltri], v1[ltri], v2[ltri]], axis=1)
        rp = jnp.stack([v0[rtri], v1[rtri], v2[rtri]], axis=1)
        lmin = jnp.where((left < 0)[:, None], lp.min(axis=1), lmin)
        lmax = jnp.where((left < 0)[:, None], lp.max(axis=1), lmax)
        rmin = jnp.where((right < 0)[:, None], rp.min(axis=1), rmin)
        rmax = jnp.where((right < 0)[:, None], rp.max(axis=1), rmax)

        lhit, lnear = _slab_test(lmin, lmax, o, inv_d, tmin, best_t)
        rhit, rnear = _slab_test(rmin, rmax, o, inv_d, tmin, best_t)
        interior = active & jnp.logical_not(is_leaf)
        lhit = interior & lhit
        rhit = interior & rhit

        near_is_left = lnear <= rnear
        first = jnp.where(near_is_left, left, right)
        second = jnp.where(near_is_left, right, left)
        first_hit = jnp.where(near_is_left, lhit, rhit)
        second_hit = jnp.where(near_is_left, rhit, lhit)

        # Push far (second) first so near pops first.
        def push(stack, sp, value, mask):
            idx = jnp.minimum(sp, MAX_STACK - 1)
            updated = jax.vmap(lambda s, i, v: s.at[i].set(v))(stack, idx, value)
            stack = jnp.where(mask[:, None], updated, stack)
            sp = jnp.where(mask, jnp.minimum(sp + 1, MAX_STACK), sp)
            return stack, sp

        stack, sp_new = push(stack, sp_new, second, second_hit)
        stack, sp_new = push(stack, sp_new, first, first_hit)
        return stack, sp_new, best_t, best_tri, best_b1, best_b2

    state = (stack, sp, best_t, best_tri, best_b1, best_b2)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t, tri, b1, b2 = state
    mask = tri >= 0
    t = jnp.where(mask, t, jnp.inf)
    return Hit(t=t, tri=tri, b0=1.0 - b1 - b2, b1=b1, mask=mask)
