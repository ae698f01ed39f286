"""Two-level (TLAS over instances -> BLAS over triangles) traversal.

The reference handles instancing and motion blur with
TransformedSurfaceObject: the ray is transformed into object space at
`ray.time`, the wrapped aggregate is traversed, and the hit's transform
stack is unwound when resolving the surface point (SurfaceObject.cpp:307-336).
The TPU formulation keeps the whole wavefront in lock-step with a dual
stack of (node, instance) pairs: entries tagged instance -1 traverse the
TLAS in world space; entering a TLAS leaf pushes the instance's BLAS root
tagged with the instance id, and every iteration re-derives the ray in the
space of the popped entry's instance from the interpolated TRS — branchless,
no per-ray transform stack, no matrix materialization.

Hit.t is a WORLD-space parameter throughout: local rays keep unnormalized
directions (core/transform.py), so t values from static and instanced
geometry compare directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math3d import Array
from ..core.transform import trs_at, trs_inv_apply_point, trs_inv_apply_vector
from ..scene.types import Geometry, Instances
from .intersect import Hit, moller_trumbore
from .lbvh import MAX_STACK, _slab_test


def _instance_ray(inst: Instances, iid: Array, f: Array, o: Array, d: Array):
    """Ray in the space of instance iid (>=0) at shutter fraction f."""
    i = jnp.maximum(iid, 0)
    T, R, S = trs_at(
        inst.t0_T[i], inst.t0_R[i], inst.t0_S[i],
        inst.t1_T[i], inst.t1_R[i], inst.t1_S[i], f,
    )
    o_l = trs_inv_apply_point(T, R, S, o)
    d_l = trs_inv_apply_vector(T, R, S, d)
    world = (iid < 0)[..., None]
    return jnp.where(world, o, o_l), jnp.where(world, d, d_l)


def intersect_instances(
    geom: Geometry,
    inst: Instances,
    o: Array,
    d: Array,
    f: Array,
    tmin: Array | float = 1e-4,
    tmax: Array | float = jnp.inf,
) -> Hit:
    """Closest hit against all instances. o/d: (R, 3) world rays; f: (R,)
    shutter fraction in [0, 1]."""
    r = o.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax0 = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    f = jnp.broadcast_to(jnp.asarray(f, jnp.float32), (r,))

    v0 = geom.positions[geom.tri_vidx[:, 0]]
    v1 = geom.positions[geom.tri_vidx[:, 1]]
    v2 = geom.positions[geom.tri_vidx[:, 2]]

    stack_n = jnp.zeros((r, MAX_STACK), jnp.int32)
    stack_i = jnp.full((r, MAX_STACK), -1, jnp.int32)
    sp = jnp.ones((r,), jnp.int32)  # TLAS root (node 0, inst -1) pre-pushed
    best_t = tmax0
    best_tri = jnp.full((r,), -1, jnp.int32)
    best_inst = jnp.full((r,), -1, jnp.int32)
    best_b1 = jnp.zeros((r,), jnp.float32)
    best_b2 = jnp.zeros((r,), jnp.float32)

    def cond(state):
        return jnp.any(state[2] > 0)

    def body(state):
        stack_n, stack_i, sp, best_t, best_tri, best_inst, best_b1, best_b2 = state
        active = sp > 0
        idx = jnp.maximum(sp - 1, 0)
        node = jnp.take_along_axis(stack_n, idx[:, None], axis=1)[:, 0]
        itag = jnp.take_along_axis(stack_i, idx[:, None], axis=1)[:, 0]
        sp = jnp.where(active, sp - 1, sp)

        o_l, d_l = _instance_ray(inst, itag, f, o, d)
        inv_d = 1.0 / jnp.where(
            jnp.abs(d_l) < 1e-20, jnp.where(d_l >= 0, 1e-20, -1e-20), d_l
        )

        at_tlas = itag < 0
        is_leaf = node < 0
        slot = jnp.maximum(-(node) - 1, 0)

        # --- TLAS leaf: enter the instance's BLAS --------------------------
        enter_i = inst.tlas_prim[jnp.minimum(slot, inst.tlas_prim.shape[0] - 1)]
        enter = active & at_tlas & is_leaf

        # --- BLAS leaf: triangle test in local space -----------------------
        tri = inst.blas_prim[jnp.minimum(slot, inst.blas_prim.shape[0] - 1)]
        t, b1, b2, hit = moller_trumbore(
            o_l, d_l, v0[tri], v1[tri], v2[tri], tmin, best_t
        )
        take = active & jnp.logical_not(at_tlas) & is_leaf & hit & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_tri = jnp.where(take, tri, best_tri)
        best_inst = jnp.where(take, itag, best_inst)
        best_b1 = jnp.where(take, b1, best_b1)
        best_b2 = jnp.where(take, b2, best_b2)

        # --- interior: child AABBs from the level's arrays -----------------
        n_safe = jnp.maximum(node, 0)
        left = jnp.where(at_tlas, inst.tlas_left[jnp.minimum(n_safe, inst.tlas_left.shape[0] - 1)],
                         inst.blas_left[jnp.minimum(n_safe, inst.blas_left.shape[0] - 1)])
        right = jnp.where(at_tlas, inst.tlas_right[jnp.minimum(n_safe, inst.tlas_right.shape[0] - 1)],
                          inst.blas_right[jnp.minimum(n_safe, inst.blas_right.shape[0] - 1)])

        def child_box(c):
            ci = jnp.maximum(c, 0)
            cs = jnp.maximum(-(c) - 1, 0)
            # interior child box per level
            imin = jnp.where(
                at_tlas[:, None],
                inst.tlas_min[jnp.minimum(ci, inst.tlas_min.shape[0] - 1)],
                inst.blas_min[jnp.minimum(ci, inst.blas_min.shape[0] - 1)],
            )
            imax = jnp.where(
                at_tlas[:, None],
                inst.tlas_max[jnp.minimum(ci, inst.tlas_max.shape[0] - 1)],
                inst.blas_max[jnp.minimum(ci, inst.blas_max.shape[0] - 1)],
            )
            # leaf child box: instance motion bounds (TLAS) or tri AABB (BLAS)
            li = inst.tlas_prim[jnp.minimum(cs, inst.tlas_prim.shape[0] - 1)]
            lt = inst.blas_prim[jnp.minimum(cs, inst.blas_prim.shape[0] - 1)]
            tp = jnp.stack([v0[lt], v1[lt], v2[lt]], axis=1)
            lmin = jnp.where(at_tlas[:, None], inst.inst_bmin[li], tp.min(axis=1))
            lmax = jnp.where(at_tlas[:, None], inst.inst_bmax[li], tp.max(axis=1))
            leaf = (c < 0)[:, None]
            return jnp.where(leaf, lmin, imin), jnp.where(leaf, lmax, imax)

        lmin, lmax = child_box(left)
        rmin, rmax = child_box(right)
        # TLAS boxes are world-space; BLAS boxes local. The popped ray o_l/d_l
        # is in the matching space already.
        lhit, lnear = _slab_test(lmin, lmax, o_l, inv_d, tmin, best_t)
        rhit, rnear = _slab_test(rmin, rmax, o_l, inv_d, tmin, best_t)
        interior = active & jnp.logical_not(is_leaf)
        lhit = interior & lhit
        rhit = interior & rhit

        near_is_left = lnear <= rnear
        first = jnp.where(near_is_left, left, right)
        second = jnp.where(near_is_left, right, left)
        first_hit = jnp.where(near_is_left, lhit, rhit)
        second_hit = jnp.where(near_is_left, rhit, lhit)

        def push(sn, si, sp, n_val, i_val, mask):
            idx = jnp.minimum(sp, MAX_STACK - 1)
            sn_u = jax.vmap(lambda s, i, v: s.at[i].set(v))(sn, idx, n_val)
            si_u = jax.vmap(lambda s, i, v: s.at[i].set(v))(si, idx, i_val)
            sn = jnp.where(mask[:, None], sn_u, sn)
            si = jnp.where(mask[:, None], si_u, si)
            sp = jnp.where(mask, jnp.minimum(sp + 1, MAX_STACK), sp)
            return sn, si, sp

        # TLAS-leaf entries push the BLAS root tagged with the instance; a
        # child box was already tested when this entry was pushed.
        blas_root = inst.blas_root[jnp.minimum(enter_i, inst.blas_root.shape[0] - 1)]
        stack_n, stack_i, sp = push(stack_n, stack_i, sp, blas_root, enter_i, enter)
        # Interior children: far first so near pops first; children keep the
        # parent's instance tag (TLAS children are TLAS entries, etc.).
        stack_n, stack_i, sp = push(stack_n, stack_i, sp, second, itag, second_hit)
        stack_n, stack_i, sp = push(stack_n, stack_i, sp, first, itag, first_hit)
        return stack_n, stack_i, sp, best_t, best_tri, best_inst, best_b1, best_b2

    state = (stack_n, stack_i, sp, best_t, best_tri, best_inst, best_b1, best_b2)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, t, tri, iid, b1, b2 = state
    mask = tri >= 0
    t = jnp.where(mask, t, jnp.inf)
    return Hit(t=t, tri=tri, b0=1.0 - b1 - b2, b1=b1, mask=mask, inst=iid)
