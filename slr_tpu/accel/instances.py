"""Host-side construction of the two-level acceleration structure.

Counterpart of the reference's per-instance aggregate wrapping: a
ReferenceNode builds its subtree's aggregate once and re-wraps it per
instance in a TransformedSurfaceObject (nodes.cpp:174-184); animated
transforms likewise wrap a sub-aggregate (nodes.cpp:110-171). Here each
shared subtree becomes one BLAS in a concatenated node arena, instances are
rows of shutter-endpoint TRS decompositions, and a TLAS is built over the
instances' motion bounds (AnimatedTransform::motionBounds semantics).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.transform import decompose_trs, motion_bounds_np
from ..scene.types import Instances
from .lbvh import build_bvh, build_bvh_boxes_np


def build_instances(
    positions: np.ndarray,
    tri_vidx: np.ndarray,
    blas_ranges: list[tuple[int, int]],
    rows: list[tuple[int, np.ndarray, np.ndarray]],
) -> Instances:
    """positions/tri_vidx: the FULL unified geometry (instanced triangles in
    local space). blas_ranges: [lo, hi) global-triangle-id range per BLAS.
    rows: (blas_id, world_matrix_at_shutter_begin, ..._end) per instance."""
    node_min: list[np.ndarray] = []
    node_max: list[np.ndarray] = []
    node_left: list[np.ndarray] = []
    node_right: list[np.ndarray] = []
    prim: list[np.ndarray] = []
    roots: list[int] = []       # per BLAS: arena node id or leaf encoding
    local_bounds: list[tuple[np.ndarray, np.ndarray]] = []
    n_nodes = 0
    n_prims = 0

    positions = np.asarray(positions, np.float32)
    tri_vidx = np.asarray(tri_vidx, np.int32)

    for lo, hi in blas_ranges:
        count = hi - lo
        assert count >= 1
        tv = tri_vidx[lo:hi]
        p = positions[tv.reshape(-1)].reshape(count, 3, 3)
        bmin = p.min(axis=1).min(axis=0)
        bmax = p.max(axis=1).max(axis=0)
        local_bounds.append((bmin, bmax))
        if count == 1:
            roots.append(-(n_prims) - 1)
            prim.append(np.asarray([lo], np.int32))
            n_prims += 1
            continue
        bvh = build_bvh(positions, tv)
        nm = np.asarray(bvh.node_min)
        nx = np.asarray(bvh.node_max)
        nl = np.asarray(bvh.node_left).copy()
        nr = np.asarray(bvh.node_right).copy()
        po = np.asarray(bvh.prim_order).copy()
        # Re-base: interior pointers by the arena offset, leaf slots by the
        # prim offset, local prim ids to global triangle ids.
        for arr in (nl, nr):
            interior = arr >= 0
            arr[interior] += n_nodes
            leafs = ~interior
            arr[leafs] = -((-(arr[leafs]) - 1) + n_prims) - 1
        roots.append(n_nodes)
        node_min.append(nm)
        node_max.append(nx)
        node_left.append(nl)
        node_right.append(nr)
        prim.append(po.astype(np.int32) + lo)
        n_nodes += len(nm)
        n_prims += len(po)

    # Instance rows: decompose world matrices at the shutter endpoints.
    I = len(rows)
    assert I >= 1
    t0_T = np.zeros((I, 3), np.float32)
    t0_R = np.zeros((I, 4), np.float32)
    t0_S = np.zeros((I, 3), np.float32)
    t1_T = np.zeros((I, 3), np.float32)
    t1_R = np.zeros((I, 4), np.float32)
    t1_S = np.zeros((I, 3), np.float32)
    blas_root = np.zeros((I,), np.int32)
    inst_bmin = np.zeros((I, 3), np.float32)
    inst_bmax = np.zeros((I, 3), np.float32)
    for i, (bid, m0, m1) in enumerate(rows):
        tr0 = decompose_trs(m0)
        tr1 = decompose_trs(m1)
        t0_T[i], t0_R[i], t0_S[i] = tr0
        t1_T[i], t1_R[i], t1_S[i] = tr1
        blas_root[i] = roots[bid]
        lb = local_bounds[bid]
        static = np.allclose(np.asarray(m0), np.asarray(m1))
        inst_bmin[i], inst_bmax[i] = motion_bounds_np(
            lb[0], lb[1], tr0, tr1, steps=1 if static else 16
        )

    # TLAS over instance motion bounds. A single instance gets a root whose
    # two children are the same leaf (double-visit, still correct).
    if I >= 2:
        tm, tx, tl, tr_, order = build_bvh_boxes_np(inst_bmin, inst_bmax)
    else:
        tm = inst_bmin.reshape(1, 3)
        tx = inst_bmax.reshape(1, 3)
        tl = np.asarray([-1], np.int32)
        tr_ = np.asarray([-1], np.int32)
        order = np.asarray([0], np.int32)

    return Instances(
        tlas_min=jnp.asarray(tm),
        tlas_max=jnp.asarray(tx),
        tlas_left=jnp.asarray(tl),
        tlas_right=jnp.asarray(tr_),
        tlas_prim=jnp.asarray(order),
        inst_bmin=jnp.asarray(inst_bmin),
        inst_bmax=jnp.asarray(inst_bmax),
        blas_min=jnp.asarray(np.concatenate(node_min) if node_min
                             else np.zeros((1, 3), np.float32)),
        blas_max=jnp.asarray(np.concatenate(node_max) if node_max
                             else np.zeros((1, 3), np.float32)),
        blas_left=jnp.asarray(np.concatenate(node_left) if node_left
                              else np.zeros((1,), np.int32)),
        blas_right=jnp.asarray(np.concatenate(node_right) if node_right
                               else np.zeros((1,), np.int32)),
        blas_prim=jnp.asarray(np.concatenate(prim)),
        blas_root=jnp.asarray(blas_root),
        t0_T=jnp.asarray(t0_T), t0_R=jnp.asarray(t0_R), t0_S=jnp.asarray(t0_S),
        t1_T=jnp.asarray(t1_T), t1_R=jnp.asarray(t1_R), t1_S=jnp.asarray(t1_S),
    )
