"""Pair-stream traversal: per-RAY ordered descent for high-depth-complexity
scenes (the RTC3 class), built from XLA sorts + the existing Pallas chunk
kernel.

The block-worklist kernel (pallas_intersect.py) assigns work at 256-ray-block
granularity: every entry any ray in the block might need costs the whole
block an MXU pass. At grazing angles through fine geometry (a grass field) a
block's frustum overlaps hundreds of leaf boxes while each RAY only needs a
handful — utilization collapses and the RTC3-class scene ran 10x slower than
the parity scene (VERDICT r3 #1).

This module restores per-ray granularity the TPU way — no per-lane stacks,
no gathers in the hot loop:

* **super level**: entries are grouped 16-at-a-time (DFS/scanline order, so
  groups are spatially tight) into super AABBs (PallasTris.supers). Each ray
  slab-tests every super ONCE per cast — an (R, NS) dense cull, the per-ray
  analogue of the reference's upper-tree descent (SBVH.h:417-442).
* **ordered rounds**: each round, every unresolved ray picks its K nearest
  unconsumed supers with near-plane < its current best t. Rays whose next
  super lies beyond their best hit are done — the per-ray early-out the
  block kernel cannot express.
* **pair streams**: (ray, super) pairs are sorted by super and RUN-PADDED to
  256-pair groups, so every kernel group serves exactly ONE super: its
  worklist is that super's <=16 child entries, its 256 rows are 256 rays
  that all asked for it. MXU utilization is per-ray exact; the kernel's
  scan-ahead box test prunes children per group.
* the existing `_run_kernel` is reused unchanged (n_entries=16 per group);
  instanced entries keep their in-kernel ray transform.

Work per ray is O(supers overlapped before first hit) ~ O(k + log n), not
O(block-union); sorts are a few ms per cast (argsort of ~400k int32).

Reference semantics: ordered stack traversal SBVH.h:417-442 / QBVH.h:295-339
(per-ray near-first descent with `isect->t` pruning).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.math3d import Array
from .intersect import Hit, RAY_EPSILON, moller_trumbore
from .pallas_intersect import (
    RB,
    ROWS,
    SUPER_GROUP,
    T_FAR,
    PallasTris,
    _prefetch_tables,
    _ray_ranges,
    _run_kernel,
    _scene_exit_clamp,
)

# Use the pair-stream path above this many worklist entries; below it the
# block-worklist kernel's per-block union is tight enough and cheaper.
PAIR_THRESHOLD = 192
# Supers each unresolved ray consumes per round.
K_SUPERS = 2
MAX_ROUNDS = 512


def _super_tn(o: Array, d: Array, tmin_a: Array, tmax_a: Array,
              supers: Array) -> Array:
    """(R, NS) conservative near distance of each ray vs each super box;
    T_FAR where the ray misses the box (or the lane is inactive)."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d >= 0, 1e-20, -1e-20), d)
    tn = jnp.full((o.shape[0], supers.shape[0]), -T_FAR, jnp.float32)
    tf = jnp.full_like(tn, T_FAR)
    for a in range(3):
        lo = supers[:, a][None, :]
        hi = supers[:, 3 + a][None, :]
        t0 = (lo - o[:, a, None]) * inv[:, a, None]
        t1 = (hi - o[:, a, None]) * inv[:, a, None]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (
        (tn <= tf)
        & (tf >= tmin_a[:, None])
        & (tn <= tmax_a[:, None])
        & (supers[:, 6][None, :] > 0.5)
    )
    return jnp.where(ok, jnp.maximum(tn, 0.0), T_FAR)


def _pack_base_rows(o, d, f):
    """(R, 16) base ray rows (Plücker layout of _pack_rays, per-ray);
    tmin/tmax (cols 10/11) are stamped per round."""
    from ..core.math3d import cross as _cross3

    r = o.shape[0]
    m = _cross3(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    f_col = (jnp.zeros((r, 1), jnp.float32) if f is None
             else jnp.broadcast_to(f, (r,))[:, None])
    zeros3 = jnp.zeros((r, 2), jnp.float32)
    return jnp.concatenate(
        [d, m, o, ones, zeros3, f_col, jnp.zeros((r, ROWS - 13), jnp.float32)],
        axis=1)


def _run_pad_positions(s_sorted: Array, p: int) -> Array:
    """Destination slot for each sorted pair such that every run of equal
    supers starts at a 256 multiple (so each 256-group holds ONE super).
    Pure cumsum/cummax arithmetic — no data-dependent shapes."""
    iota = jnp.arange(p, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), s_sorted[1:] != s_sorted[:-1]])
    is_last = jnp.concatenate(
        [s_sorted[1:] != s_sorted[:-1], jnp.ones((1,), bool)])
    first_i = jax.lax.cummax(jnp.where(start, iota, -1))
    idx_in_run = iota - first_i
    run_len_at_last = idx_in_run + 1
    padded_at_last = jnp.where(
        is_last, ((run_len_at_last + 255) // 256) * 256, 0)
    pad_prefix = jnp.cumsum(padded_at_last)          # inclusive over lasts
    # Offset of the run containing i = total padded length of runs that
    # ended strictly before first_i.
    prev = first_i - 1
    offset = jnp.where(prev >= 0, pad_prefix[jnp.maximum(prev, 0)], 0)
    return offset + idx_in_run


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "n_entries", "n_supers", "mode", "interpret"))
def _pairs_traverse(base_rows, tn_sup, tmin_a, tmax_a, boxes_s, echunk_s,
                    einst_s, itrs, tris, chunk, n_entries, n_supers,
                    mode="closest", interpret=False):
    """The round loop. Returns (best_t, best_slot, best_inst) where slot is
    the kernel triangle slot (chunk * C + lane) or -1."""
    r = base_rows.shape[0]
    ns = n_supers
    p = r * K_SUPERS
    p_pad = p + 256 * (ns + 1)
    n_groups = p_pad // 256 + (1 if p_pad % 256 else 0)
    p_pad = n_groups * 256

    def avail_mask(consumed, best_t):
        return jnp.logical_not(consumed) & (tn_sup < best_t[:, None])

    def cond(carry):
        return jnp.any(carry[0])

    def body(carry):
        _, consumed, best_t, best_slot, best_inst = carry

        # -- pick the K nearest unconsumed supers per ray ------------------
        pair_sup = []
        pair_valid = []
        cons = consumed
        for _ in range(K_SUPERS):
            key = jnp.where(avail_mask(cons, best_t), tn_sup, jnp.inf)
            kmin = jnp.min(key, axis=1)
            smin = jnp.argmin(key, axis=1).astype(jnp.int32)
            valid = kmin < T_FAR
            pair_sup.append(jnp.where(valid, smin, ns))
            pair_valid.append(valid)
            cons = cons | (jax.nn.one_hot(smin, ns, dtype=bool)
                           & valid[:, None])
        consumed = cons
        pair_sup = jnp.concatenate(pair_sup)       # (K*R,) ray-major per k
        pair_valid = jnp.concatenate(pair_valid)
        pair_ray = jnp.tile(jnp.arange(r, dtype=jnp.int32), K_SUPERS)

        # -- sort by super, run-pad so each 256-group is one super ---------
        perm = jnp.argsort(pair_sup).astype(jnp.int32)
        s_sorted = pair_sup[perm]
        dest = _run_pad_positions(s_sorted, p)
        pad_src = jnp.full((p_pad,), -1, jnp.int32).at[dest].set(perm)

        # -- group tables --------------------------------------------------
        slot0 = pad_src[0::256][:n_groups]
        g_sup = jnp.where(slot0 >= 0, pair_sup[jnp.maximum(slot0, 0)], ns)
        child0 = g_sup * SUPER_GROUP
        wl_g = child0[:, None] + jnp.arange(SUPER_GROUP,
                                            dtype=jnp.int32)[None, :]
        wl_g = jnp.minimum(wl_g, n_entries)        # sentinel row at NE
        cnt_g = jnp.where(
            g_sup < ns,
            jnp.clip(n_entries - child0, 0, SUPER_GROUP), 0
        ).astype(jnp.int32)
        wtn_g = jnp.zeros((n_groups * SUPER_GROUP,), jnp.float32)

        # -- gather pair rows (tmax = current best: exact per-ray bound) ---
        src_ray = jnp.where(pad_src >= 0,
                            pair_ray[jnp.maximum(pad_src, 0)], 0)
        live = (pad_src >= 0) & pair_valid[jnp.maximum(pad_src, 0)]
        rows = base_rows[src_ray]
        rows = rows.at[:, 10].set(
            jnp.where(live, tmin_a[src_ray], T_FAR))
        rows = rows.at[:, 11].set(
            jnp.where(live, best_t[src_ray], -T_FAR))
        rays_g = rows.reshape(n_groups, 256, ROWS).transpose(0, 2, 1)

        t_g, slot_g, inst_g = _run_kernel(
            wl_g.reshape(-1), wtn_g, cnt_g, boxes_s, echunk_s, einst_s,
            itrs, rays_g, tris, chunk, SUPER_GROUP, rb=256,
            interpret=interpret)

        # -- reduce pair results back onto rays ----------------------------
        t_flat = t_g.reshape(-1)
        slot_flat = slot_g.reshape(-1)
        inst_flat = inst_g.reshape(-1)
        inv_perm = jnp.argsort(perm).astype(jnp.int32)
        src_of_orig = dest[inv_perm]               # orig pair -> padded slot
        t_pair = t_flat[src_of_orig].reshape(K_SUPERS, r)
        slot_pair = slot_flat[src_of_orig].reshape(K_SUPERS, r)
        inst_pair = inst_flat[src_of_orig].reshape(K_SUPERS, r)
        for k in range(K_SUPERS):
            better = (slot_pair[k] >= 0) & (t_pair[k] < best_t)
            best_t = jnp.where(better, t_pair[k], best_t)
            best_slot = jnp.where(better, slot_pair[k], best_slot)
            best_inst = jnp.where(better, inst_pair[k], best_inst)

        if mode == "any":
            # Occlusion query: any hit resolves the ray outright.
            best_t = jnp.where(best_slot >= 0, -T_FAR, best_t)

        alive = jnp.any(avail_mask(consumed, best_t), axis=1)
        return (alive, consumed, best_t, best_slot, best_inst)

    consumed0 = jnp.zeros((r, ns), bool)
    best_t0 = tmax_a
    best_slot0 = jnp.full((r,), -1, jnp.int32)
    best_inst0 = jnp.full((r,), -1, jnp.int32)
    alive0 = jnp.any(avail_mask(consumed0, best_t0), axis=1)
    _, _, best_t, best_slot, best_inst = jax.lax.while_loop(
        cond, body, (alive0, consumed0, best_t0, best_slot0, best_inst0))
    return best_t, best_slot, best_inst


def _sentinel_tables(pt: PallasTris):
    """Entry tables extended with one sentinel row (index NE): an
    impossible box (lo=+T_FAR > hi=-T_FAR) that fails every slab test, so
    padded worklist children cost one box test and no DMA."""
    sent = jnp.asarray(
        [[T_FAR, T_FAR, T_FAR, -T_FAR, -T_FAR, -T_FAR, 0.0, 0.0]],
        jnp.float32)
    echunk, einst, itrs = _prefetch_tables(pt)
    boxes_s = jnp.concatenate([pt.boxes, sent], axis=0)
    echunk_s = jnp.concatenate([echunk, jnp.zeros((1,), jnp.int32)])
    einst_s = jnp.concatenate([einst, jnp.full((1,), -1, jnp.int32)])
    return boxes_s, echunk_s, einst_s, itrs


def intersect_pairs(
    geom,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    active: Array | None = None,
    f: Array | None = None,
    instances=None,
    interpret: bool = False,
) -> Hit:
    """Closest hit via the pair-stream rounds. Drop-in for
    intersect_pallas on large-entry-count scenes."""
    r = o.shape[0]
    tmin_a, tmax_a = _ray_ranges(r, tmin, tmax, active)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    tn_sup = _super_tn(o, d, tmin_a, tmax_a, pt.supers)
    base_rows = _pack_base_rows(o, d, f)
    boxes_s, echunk_s, einst_s, itrs = _sentinel_tables(pt)

    best_t, slot, inst = _pairs_traverse(
        base_rows, tn_sup, tmin_a, tmax_a, boxes_s, echunk_s, einst_s, itrs,
        pt.tris, pt.chunk, pt.n_entries, pt.n_supers, interpret=interpret)

    tri = jnp.where(slot >= 0, pt.remap[jnp.maximum(slot, 0)], -1)
    mask = (tri >= 0) & (best_t < T_FAR)

    tri_c = jnp.maximum(tri, 0)
    if geom.tri_table is not None:
        row = geom.tri_table[tri_c]
        p0 = row[:, 0:3]
        p1 = p0 + row[:, 3:6]
        p2 = p0 + row[:, 6:9]
    else:
        vidx = geom.tri_vidx[tri_c]
        p0 = geom.positions[vidx[:, 0]]
        p1 = geom.positions[vidx[:, 1]]
        p2 = geom.positions[vidx[:, 2]]
    o_mt, d_mt = o, d
    if instances is not None:
        from ..core.transform import quat_conj, quat_rotate, trs_at

        f_ = jnp.zeros((r,), jnp.float32) if f is None else f
        ic = jnp.maximum(inst, 0)
        T, R, S = trs_at(
            instances.t0_T[ic], instances.t0_R[ic], instances.t0_S[ic],
            instances.t1_T[ic], instances.t1_R[ic], instances.t1_S[ic], f_,
        )
        o_l = quat_rotate(quat_conj(R), o - T) / S
        d_l = quat_rotate(quat_conj(R), d) / S
        on_inst = (inst >= 0)[:, None]
        o_mt = jnp.where(on_inst, o_l, o)
        d_mt = jnp.where(on_inst, d_l, d)
    t_mt, b1, b2, _ = moller_trumbore(o_mt, d_mt, p0, p1, p2, 0.0, jnp.inf)
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0)
    t_final = jnp.where(mask, t_mt, jnp.inf)
    return Hit(t=t_final, tri=jnp.where(mask, tri, -1), b0=1.0 - b1 - b2,
               b1=b1, mask=mask,
               inst=jnp.where(mask, inst, -1) if instances is not None
               else None)


def anyhit_pairs(
    geom,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    active: Array | None = None,
    f: Array | None = None,
    interpret: bool = False,
) -> Array:
    """Occlusion query via the pair-stream rounds: resolves each ray on its
    FIRST found hit (ordered rounds make that the common first round)."""
    r = o.shape[0]
    tmin_a, tmax_a = _ray_ranges(r, tmin, tmax, active)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    tn_sup = _super_tn(o, d, tmin_a, tmax_a, pt.supers)
    base_rows = _pack_base_rows(o, d, f)
    boxes_s, echunk_s, einst_s, itrs = _sentinel_tables(pt)
    _, slot, _ = _pairs_traverse(
        base_rows, tn_sup, tmin_a, tmax_a, boxes_s, echunk_s, einst_s, itrs,
        pt.tris, pt.chunk, pt.n_entries, pt.n_supers, mode="any",
        interpret=interpret)
    return slot >= 0
