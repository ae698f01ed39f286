"""Pallas TPU closest-hit / any-hit kernels: BVH-treelet-guided Plücker
intersection with per-block culled worklists.

Round-1's kernel was a (ray_blocks x tri_chunks) grid: every ray block paid
DMA + a VPU epilogue for every chunk, with only a whole-block AABB `pl.when`
skip. This version makes traversal work proportional to what each ray block
actually needs, the wavefront analogue of the reference's per-ray ordered
stack traversal (libSLR/Accelerator/SBVH.h:417-442 / QBVH.h:295-339):

* **chunks are BVH treelets**: the SBVH (native builder) is cut into subtrees
  of <= C primitives, greedily packed in DFS order — spatially tight boxes,
  front-to-back coherent ordering (Morton chunking remains the no-BVH
  fallback);
* **per-block worklists, built in XLA**: every ray is slab-tested against
  every chunk AABB (vectorized, cheap), OR-reduced over the ray block, and
  the surviving chunks sorted front-to-back by block-entry distance;
* **scalar-prefetch + manual double-buffered DMA**: the kernel grid is 1-D
  over ray blocks; each block loops over ONLY its worklist with
  `lax.fori_loop`, streaming chunk tables HBM->VMEM with two buffers. A
  chunk whose AABB no ray can hit closer than its current best is skipped
  (ordered traversal early-out — effective because the worklist is sorted
  near-to-far);
* **wavefront compaction at block granularity**: callers pass an `active`
  mask; inactive lanes get degenerate [+3e38, -3e38] t-ranges, so they
  neither request chunks nor hold back the early-out. A fully-terminated ray
  block costs one (skipped) grid step.

Data layout (rays packed per call; triangles once at scene build):
  rays: (NB, 16, RB)  rows = [dx dy dz mx my mz ox oy oz 1 tmin tmax 0*4],
                      m = o x d (ray Plücker moment)
  tris: (NC, 16, 5C)  columns: [edge0 | edge1 | edge2 | n·d | d0 - n·o]
  boxes: (NC, 8) f32  [lo.xyz | hi.xyz | nonempty | pad] (scalar-prefetched)
  outputs: best_t (NB, RB) f32, best_idx (NB, RB) i32 — or occluded i32.

Padding slots carry all-zero rows, so den = n·d = 0 and the |den| > 1e-12
test rejects them — no separate validity mask is needed.

Reference for the intersection predicate: Triangle::intersect
(Möller-Trumbore, TriangleMesh.cpp:131-178) — reformulated as Plücker side
tests so the inner loop is one matrix product on the 128x128 systolic array.
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
from jax.experimental.pallas import tpu as pltpu

from ..core.math3d import Array
from ..scene.types import Geometry
from .intersect import Hit, RAY_EPSILON, moller_trumbore

RB = 256           # default rays per program instance (tunable per call)
NBUF = 4           # chunk-DMA pipeline depth (see _traverse_closest)
DEFAULT_CHUNK = 128
ROWS = 16          # packed ray rows (sublane-aligned)
T_FAR = 3e38       # finite stand-in for +inf (inf breaks slab arithmetic)
# Worklists up to this many entries ride the scalar prefetch into SMEM
# (each entry = 1 int32 id + 1 f32 near-distance, ~512 KB total); larger
# tables go to HBM with a per-block DMA.
SMALL_WL_INTS = 64 * 1024


# ---------------------------------------------------------------------------
# Chunk tables
# ---------------------------------------------------------------------------

class PallasTris(NamedTuple):
    """Triangle tables in kernel layout (pytree; host-built, device-resident).

    tris:  (NC, 16, 5C) Plücker chunk tables (see module docstring)
    boxes: (NE, 8) f32 per-ENTRY world AABB + nonempty flag (SMEM prefetch)
    remap: (NC*C,) int32 kernel slot -> original triangle id

    Instancing extension (TransformedSurfaceObject analogue,
    SurfaceObject.cpp:307-336, traversed IN-KERNEL instead of through an
    XLA while_loop): a worklist ENTRY is a (chunk, instance) pair. Static
    geometry has entry_inst = -1 and entry_chunk = chunk id; an instanced
    entry points at a LOCAL-space BLAS chunk plus an instance row, and the
    kernel transforms the ray block into instance space at each lane's
    shutter fraction before the MXU pass (world-parameter t is preserved
    because the transformed direction is left unnormalized).

    entry_chunk: (NE,) int32 chunk id per entry
    entry_inst:  (NE,) int32 instance id per entry (-1 = static)
    inst_trs:    (I, 24) f32 per-instance inverse-transform data
                 [T0(3) Q0(4) S0(3) | T1(3) Q1(4, pre-flipped for slerp)
                  S1(3) | theta sin_theta pad*3] (SMEM prefetch)
    Super boxes (union AABBs over groups of consecutive entries) are kept
    OUT of this pytree: as a traced argument the extra leaf measurably
    degraded XLA's compilation of the big BPT program (~27%% on the parity
    bench) despite being unused there. They ride FlatScene.super_boxes_blob
    as STATIC bytes instead and materialize as an XLA constant only inside
    the sort key that needs them (pt._ray_sort_key).
    """

    tris: Array
    boxes: Array
    remap: Array
    entry_chunk: Array = None
    entry_inst: Array = None
    inst_trs: Array = None

    @property
    def chunk(self) -> int:
        # remap has one slot per (chunk, lane); tris' minor dim may be
        # padded past 5*chunk to a 128-multiple for DMA alignment.
        return self.remap.shape[0] // self.tris.shape[0]

    @property
    def n_chunks(self) -> int:
        return self.tris.shape[0]

    @property
    def n_entries(self) -> int:
        return self.boxes.shape[0]


def build_super_boxes(boxes: np.ndarray, g: int = 16,
                      small: int = 48) -> np.ndarray:
    """Union AABBs over groups of `g` consecutive entries (entries are
    Morton/DFS ordered, so groups are spatially tight). Small tables keep
    per-entry granularity — the sort-key slab test is cheap there and the
    contact estimate is tighter."""
    b = np.asarray(boxes, np.float32)
    ne = b.shape[0]
    if ne <= small:
        return b.copy()
    ns = -(-ne // g)
    sup = np.zeros((ns, 8), np.float32)
    for i in range(ns):
        grp = b[i * g:(i + 1) * g]
        val = grp[:, 6] > 0.5
        if val.any():
            sup[i, 0:3] = grp[val, 0:3].min(axis=0)
            sup[i, 3:6] = grp[val, 3:6].max(axis=0)
            sup[i, 6] = 1.0
    return sup


def nearest_super_tn(o: Array, d: Array, super_boxes: Array) -> Array:
    """Per-ray near distance (clamped to >= 0) of the nearest slab-hit
    super box; T_FAR when the ray misses all of them. Layout (NS, R):
    the minor dim is the ray axis so vector ops run full-lane."""
    ot = o.T                    # (3, R)
    dt = d.T
    inv = 1.0 / jnp.where(jnp.abs(dt) < 1e-20,
                          jnp.where(dt >= 0, 1e-20, -1e-20), dt)
    ns = super_boxes.shape[0]
    r = o.shape[0]
    tn = jnp.full((ns, r), -T_FAR, jnp.float32)
    tf = jnp.full((ns, r), T_FAR, jnp.float32)
    for a in range(3):
        t0 = (super_boxes[:, a][:, None] - ot[a][None, :]) * inv[a][None, :]
        t1 = (super_boxes[:, 3 + a][:, None] - ot[a][None, :]) * inv[a][None, :]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf >= 0.0) & (super_boxes[:, 6][:, None] > 0.5)
    return jnp.min(jnp.where(ok, jnp.maximum(tn, 0.0), T_FAR), axis=0)


def _pad128(w: int) -> int:
    """Chunk-table rows are DMA'd whole; Mosaic requires the minor dim be a
    multiple of the 128-lane tile. 5*chunk is padded up with zero columns
    (inert: zero geometry fails the |den| test)."""
    return -(-w // 128) * 128


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


def _bvh_chunk_order(bvh, chunk: int) -> list[np.ndarray]:
    """Cut the BVH into chunks at MAXIMAL subtrees with <= chunk prims
    (canonical treelets). Each chunk is one subtree, so its AABB is tight by
    construction — never merge pieces across subtree boundaries: a previous
    greedy cross-piece packer produced ~25% of chunks whose boxes spanned
    the whole scene (DFS pops cross major splits), collapsing every cull
    level above them. Returns a list of arrays of *triangle ids*
    (prim_order already applied). Works for SBVH trees with duplicated
    references (spatial splits)."""
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    prim_order = np.asarray(bvh.prim_order)
    n_nodes = len(left)

    # Subtree reference counts; children are allocated after their parent in
    # both builders, so a reverse id sweep sees children before parents.
    count = np.zeros(n_nodes, np.int64)
    for nid in range(n_nodes - 1, -1, -1):
        l, r = left[nid], right[nid]
        count[nid] = (1 if l < 0 else count[l]) + (1 if r < 0 else count[r])

    def collect(ptr) -> list[int]:
        out: list[int] = []
        st = [ptr]
        while st:
            p = st.pop()
            if p < 0:
                out.append(-p - 1)
            else:
                st.append(right[p])
                st.append(left[p])
        return out

    # Chunk boxes come from the subtree NODE boxes, not the member
    # triangles' vertices: SBVH spatial splits duplicate references with
    # CHOPPED bounds (SBVH.h chopped/splitBounds), so a chunk holding a
    # chopped ref of a large triangle must claim only the chopped region —
    # the full-triangle box would span the scene and defeat every cull
    # level. Conservative-correct: every surface point is covered by the
    # subtree whose chopped ref contains it, and chunks still test the full
    # triangle (extra coverage only ever yields valid closer hits).
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    chunks: list[np.ndarray] = []
    boxes: list[np.ndarray] = []
    stack = [0]
    while stack:
        ptr = stack.pop()
        if ptr < 0:
            # Bare leaf ref directly under an over-full node: no node box of
            # its own; fall back to the full triangle's box (rare at
            # chunk >= 32).
            chunks.append(prim_order[np.asarray([-ptr - 1], np.int64)])
            boxes.append(None)
        elif count[ptr] <= chunk:
            chunks.append(prim_order[np.asarray(collect(ptr), np.int64)])
            boxes.append(np.concatenate([nmin[ptr], nmax[ptr]]))
        else:
            stack.append(right[ptr])
            stack.append(left[ptr])

    # Bounded-growth packing: merge CONSECUTIVE (DFS-adjacent) small pieces
    # while the union box stays within 1.5x the larger piece's diagonal —
    # recovers chunk fill (canonical cuts alone average ~50%) without ever
    # re-creating the scene-spanning chunks the unbounded greedy packer
    # produced.
    merged_c: list[np.ndarray] = []
    merged_b: list = []
    for ids, box in zip(chunks, boxes):
        if (box is not None and merged_c and merged_b[-1] is not None
                and len(merged_c[-1]) + len(ids) <= chunk):
            pb = merged_b[-1]
            lo = np.minimum(pb[0:3], box[0:3])
            hi = np.maximum(pb[3:6], box[3:6])
            d_new = float(np.linalg.norm(hi - lo))
            d_max = max(float(np.linalg.norm(pb[3:6] - pb[0:3])),
                        float(np.linalg.norm(box[3:6] - box[0:3])))
            if d_new <= 1.5 * max(d_max, 1e-12):
                merged_c[-1] = np.concatenate([merged_c[-1], ids])
                merged_b[-1] = np.concatenate([lo, hi])
                continue
        merged_c.append(ids)
        merged_b.append(None if box is None else box.copy())
    return merged_c, merged_b


def build_pallas_tris(geom: Geometry, chunk: int = DEFAULT_CHUNK,
                      bvh=None) -> PallasTris:
    """Build the kernel chunk tables. With a BVH, chunks are packed treelets
    (spatially tight, DFS/front-to-back ordered); otherwise Morton slices."""
    pos = np.asarray(geom.positions)
    tri = np.asarray(geom.tri_vidx)
    t = len(tri)

    chunk_boxes = None
    if bvh is not None and t >= 2:
        chunk_tris, chunk_boxes = _bvh_chunk_order(bvh, chunk)
    else:
        if t > 1:
            p0c = pos[tri[:, 0]]
            p1c = pos[tri[:, 1]]
            p2c = pos[tri[:, 2]]
            order = _morton_order((p0c + p1c + p2c) / 3.0)
        else:
            order = np.zeros((max(t, 1),), np.int32)
        chunk_tris = [order[i:i + chunk] for i in range(0, max(t, 1), chunk)]

    nc = len(chunk_tris)
    slot_tri = np.zeros((nc, chunk), np.int64)        # padded tri ids
    slot_valid = np.zeros((nc, chunk), bool)
    boxes = np.zeros((nc, 8), np.float32)
    for c, ids in enumerate(chunk_tris):
        k = len(ids)
        slot_tri[c, :k] = ids
        slot_valid[c, :k] = True
        if k:
            if chunk_boxes is not None and chunk_boxes[c] is not None:
                boxes[c, 0:6] = chunk_boxes[c]
            else:
                pts = pos[tri[ids].reshape(-1)]
                boxes[c, 0:3] = pts.min(axis=0)
                boxes[c, 3:6] = pts.max(axis=0)
            boxes[c, 6] = 1.0

    flat_tri = slot_tri.reshape(-1)
    p0 = pos[tri[flat_tri, 0]]
    p1 = pos[tri[flat_tri, 1]]
    p2 = pos[tri[flat_tri, 2]]
    v = slot_valid.reshape(-1)
    # Padding slots: zero geometry => n·d = 0 => rejected by the denom test.
    p0[~v] = 0.0
    p1[~v] = 0.0
    p2[~v] = 0.0

    def edge6(a, b):
        return np.concatenate([np.cross(a, b), b - a], axis=-1)

    e = np.stack([edge6(p0, p1), edge6(p1, p2), edge6(p2, p0)], axis=1)
    n = np.cross(p1 - p0, p2 - p0)
    d0 = np.einsum("ij,ij->i", n, p0)

    tt = nc * chunk
    tris = np.zeros((tt, ROWS, 5), np.float32)
    tris[:, 0:6, 0] = e[:, 0]       # edge0 Plücker
    tris[:, 0:6, 1] = e[:, 1]
    tris[:, 0:6, 2] = e[:, 2]
    tris[:, 0:3, 3] = n             # n·d column
    tris[:, 6:9, 4] = -n            # num column: -n·o ...
    tris[:, 9, 4] = d0              # ... + d0 * 1
    # (tt, 16, 5) -> (nc, 16, 5C) with column = col*C + slot
    tris = tris.reshape(nc, chunk, ROWS, 5).transpose(0, 2, 3, 1).reshape(
        nc, ROWS, 5 * chunk
    )
    wpad = _pad128(5 * chunk)
    if wpad != 5 * chunk:
        tris = np.concatenate(
            [tris, np.zeros((nc, ROWS, wpad - 5 * chunk), np.float32)],
            axis=2)
    remap = np.where(v, flat_tri, -1).astype(np.int32)
    return PallasTris(
        tris=jnp.asarray(tris),
        boxes=jnp.asarray(boxes),
        remap=jnp.asarray(remap),
        entry_chunk=jnp.arange(nc, dtype=jnp.int32),
        entry_inst=jnp.full((nc,), -1, jnp.int32),
        inst_trs=jnp.zeros((1, 24), jnp.float32),
    )


def chunk_table_rows(pos: np.ndarray, tri: np.ndarray,
                     chunk_tris: list, chunk: int = DEFAULT_CHUNK) -> tuple:
    """Shared chunk-table packing: list of triangle-id arrays -> (tris
    (NC,16,5C), local AABBs (NC,6), remap (NC*C,)). Factored out of
    build_pallas_tris so instanced BLAS chunks use identical layout."""
    nc = len(chunk_tris)
    slot_tri = np.zeros((nc, chunk), np.int64)
    slot_valid = np.zeros((nc, chunk), bool)
    boxes = np.zeros((nc, 6), np.float32)
    for c, ids in enumerate(chunk_tris):
        k = len(ids)
        slot_tri[c, :k] = ids
        slot_valid[c, :k] = True
        if k:
            pts = pos[tri[np.asarray(ids, np.int64)].reshape(-1)]
            boxes[c, 0:3] = pts.min(axis=0)
            boxes[c, 3:6] = pts.max(axis=0)

    flat_tri = slot_tri.reshape(-1)
    p0 = pos[tri[flat_tri, 0]].copy()
    p1 = pos[tri[flat_tri, 1]].copy()
    p2 = pos[tri[flat_tri, 2]].copy()
    v = slot_valid.reshape(-1)
    p0[~v] = 0.0
    p1[~v] = 0.0
    p2[~v] = 0.0

    def edge6(a, b):
        return np.concatenate([np.cross(a, b), b - a], axis=-1)

    e = np.stack([edge6(p0, p1), edge6(p1, p2), edge6(p2, p0)], axis=1)
    n = np.cross(p1 - p0, p2 - p0)
    d0 = np.einsum("ij,ij->i", n, p0)
    tt = nc * chunk
    tris = np.zeros((tt, ROWS, 5), np.float32)
    tris[:, 0:6, 0] = e[:, 0]
    tris[:, 0:6, 1] = e[:, 1]
    tris[:, 0:6, 2] = e[:, 2]
    tris[:, 0:3, 3] = n
    tris[:, 6:9, 4] = -n
    tris[:, 9, 4] = d0
    tris = tris.reshape(nc, chunk, ROWS, 5).transpose(0, 2, 3, 1).reshape(
        nc, ROWS, 5 * chunk
    )
    wpad = _pad128(5 * chunk)
    if wpad != 5 * chunk:
        tris = np.concatenate(
            [tris, np.zeros((nc, ROWS, wpad - 5 * chunk), np.float32)],
            axis=2)
    remap = np.where(v, flat_tri, -1).astype(np.int32)
    return tris, boxes, remap


def extend_pallas_instanced(static_pt: PallasTris, positions, tri_vidx,
                            blas_ranges: list, rows: list) -> PallasTris:
    """Append LOCAL-space BLAS chunks + per-(instance, chunk) worklist
    entries to a static chunk table, making the ONE Pallas kernel cover the
    whole two-level scene (the TransformedSurfaceObject mix,
    SurfaceObject.cpp:307-336). Entry boxes are the instance-transformed
    (motion-union, for animated rows) world AABBs of each BLAS chunk."""
    from ..core.transform import decompose_trs, motion_bounds_np

    pos = np.asarray(positions, np.float32)
    tv = np.asarray(tri_vidx, np.int64)
    chunk = static_pt.chunk
    nc_s = static_pt.n_chunks

    # Chunk each BLAS's local triangles (Morton order within the BLAS).
    blas_chunks: list[list[np.ndarray]] = []
    all_tris = [np.asarray(static_pt.tris)]
    all_remap = [np.asarray(static_pt.remap)]
    local_boxes: list[np.ndarray] = []
    next_chunk = nc_s
    blas_chunk_ids: list[np.ndarray] = []
    for lo, hi in blas_ranges:
        ids = np.arange(lo, hi, dtype=np.int64)
        if len(ids) > 1:
            cent = (pos[tv[ids, 0]] + pos[tv[ids, 1]] + pos[tv[ids, 2]]) / 3.0
            ids = ids[_morton_order(cent)]
        pieces = [ids[i:i + chunk] for i in range(0, len(ids), chunk)]
        tris_b, boxes_b, remap_b = chunk_table_rows(pos, tv, pieces,
                                                    chunk=chunk)
        all_tris.append(tris_b)
        all_remap.append(remap_b)
        local_boxes.append(boxes_b)
        blas_chunk_ids.append(
            np.arange(next_chunk, next_chunk + len(pieces), dtype=np.int32))
        next_chunk += len(pieces)
        blas_chunks.append(pieces)

    # Entries: static chunks first, then (instance x BLAS chunk).
    e_box = [np.asarray(static_pt.boxes)]
    e_chunk = [np.asarray(static_pt.entry_chunk)]
    e_inst = [np.asarray(static_pt.entry_inst)]
    inst_trs = np.zeros((max(len(rows), 1), 24), np.float32)
    for i, (bid, m0, m1) in enumerate(rows):
        tr0 = decompose_trs(m0)
        tr1 = decompose_trs(m1)
        T0, Q0, S0 = tr0
        T1, Q1, S1 = tr1
        d_q = float(np.dot(Q0, Q1))
        Q1f = Q1 if d_q >= 0 else -Q1
        theta = float(np.arccos(np.clip(abs(d_q), 0.0, 1.0)))
        inst_trs[i, 0:3] = T0
        inst_trs[i, 3:7] = Q0
        inst_trs[i, 7:10] = S0
        inst_trs[i, 10:13] = T1
        inst_trs[i, 13:17] = Q1f
        inst_trs[i, 17:20] = S1
        inst_trs[i, 20] = theta
        inst_trs[i, 21] = float(np.sin(theta))
        static = np.allclose(np.asarray(m0), np.asarray(m1))
        lb = local_boxes[bid]
        n_bc = lb.shape[0]
        eb = np.zeros((n_bc, 8), np.float32)
        for c in range(n_bc):
            bmin, bmax = motion_bounds_np(
                lb[c, 0:3], lb[c, 3:6], tr0, tr1,
                steps=1 if static else 16,
            )
            eb[c, 0:3] = bmin
            eb[c, 3:6] = bmax
            eb[c, 6] = 1.0
        e_box.append(eb)
        e_chunk.append(blas_chunk_ids[bid])
        e_inst.append(np.full((n_bc,), i, np.int32))

    # Morton-order the instanced entries by world box center: instances are
    # recorded in author order (scanline, or a random animated subset), so
    # consecutive entries — and hence the 16-entry supers built over them —
    # would otherwise span the whole scene.
    n_static_e = e_box[0].shape[0]
    boxes_all = np.concatenate(e_box, axis=0)
    e_chunk_all = np.concatenate(e_chunk, axis=0)
    e_inst_all = np.concatenate(e_inst, axis=0)
    tail = slice(n_static_e, boxes_all.shape[0])
    if boxes_all[tail].shape[0] > 1:
        cent = 0.5 * (boxes_all[tail, 0:3] + boxes_all[tail, 3:6])
        order = _morton_order(cent)
        boxes_all[tail] = boxes_all[tail][order]
        e_chunk_all[tail] = e_chunk_all[tail][order]
        e_inst_all[tail] = e_inst_all[tail][order]
    return PallasTris(
        tris=jnp.asarray(np.concatenate(all_tris, axis=0)),
        boxes=jnp.asarray(boxes_all),
        remap=jnp.asarray(np.concatenate(all_remap, axis=0)),
        entry_chunk=jnp.asarray(e_chunk_all),
        entry_inst=jnp.asarray(e_inst_all),
        inst_trs=jnp.asarray(inst_trs),
    )


# ---------------------------------------------------------------------------
# Worklist construction (plain XLA, runs inside the caller's jit)
# ---------------------------------------------------------------------------

def _chunk_worklist(rays: Array, boxes: Array, slice_w: int = 512
                    ) -> tuple[Array, Array, Array]:
    """Per-block culled, front-to-back ordered chunk worklists — EXACT
    per-ray slab tests for every entry, processed in entry slices so the
    (NB, S, RB) intermediates stay bounded. (An interval-arithmetic bundle
    variant used to cover large tables; its conservatism measured 2.2x
    fatter unions than per-ray truth on the grass scene — 47 vs 21.6 mean
    entries/block at RB=128 — and the kernel pays ~0.8 us per entry, so
    exactness here is the cheaper side of the trade.)

    rays (NB, 16, RB) packed; boxes (NE, 8). Returns (worklist (NB*NE,) i32,
    count (NB,) i32, near (NB*NE,) f32 sorted block-entry distances — the
    kernel's ordered-traversal break keys). Entries past `count` repeat the
    last valid chunk so the kernel's repeated index never triggers a fresh
    DMA."""
    nb, _, rb = rays.shape
    nc = boxes.shape[0]
    o = rays[:, 6:9, :]
    d = rays[:, 0:3, :]
    tminr = rays[:, 10, :]
    tmaxr = rays[:, 11, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d >= 0, 1e-20, -1e-20), d)
    # Layout (NB, S, RB): the MINOR dim must be the ray axis — an (…, S)
    # minor at S ~ 16-64 pads every vector op to 128 lanes (measured 5 ms
    # -> ~1 ms for the whole build at the parity scene).
    blk_parts = []
    tn_parts = []
    for s0 in range(0, nc, slice_w):
        bsl = boxes[s0:s0 + slice_w]
        ns = bsl.shape[0]
        tn = jnp.full((nb, ns, rb), -T_FAR, jnp.float32)
        tf = jnp.full((nb, ns, rb), T_FAR, jnp.float32)
        for a in range(3):
            lo = bsl[:, a][None, :, None]
            hi = bsl[:, 3 + a][None, :, None]
            t0 = (lo - o[:, a, None, :]) * inv[:, a, None, :]
            t1 = (hi - o[:, a, None, :]) * inv[:, a, None, :]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        ok = (
            (tn <= tf)
            & (tf >= tminr[:, None, :])
            & (tn <= tmaxr[:, None, :])
            & (bsl[:, 6][None, :, None] > 0.5)
        )
        blk_parts.append(jnp.any(ok, axis=2))                       # (NB, S)
        tn_parts.append(jnp.min(jnp.where(ok, tn, T_FAR), axis=2))  # (NB, S)
    blk = jnp.concatenate(blk_parts, axis=1)               # (NB, NC)
    tn_blk = jnp.concatenate(tn_parts, axis=1)             # (NB, NC)
    key = jnp.where(blk, tn_blk, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    near = jnp.minimum(jnp.sort(key, axis=1), T_FAR)
    count = jnp.sum(blk, axis=1).astype(jnp.int32)
    # One-hot select of order[count-1] (take_along_axis lowers to a
    # scalar-core gather).
    oh_last = (jnp.arange(nc, dtype=jnp.int32)[None, :]
               == jnp.maximum(count - 1, 0)[:, None])
    last = jnp.sum(jnp.where(oh_last, order, 0), axis=1, keepdims=True)
    wl = jnp.where(jnp.arange(nc, dtype=jnp.int32)[None, :] < count[:, None],
                   order, last)
    return wl.reshape(-1), count, near.reshape(-1)


def _build_worklist(rays: Array, boxes: Array
                    ) -> tuple[Array, Array, Array]:
    return _chunk_worklist(rays, boxes)


def _scene_exit_clamp(o: Array, d: Array, tmax_a: Array,
                      boxes: Array) -> Array:
    """Clamp each ray's tmax to its exit distance from the scene's union
    AABB: nothing can be hit beyond it, so the kernel's ordered-traversal
    break fires even for rays that ultimately MISS everything (sky rays
    otherwise hold best_t at +inf and defeat the break). The analogue of the
    reference's traversal naturally terminating at the root box's far slab
    (SBVH.h:417-442)."""
    valid = boxes[:, 6] > 0.5
    big = jnp.float32(T_FAR)
    lo = jnp.min(jnp.where(valid[:, None], boxes[:, 0:3], big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], boxes[:, 3:6], -big), axis=0)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                          jnp.where(d >= 0, 1e-20, -1e-20), d)
    t0 = (lo[None, :] - o) * inv
    t1 = (hi[None, :] - o) * inv
    tf = jnp.min(jnp.maximum(t0, t1), axis=1)
    exit_t = jnp.maximum(tf, 0.0) * 1.0001 + 1e-4
    return jnp.minimum(tmax_a, exit_t)


def worklist_stats(pt: "PallasTris", o: Array, d: Array,
                   active: Array | None = None,
                   rb: int = RB) -> dict:
    """Traversal-cost metrics for a wavefront: per-block culled-worklist
    sizes (the number of chunk DMAs + MXU passes each ray block will pay).
    Host-side profiling helper — NOT part of the render path."""
    import numpy as np

    r = o.shape[0]
    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, active)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    rays, _ = _pack_rays(o, d, tmin_a, tmax_a, rb)
    _, cnt, _ = _build_worklist(rays, pt.boxes)
    c = np.asarray(cnt)
    return {
        "n_blocks": int(c.size),
        "n_chunks": pt.n_chunks,
        "mean_chunks_per_block": float(c.mean()),
        "max_chunks_per_block": int(c.max()),
        "empty_blocks": int((c == 0).sum()),
        "pairs_per_ray": float(c.mean()) * pt.chunk,
    }


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _contract(rays16, tris16, chunk: int):
    """(RB, 5C) = rays16^T @ tris — side terms, n·d, and num in one MXU op."""
    acc = jax.lax.dot_general(
        rays16, tris16, (((0,), (0,)), ((), ())),
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


def _block_box_mask(rays16, boxes_ref, c, upper, enable=None):
    """(rb,) bool: which (enabled) rays in the block can hit entry c's AABB
    closer than their per-ray `upper` bound. Box bounds come from prefetched
    SMEM scalars (flattened 1-D: 2-D SMEM operands pad the minor dim to a
    full 128 lanes, 16x the footprint); ~30 VPU ops on (rb,) vectors vs
    ~10^5 for the chunk pipeline."""
    d0, d1, d2 = rays16[0, :], rays16[1, :], rays16[2, :]
    o = (rays16[6, :], rays16[7, :], rays16[8, :])
    tmin = rays16[10, :]
    tn = jnp.full_like(tmin, -T_FAR)
    tf = jnp.full_like(tmin, T_FAR)
    cb = c * 8
    for axis, dd in enumerate((d0, d1, d2)):
        inv = 1.0 / jnp.where(jnp.abs(dd) < 1e-20,
                              jnp.where(dd >= 0, 1e-20, -1e-20), dd)
        t0 = (boxes_ref[cb + axis] - o[axis]) * inv
        t1 = (boxes_ref[cb + 3 + axis] - o[axis]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    ok = (tn <= tf) & (tf >= tmin) & (tn <= upper)
    if enable is not None:
        ok = ok & enable
    return ok


def _nbuf_for(n_entries: int) -> int:
    """Chunk-DMA pipeline depth: 4-deep keeps enough fetches in flight for
    long worklists, but each pipeline slot costs an init scan, which is
    pure overhead when worklists are a handful of entries."""
    return 2 if n_entries <= 64 else NBUF


def _scan_w_for(n_entries: int) -> int:
    """Scan batch width: wide batches amortize the vector->scalar sync for
    long worklists but waste (clamped, duplicate) box tests when lists are
    a handful of entries — the parity scene measured ~8% slower at W=8."""
    return 8 if n_entries > 64 else 2


def _scan_next(rays16, boxes_ref, wl_at, wtn_at, n, k0, upper, scan_w,
               enable=None):
    """First worklist index j >= k0 whose entry box ANY (enabled) ray can
    hit below its per-ray `upper` bound; n when the near-sorted suffix
    starts beyond every ray's bound or the list is exhausted.

    The serial one-entry-per-step scan cost ~2 vector->scalar syncs per
    scanned entry (the jnp.any readback + the while_loop cond), which set
    a ~0.8 us/entry floor on the whole traversal. Here `scan_w` entries are
    box-tested per step as independent (rb,) vector ops whose results
    collapse through ONE packed bitmask readback; the suffix-break and
    first-hit selection then run on cheap SMEM scalars."""
    if enable is not None:
        ub = jnp.max(jnp.where(enable, upper, -T_FAR))
    else:
        ub = jnp.max(upper)

    def clampi(j):
        return jnp.maximum(jnp.minimum(j, n - 1), 0)

    def cond(st):
        return st[1] == jnp.int32(-2)

    def step(st):
        j, _ = st
        masks = []
        for u in range(scan_w):
            mv = _block_box_mask(rays16, boxes_ref, wl_at(clampi(j + u)),
                                 upper, enable=enable)
            # f32 before stacking: Mosaic cannot concatenate i1 vregs.
            masks.append(mv.astype(jnp.float32))
        ok8 = jnp.stack(masks, axis=0)                     # (W, rb)
        hit8 = jnp.max(ok8, axis=1, keepdims=True) > 0.0   # (W, 1)
        w_pow = jax.lax.broadcasted_iota(jnp.int32, (scan_w, 1), 0)
        m = jnp.sum(jnp.where(hit8, jnp.int32(1) << w_pow, 0))  # ONE sync
        # Suffix break: wtn is ascending, so the first out-of-range or
        # beyond-every-ray entry stops the scan; passes after it are void.
        stop = jnp.int32(scan_w)
        for u in reversed(range(scan_w)):
            cut = jnp.logical_or(j + u >= n, wtn_at(clampi(j + u)) > ub)
            stop = jnp.where(cut, jnp.int32(u), stop)
        m_valid = m & ((jnp.int32(1) << stop) - 1)
        off = jnp.int32(scan_w)
        for u in reversed(range(scan_w)):
            off = jnp.where((m_valid >> jnp.int32(u)) & 1 == 1,
                            jnp.int32(u), off)
        res = jnp.where(
            m_valid > 0, j + off,
            jnp.where(stop < jnp.int32(scan_w), n, jnp.int32(-2)))
        return (j + jnp.int32(scan_w), res)

    start = jnp.maximum(jnp.minimum(k0, n), 0)
    _, res = jax.lax.while_loop(cond, step, (start, jnp.int32(-2)))
    return res


def _xform_rays(rays16, itrs_ref, i, rbuf, rb):
    """Write the ray block transformed into instance i's LOCAL space into
    rbuf (rows 0:3 dir, 3:6 moment, 6:9 origin). Per-lane TRS interpolation
    at each lane's shutter fraction (rays16 row 12); the direction is left
    UNNORMALIZED so the intersection parameter t stays the world parameter
    (Transform.h:89-143 / SurfaceObject.cpp:320-336 semantics)."""
    f = rays16[12, :]
    ib = i * 24
    theta = itrs_ref[ib + 20]
    sin_t = itrs_ref[ib + 21]
    near = sin_t < 1e-4
    inv_sin = 1.0 / jnp.where(near, 1.0, sin_t)
    w0 = jnp.where(near, 1.0 - f, jnp.sin((1.0 - f) * theta) * inv_sin)
    w1 = jnp.where(near, f, jnp.sin(f * theta) * inv_sin)
    qx = w0 * itrs_ref[ib + 3] + w1 * itrs_ref[ib + 13]
    qy = w0 * itrs_ref[ib + 4] + w1 * itrs_ref[ib + 14]
    qz = w0 * itrs_ref[ib + 5] + w1 * itrs_ref[ib + 15]
    qw = w0 * itrs_ref[ib + 6] + w1 * itrs_ref[ib + 16]
    qn = jax.lax.rsqrt(jnp.maximum(qx * qx + qy * qy + qz * qz + qw * qw,
                                   1e-20))
    qx = qx * qn
    qy = qy * qn
    qz = qz * qn
    qw = qw * qn
    one_f = 1.0 - f
    tx = one_f * itrs_ref[ib + 0] + f * itrs_ref[ib + 10]
    ty = one_f * itrs_ref[ib + 1] + f * itrs_ref[ib + 11]
    tz = one_f * itrs_ref[ib + 2] + f * itrs_ref[ib + 12]
    sx = one_f * itrs_ref[ib + 7] + f * itrs_ref[ib + 17]
    sy = one_f * itrs_ref[ib + 8] + f * itrs_ref[ib + 18]
    sz = one_f * itrs_ref[ib + 9] + f * itrs_ref[ib + 19]
    inv_sx = 1.0 / sx
    inv_sy = 1.0 / sy
    inv_sz = 1.0 / sz

    def invrot(vx, vy, vz):
        # R^-1 v = v + 2(-qw (u x v) + u x (u x v)), u = (qx, qy, qz)
        cx = qy * vz - qz * vy
        cy = qz * vx - qx * vz
        cz = qx * vy - qy * vx
        dx_ = qy * cz - qz * cy
        dy_ = qz * cx - qx * cz
        dz_ = qx * cy - qy * cx
        return (vx + 2.0 * (-qw * cx + dx_),
                vy + 2.0 * (-qw * cy + dy_),
                vz + 2.0 * (-qw * cz + dz_))

    olx, oly, olz = invrot(rays16[6, :] - tx, rays16[7, :] - ty,
                           rays16[8, :] - tz)
    olx = olx * inv_sx
    oly = oly * inv_sy
    olz = olz * inv_sz
    dlx, dly, dlz = invrot(rays16[0, :], rays16[1, :], rays16[2, :])
    dlx = dlx * inv_sx
    dly = dly * inv_sy
    dlz = dlz * inv_sz
    rbuf[0, :] = dlx
    rbuf[1, :] = dly
    rbuf[2, :] = dlz
    rbuf[3, :] = oly * dlz - olz * dly
    rbuf[4, :] = olz * dlx - olx * dlz
    rbuf[5, :] = olx * dly - oly * dlx
    rbuf[6, :] = olx
    rbuf[7, :] = oly
    rbuf[8, :] = olz
    rbuf[9, :] = jnp.ones((rb,), jnp.float32)
    # Rows 10-15 multiply all-zero tri-table rows, but uninitialized VMEM
    # can hold NaN and 0 * NaN poisons the contraction — zero them.
    rbuf[10:16, :] = jnp.zeros((6, rb), jnp.float32)


def _traverse_closest(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                      einst_ref, itrs_ref, rays_ref, tris_hbm, t_ref,
                      idx_ref, inst_ref, buf, rbuf, sem, chunk, rb,
                      scan_w, nbuf):
    rays16 = rays_ref[0]          # (16, RB)
    tmin = rays16[10, :]
    tmax = rays16[11, :]
    t_ref[0, 0, :] = tmax
    idx_ref[0, 0, :] = jnp.full((rb,), -1, jnp.int32)
    inst_ref[0, 0, :] = jnp.full((rb,), -1, jnp.int32)
    n = cnt_ref[i]

    def dma(slot, k):
        c = echunk_ref[wl_at(k)]
        return pltpu.make_async_copy(tris_hbm.at[c], buf.at[slot],
                                     sem.at[slot])

    # Scan-ahead traversal: per-entry block box tests (VPU tests against
    # prefetched SMEM box scalars, using the CURRENT per-ray best t) run
    # BEFORE the chunk DMA, _SCAN_W entries per scalar sync — the
    # wavefront analogue of the reference's ordered stack descent pruning
    # subtrees by `isect->t` (SBVH.h:417-442). The worklist is near-to-far
    # sorted, so the scan also stops outright once the next entry's near
    # plane lies beyond every ray's current best (suffix break; tmax is
    # pre-clamped to the scene-box exit so miss rays cannot pin the bound
    # at +inf).
    def next_pass(k0):
        return _scan_next(rays16, boxes_ref, wl_at, wtn_at, n, k0,
                          t_ref[0, 0, :], scan_w)

    j0 = next_pass(0)

    @pl.when(j0 < n)
    def _traverse():
        # Fill the NBUF-deep prefetch queue: entry q[k] rides slot k.
        # Compute per chunk (~0.7 us epilogue at chunk 128) sits well
        # below HBM DMA latency (~2 us), so the old 2-buffer pipeline was
        # latency-bound at ~2.6 us per visited entry; keeping NBUF - 1
        # fetches in flight hides it. Queue-tail scans use the then-
        # current best t — staler than 1-deep prefetching, which only
        # means an occasional entry is fetched that tighter bounds would
        # have pruned (correctness is per-ray t tests at process time).
        dma(0, j0).start()
        q = [j0]
        for k in range(1, nbuf):
            jk = next_pass(q[-1] + 1)

            @pl.when(jk < n)
            def _pk(jk=jk, k=k):
                dma(k, jk).start()
            q.append(jk)

        def cond(carry):
            return carry[1] < n

        def body(carry):
            it = carry[0]
            q0 = carry[1]
            qrest = carry[2:]
            slot = jax.lax.rem(it, nbuf)
            dma(slot, q0).wait()
            e = wl_at(q0)
            inst = einst_ref[e]

            @pl.when(inst >= 0)
            def _xform():
                _xform_rays(rays16, itrs_ref, jnp.maximum(inst, 0),
                            rbuf, rb)

            tris16 = buf[pl.ds(slot, 1)][0]
            # Scalar-predicated select instead of copying rays16 into
            # rbuf for static entries (a 16xRB copy per chunk): where()
            # SELECTS, so stale/NaN scratch on the static side is inert.
            rays_in = jnp.where(inst >= 0, rbuf[:, :], rays16)
            through, den, num = _contract(rays_in, tris16, chunk)
            denom_ok = jnp.abs(den) > 1e-12
            t = num / jnp.where(denom_ok, den, 1.0)

            best_col = t_ref[0, 0, :][:, None]
            hit = (
                through
                & denom_ok
                & (t >= tmin[:, None])
                & (t < best_col)
            )
            t_hit = jnp.where(hit, t, jnp.inf)
            t_min = jnp.min(t_hit, axis=1)       # (RB,)
            a_min = jnp.argmin(t_hit, axis=1).astype(jnp.int32)
            closer = t_min < t_ref[0, 0, :]
            c = echunk_ref[e]
            t_ref[0, 0, :] = jnp.where(closer, t_min, t_ref[0, 0, :])
            idx_ref[0, 0, :] = jnp.where(
                closer, c * chunk + a_min, idx_ref[0, 0, :]
            )
            inst_ref[0, 0, :] = jnp.where(closer, inst,
                                          inst_ref[0, 0, :])

            # New queue tail: first passing entry after the current tail,
            # scanned with the just-updated best t. Freed slot = the one
            # just consumed.
            qn = next_pass(qrest[-1] + 1)

            @pl.when(qn < n)
            def _ptail():
                dma(slot, qn).start()
            return (it + 1,) + qrest + (qn,)

        jax.lax.while_loop(cond, body, (0,) + tuple(q))


def _kernel(cnt_ref, boxes_ref, echunk_ref, einst_ref, itrs_ref,
            rays_ref, wl_hbm, wtn_hbm, tris_hbm, t_ref, idx_ref, inst_ref,
            buf, rbuf, wl_ref, wtn_ref, sem, wl_sem, wtn_sem, *, chunk: int,
            rb: int, ncap: int, scan_w: int, nbuf: int):
    i = pl.program_id(0)
    # The (NB, NE) worklist lives in HBM (it exceeds SMEM at instanced
    # entry counts); each block DMAs its row into SMEM scratch.
    wl_cp = pltpu.make_async_copy(wl_hbm.at[i], wl_ref, wl_sem)
    wtn_cp = pltpu.make_async_copy(wtn_hbm.at[i], wtn_ref, wtn_sem)
    wl_cp.start()
    wtn_cp.start()
    wl_cp.wait()
    wtn_cp.wait()

    def wl_at(k):
        return wl_ref[k // 128, jax.lax.rem(k, 128)]

    def wtn_at(k):
        return wtn_ref[k // 128, jax.lax.rem(k, 128)]

    _traverse_closest(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                      einst_ref, itrs_ref, rays_ref, tris_hbm, t_ref,
                      idx_ref, inst_ref, buf, rbuf, sem, chunk, rb, scan_w,
                      nbuf)


def _kernel_smallwl(wl_ref, wtn_ref, cnt_ref, boxes_ref, echunk_ref,
                    einst_ref, itrs_ref, rays_ref, tris_hbm, t_ref, idx_ref,
                    inst_ref, buf, rbuf, sem, *, chunk: int, rb: int,
                    ncap: int, scan_w: int, nbuf: int):
    """Small-table variant: the whole (NB * NE) worklist rides the scalar
    prefetch into SMEM — no per-block DMA stall (the hot path for typical
    static scenes, where NE is tens of entries)."""
    i = pl.program_id(0)
    base = i * ncap

    def wl_at(k):
        return wl_ref[base + k]

    def wtn_at(k):
        return wtn_ref[base + k]

    _traverse_closest(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                      einst_ref, itrs_ref, rays_ref, tris_hbm, t_ref,
                      idx_ref, inst_ref, buf, rbuf, sem, chunk, rb, scan_w,
                      nbuf)


def _traverse_any(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                  einst_ref, itrs_ref, rays_ref, tris_hbm, hit_ref, buf,
                  rbuf, sem, chunk, rb, scan_w, nbuf):
    """Any-hit traversal: no argmin, no division. A triangle occludes iff
    t = num/den lies in [tmin, tmax], tested as sign conditions on
    (num - tmin*den)*(num - tmax*den) — fmas instead of a divide. The loop
    breaks as soon as every live ray is occluded, or the next (sorted)
    entry's near plane lies beyond every open ray's tmax."""
    rays16 = rays_ref[0]
    tmin = rays16[10, :]
    tmax = rays16[11, :]
    live = tmax >= tmin                        # lanes with a real query
    hit_ref[0, 0, :] = jnp.zeros((rb,), jnp.int32)
    n = cnt_ref[i]

    def dma(slot, k):
        c = echunk_ref[wl_at(k)]
        return pltpu.make_async_copy(tris_hbm.at[c], buf.at[slot],
                                     sem.at[slot])

    # Scan-ahead: box-test entries (against OPEN rays only) before paying
    # their DMA, _SCAN_W per scalar sync; stop when all live rays are
    # occluded or the sorted worklist's next near plane is beyond every
    # open ray's tmax.
    def next_pass(k0):
        open_ray = live & (hit_ref[0, 0, :] == 0)
        return _scan_next(rays16, boxes_ref, wl_at, wtn_at, n, k0,
                          tmax, scan_w, enable=open_ray)

    j0 = next_pass(0)

    @pl.when(j0 < n)
    def _traverse():
        # NBUF-deep DMA pipeline; see _traverse_closest for rationale.
        dma(0, j0).start()
        q = [j0]
        for k in range(1, nbuf):
            jk = next_pass(q[-1] + 1)

            @pl.when(jk < n)
            def _pk(jk=jk, k=k):
                dma(k, jk).start()
            q.append(jk)

        def cond(carry):
            return carry[1] < n

        def body(carry):
            it = carry[0]
            q0 = carry[1]
            qrest = carry[2:]
            slot = jax.lax.rem(it, nbuf)
            dma(slot, q0).wait()
            e = wl_at(q0)
            inst = einst_ref[e]

            @pl.when(inst >= 0)
            def _xform():
                _xform_rays(rays16, itrs_ref, jnp.maximum(inst, 0),
                            rbuf, rb)

            tris16 = buf[pl.ds(slot, 1)][0]
            rays_in = jnp.where(inst >= 0, rbuf[:, :], rays16)
            through, den, num = _contract(rays_in, tris16, chunk)
            lo = num - tmin[:, None] * den       # den * (t - tmin)
            hi = num - tmax[:, None] * den
            in_range = (lo * hi <= 0) & (jnp.abs(den) > 1e-12)
            # The live guard protects against the multiply-form test
            # degenerating on inactive lanes' inverted [T_FAR, -T_FAR]
            # range. Formed 2-D from f32 (Mosaic can't insert a minor
            # dim on an i1 vector).
            occluded = through & in_range & (
                tmax[:, None] >= tmin[:, None]
            )
            any_hit = jnp.any(occluded, axis=1).astype(jnp.int32)
            hit_ref[0, 0, :] = hit_ref[0, 0, :] | any_hit

            qn = next_pass(qrest[-1] + 1)

            @pl.when(qn < n)
            def _ptail():
                dma(slot, qn).start()
            return (it + 1,) + qrest + (qn,)

        jax.lax.while_loop(cond, body, (0,) + tuple(q))


def _kernel_any(cnt_ref, boxes_ref, echunk_ref, einst_ref, itrs_ref,
                rays_ref, wl_hbm, wtn_hbm, tris_hbm, hit_ref, buf, rbuf,
                wl_ref, wtn_ref, sem, wl_sem, wtn_sem, *, chunk: int,
                rb: int, ncap: int, scan_w: int, nbuf: int):
    i = pl.program_id(0)
    wl_cp = pltpu.make_async_copy(wl_hbm.at[i], wl_ref, wl_sem)
    wtn_cp = pltpu.make_async_copy(wtn_hbm.at[i], wtn_ref, wtn_sem)
    wl_cp.start()
    wtn_cp.start()
    wl_cp.wait()
    wtn_cp.wait()

    def wl_at(k):
        return wl_ref[k // 128, jax.lax.rem(k, 128)]

    def wtn_at(k):
        return wtn_ref[k // 128, jax.lax.rem(k, 128)]

    _traverse_any(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                  einst_ref, itrs_ref, rays_ref, tris_hbm, hit_ref, buf,
                  rbuf, sem, chunk, rb, scan_w, nbuf)


def _kernel_any_smallwl(wl_ref, wtn_ref, cnt_ref, boxes_ref, echunk_ref,
                        einst_ref, itrs_ref, rays_ref, tris_hbm, hit_ref,
                        buf, rbuf, sem, *, chunk: int, rb: int, ncap: int,
                        scan_w: int, nbuf: int):
    i = pl.program_id(0)
    base = i * ncap

    def wl_at(k):
        return wl_ref[base + k]

    def wtn_at(k):
        return wtn_ref[base + k]

    _traverse_any(i, wl_at, wtn_at, cnt_ref, boxes_ref, echunk_ref,
                  einst_ref, itrs_ref, rays_ref, tris_hbm, hit_ref, buf,
                  rbuf, sem, chunk, rb, scan_w, nbuf)


def _pad_wl(wl, wtn, nb, n_entries):
    """Pad worklist rows to a full (8, 128) tile multiple: the per-block
    slice wl[i] must be tile-aligned in BOTH trailing dims or the DMA reads
    garbage (observed as TPU worker faults at 3+ sublane rows). Padding
    repeats the last valid entry and is never visited (cnt gates the
    loop)."""
    ne_pad = -(-n_entries // 1024) * 1024
    wl2 = wl.reshape(nb, n_entries)
    wtn2 = wtn.reshape(nb, n_entries)
    if ne_pad != n_entries:
        wl2 = jnp.concatenate(
            [wl2, jnp.broadcast_to(wl2[:, -1:], (nb, ne_pad - n_entries))],
            axis=1,
        )
        wtn2 = jnp.concatenate(
            [wtn2, jnp.broadcast_to(wtn2[:, -1:], (nb, ne_pad - n_entries))],
            axis=1,
        )
    return (wl2.reshape(nb, ne_pad // 128, 128),
            wtn2.reshape(nb, ne_pad // 128, 128), ne_pad)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_entries", "rb", "interpret"))
def _run_kernel(wl, wtn, cnt, boxes, echunk, einst, itrs, rays, tris, chunk,
                n_entries, rb=RB, interpret=False):
    nb = rays.shape[0]
    out_shape = [
        jax.ShapeDtypeStruct((nb, 1, rb), jnp.float32),
        jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32),
        jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, rb), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, rb), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((1, 1, rb), lambda i, *_: (i, 0, 0)),
    ]
    if nb * n_entries <= SMALL_WL_INTS:
        # Hot path for typical static scenes: the whole worklist rides the
        # scalar prefetch into SMEM, no per-block DMA stall.
        kernel = functools.partial(_kernel_smallwl, chunk=chunk, rb=rb,
                                   ncap=n_entries,
                                   scan_w=_scan_w_for(n_entries),
                                   nbuf=_nbuf_for(n_entries))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, ROWS, rb), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((_nbuf_for(n_entries), ROWS, _pad128(5 * chunk)),
                           jnp.float32),
                pltpu.VMEM((ROWS, rb), jnp.float32),
                pltpu.SemaphoreType.DMA((_nbuf_for(n_entries),)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(wl, wtn, cnt, boxes.reshape(-1), echunk, einst, itrs.reshape(-1),
          rays, tris)
    wl2, wtn2, ne_pad = _pad_wl(wl, wtn, nb, n_entries)
    kernel = functools.partial(_kernel, chunk=chunk, rb=rb, ncap=ne_pad,
                               scan_w=_scan_w_for(n_entries),
                               nbuf=_nbuf_for(n_entries))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, ROWS, rb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((_nbuf_for(n_entries), ROWS, _pad128(5 * chunk)),
                           jnp.float32),
            pltpu.VMEM((ROWS, rb), jnp.float32),
            pltpu.SMEM((ne_pad // 128, 128), jnp.int32),
            pltpu.SMEM((ne_pad // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_nbuf_for(n_entries),)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(cnt, boxes.reshape(-1), echunk, einst,
      itrs.reshape(-1), rays, wl2, wtn2, tris)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "n_entries", "rb", "interpret"))
def _run_kernel_any(wl, wtn, cnt, boxes, echunk, einst, itrs, rays, tris,
                    chunk, n_entries, rb=RB, interpret=False):
    nb = rays.shape[0]
    if nb * n_entries <= SMALL_WL_INTS:
        kernel = functools.partial(_kernel_any_smallwl, chunk=chunk, rb=rb,
                                   ncap=n_entries,
                                   scan_w=_scan_w_for(n_entries),
                                   nbuf=_nbuf_for(n_entries))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, ROWS, rb), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[pl.BlockSpec((1, 1, rb), lambda i, *_: (i, 0, 0))],
            scratch_shapes=[
                pltpu.VMEM((_nbuf_for(n_entries), ROWS, _pad128(5 * chunk)),
                           jnp.float32),
                pltpu.VMEM((ROWS, rb), jnp.float32),
                pltpu.SemaphoreType.DMA((_nbuf_for(n_entries),)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32)],
            interpret=interpret,
        )(wl, wtn, cnt, boxes.reshape(-1), echunk, einst, itrs.reshape(-1),
          rays, tris)
    wl2, wtn2, ne_pad = _pad_wl(wl, wtn, nb, n_entries)
    kernel = functools.partial(_kernel_any, chunk=chunk, rb=rb, ncap=ne_pad,
                               scan_w=_scan_w_for(n_entries),
                               nbuf=_nbuf_for(n_entries))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, ROWS, rb), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, 1, rb), lambda i, *_: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((_nbuf_for(n_entries), ROWS, _pad128(5 * chunk)),
                           jnp.float32),
            pltpu.VMEM((ROWS, rb), jnp.float32),
            pltpu.SMEM((ne_pad // 128, 128), jnp.int32),
            pltpu.SMEM((ne_pad // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_nbuf_for(n_entries),)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb, 1, rb), jnp.int32)],
        interpret=interpret,
    )(cnt, boxes.reshape(-1), echunk, einst,
      itrs.reshape(-1), rays, wl2, wtn2, tris)


# ---------------------------------------------------------------------------
# Host-facing entry points
# ---------------------------------------------------------------------------

def _pack_rays(o, d, tmin_a, tmax_a, rb=RB, f=None):
    """(R, 3)x2 + (R,)x2 -> (NB, 16, rb) with the Plücker moment m = o x d
    precomputed once per ray (XLA fuses this into the surrounding graph).
    Row 12 carries the per-ray shutter fraction (instanced scenes)."""
    r = o.shape[0]
    nb = -(-r // rb)
    pad = nb * rb - r
    from ..core.math3d import cross as _cross3
    m = _cross3(o, d)
    ones = jnp.ones((r, 1), jnp.float32)
    f_col = (jnp.zeros((r, 1), jnp.float32) if f is None
             else jnp.broadcast_to(f, (r,))[:, None])
    zeros = jnp.zeros((r, ROWS - 13), jnp.float32)
    rays = jnp.concatenate(
        [d, m, o, ones, tmin_a[:, None], tmax_a[:, None], f_col, zeros],
        axis=1,
    )  # (R, 16)
    if pad:
        # Padding lanes are inert: degenerate [T_FAR, -T_FAR] range.
        filler = (
            jnp.zeros((pad, ROWS), jnp.float32)
            .at[:, 2].set(1.0)
            .at[:, 10].set(T_FAR)
            .at[:, 11].set(-T_FAR)
        )
        rays = jnp.concatenate([rays, filler], axis=0)
    return rays.reshape(nb, rb, ROWS).transpose(0, 2, 1), nb


def _ray_ranges(r, tmin, tmax, active):
    """Broadcast per-ray [tmin, tmax]; inactive lanes get a degenerate range
    so they opt out of culling, traversal, and the early-out."""
    tmin_a = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    tmax_a = jnp.minimum(tmax_a, T_FAR)
    if active is not None:
        tmin_a = jnp.where(active, tmin_a, T_FAR)
        tmax_a = jnp.where(active, tmax_a, -T_FAR)
    return tmin_a, tmax_a


def _prefetch_tables(pt: PallasTris):
    echunk = (pt.entry_chunk if pt.entry_chunk is not None
              else jnp.arange(pt.n_chunks, dtype=jnp.int32))
    einst = (pt.entry_inst if pt.entry_inst is not None
             else jnp.full((pt.n_chunks,), -1, jnp.int32))
    itrs = (pt.inst_trs if pt.inst_trs is not None
            else jnp.zeros((1, 24), jnp.float32))
    return echunk, einst, itrs


def _auto_rb(pt: PallasTris) -> int:
    """Rays per kernel block. The traversal pays a ~0.8 us/entry floor
    (TPU-swept, r5) that is flat for rb <= 128, so once worklists are long
    (many entries - instanced/large scenes) smaller blocks with tighter
    per-block unions win: rb=128 measured 14.6 ms vs 21.2 ms at rb=256 on
    the grass scene. Small tables keep rb=256 (fewer, fuller blocks)."""
    return 128 if pt.n_entries > 128 else RB


def anyhit_pallas(
    geom: Geometry,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    active: Array | None = None,
    interpret: bool = False,
    rb: int | None = None,
    f: Array | None = None,
) -> Array:
    """Occlusion query (bool per ray): True if anything lies in [tmin, tmax].
    The shadow-ray path of Scene::testVisibility — cheaper than closest-hit
    (no per-triangle divide, no argmin)."""
    r = o.shape[0]
    if rb is None:
        rb = _auto_rb(pt)
    tmin_a, tmax_a = _ray_ranges(r, tmin, tmax, active)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    rays, _ = _pack_rays(o, d, tmin_a, tmax_a, rb, f=f)
    wl, cnt, wtn = _build_worklist(rays, pt.boxes)
    echunk, einst, itrs = _prefetch_tables(pt)
    (hit,) = _run_kernel_any(
        wl, wtn, cnt, pt.boxes, echunk, einst, itrs, rays, pt.tris, pt.chunk,
        pt.n_entries, rb=rb, interpret=interpret,
    )
    return hit.reshape(-1)[:r] > 0


def intersect_pallas(
    geom: Geometry,
    pt: PallasTris,
    o: Array,
    d: Array,
    tmin: Array | float = RAY_EPSILON,
    tmax: Array | float = jnp.inf,
    active: Array | None = None,
    interpret: bool = False,
    rb: int | None = None,
    f: Array | None = None,
    instances=None,
) -> Hit:
    """Closest hit via the worklist kernel. o/d: (R, 3). With an instanced
    table (pt.instanced), pass the per-ray shutter fraction `f` and the
    scene's Instances rows so the winning lane's barycentrics are recovered
    against the LOCAL-space triangle."""
    r = o.shape[0]
    if rb is None:
        rb = _auto_rb(pt)
    tmin_a, tmax_a = _ray_ranges(r, tmin, tmax, active)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    rays, _ = _pack_rays(o, d, tmin_a, tmax_a, rb, f=f)
    wl, cnt, wtn = _build_worklist(rays, pt.boxes)
    echunk, einst, itrs = _prefetch_tables(pt)

    best_t, best_idx, best_inst = _run_kernel(
        wl, wtn, cnt, pt.boxes, echunk, einst, itrs, rays, pt.tris, pt.chunk,
        pt.n_entries, rb=rb, interpret=interpret,
    )
    best_t = best_t.reshape(-1)[:r]
    slot = best_idx.reshape(-1)[:r]
    inst = best_inst.reshape(-1)[:r]
    tri = jnp.where(slot >= 0, pt.remap[jnp.maximum(slot, 0)], -1)
    mask = (tri >= 0) & (best_t < T_FAR) & (best_t < tmax_a * (1.0 + 1e-6))

    tri_c = jnp.maximum(tri, 0)
    if geom.tri_table is not None:
        # Single packed-row gather (see intersect.TRI_TABLE_COLS) instead of
        # the 4-gather vertex indirection.
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
        # Instanced winners: recover barycentrics against the LOCAL-space
        # triangle with the ray transformed into instance space (t stays
        # the world parameter — unnormalized direction).
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
