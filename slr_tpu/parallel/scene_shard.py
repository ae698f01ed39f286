"""Primitive-range scene sharding over the device mesh (SURVEY §2.4 row 3).

For scenes whose kernel chunk tables exceed one chip's HBM, the tables are
sharded by CHUNK RANGE across the `tiles` mesh axis: every device holds
1/N of the Plücker chunk tables (the dominant memory — ~160 f32 per
triangle reference incl. SBVH duplication), rays are replicated, each
device intersects only its own range, and a lexicographic (t, rank)
min-reduction picks the global closest hit. The reference analogue is the
single SHARED SBVH all threads traverse (SurfaceObject.cpp:226-250) — on a
mesh, "shared" becomes "partitioned + reduced" so per-chip memory scales
down with the device count.

The packed per-triangle shading table stays replicated here (4x smaller
than the kernel tables); for truly enormous scenes it can be sharded the
same way with a second gather phase keyed by the winning shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..accel.intersect import Hit
from ..accel.pallas_intersect import PallasTris
from ..core.math3d import Array
from ..scene.types import FlatScene


def shard_chunk_tables(pt: PallasTris, n_shards: int) -> PallasTris:
    """Pad the chunk axis to a multiple of n_shards so every device gets an
    equal chunk range. Padding chunks are empty (nonempty flag 0) and their
    remap rows are -1."""
    nc = pt.n_chunks
    nc_pad = -(-nc // n_shards) * n_shards
    if nc_pad == nc:
        return pt
    pad = nc_pad - nc
    c = pt.chunk
    return PallasTris(
        tris=jnp.concatenate(
            [pt.tris, jnp.zeros((pad,) + pt.tris.shape[1:], jnp.float32)]),
        boxes=jnp.concatenate(
            [pt.boxes, jnp.zeros((pad, 8), jnp.float32)]),
        remap=jnp.concatenate(
            [pt.remap, jnp.full((pad * c,), -1, jnp.int32)]),
        entry_chunk=jnp.arange(nc_pad, dtype=jnp.int32),
        entry_inst=jnp.full((nc_pad,), -1, jnp.int32),
        inst_trs=pt.inst_trs,
    )


def intersect_scene_sharded(
    scene: FlatScene,
    mesh: Mesh,
    o: Array,
    d: Array,
) -> Hit:
    """Closest hit with chunk tables sharded over `mesh` ('tiles' axis).

    Per shard, entry ids are LOCAL (each device culls and traverses only
    its own chunk range); the winning (t, shard-rank) is min-reduced
    lexicographically so exact ties resolve to the lowest rank — matching
    the single-device traversal order closely enough for rendering (tie
    triangles are coplanar duplicates)."""
    n = mesh.devices.size
    pt = shard_chunk_tables(scene.pallas_tris, n)
    geom = scene.geometry
    nc_l = pt.n_chunks // n
    chunk = pt.chunk

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P("tiles"), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(tris_s, boxes_s, remap_s, o, d):
        local = PallasTris(
            tris=tris_s,
            boxes=boxes_s,
            remap=remap_s.reshape(-1),
            entry_chunk=jnp.arange(nc_l, dtype=jnp.int32),
            entry_inst=jnp.full((nc_l,), -1, jnp.int32),
            inst_trs=jnp.zeros((1, 24), jnp.float32),
        )
        from ..accel.pallas_intersect import intersect_pallas

        hit = intersect_pallas(
            geom, local, o, d,
            interpret=jax.default_backend() == "cpu",
        )
        rank = jax.lax.axis_index("tiles")
        t = jnp.where(hit.mask, hit.t, jnp.inf)
        t_min = jax.lax.pmin(t, "tiles")
        winner = t <= t_min
        win_rank = jax.lax.pmin(
            jnp.where(winner, rank, jnp.int32(1 << 30)), "tiles"
        )
        mine = winner & (rank == win_rank)

        def pick(x, neutral):
            return jax.lax.psum(
                jnp.where(mine, x, jnp.full_like(x, neutral)), "tiles"
            )

        mask = jax.lax.psum(
            (mine & hit.mask).astype(jnp.int32), "tiles") > 0
        return (
            jnp.where(mask, pick(jnp.where(mine, hit.t, 0.0), 0.0), jnp.inf),
            jnp.where(mask, pick(jnp.where(mine, hit.tri, 0), 0), -1),
            pick(jnp.where(mine, hit.b0, 0.0), 0.0),
            pick(jnp.where(mine, hit.b1, 0.0), 0.0),
            mask,
        )

    remap2 = pt.remap.reshape(pt.n_chunks, chunk)
    t, tri, b0, b1, mask = run(pt.tris, pt.boxes, remap2, o, d)
    return Hit(t=t, tri=tri, b0=b0, b1=b1, mask=mask)


def occluded_scene_sharded(
    scene: FlatScene,
    mesh: Mesh,
    o: Array,
    d: Array,
    tmin,
    tmax,
    active: Array | None = None,
) -> Array:
    """Occlusion query over the sharded chunk tables: each device runs the
    any-hit kernel on its own chunk range, results OR-reduce with one psum
    (Scene::testVisibility semantics against a partitioned aggregate)."""
    n = mesh.devices.size
    pt = shard_chunk_tables(scene.pallas_tris, n)
    geom = scene.geometry
    nc_l = pt.n_chunks // n

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P("tiles"), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(tris_s, boxes_s, remap_s, o, d, tmax_a, act):
        local = PallasTris(
            tris=tris_s,
            boxes=boxes_s,
            remap=remap_s.reshape(-1),
            entry_chunk=jnp.arange(nc_l, dtype=jnp.int32),
            entry_inst=jnp.full((nc_l,), -1, jnp.int32),
            inst_trs=jnp.zeros((1, 24), jnp.float32),
        )
        from ..accel.pallas_intersect import anyhit_pallas

        occ = anyhit_pallas(
            geom, local, o, d, tmin=tmin, tmax=tmax_a, active=act,
            interpret=jax.default_backend() == "cpu",
        )
        return jax.lax.psum(occ.astype(jnp.int32), "tiles") > 0

    r = o.shape[0]
    tmax_a = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    act = jnp.ones((r,), bool) if active is None else active
    remap2 = pt.remap.reshape(pt.n_chunks, pt.chunk)
    return run(pt.tris, pt.boxes, remap2, o, d, tmax_a, act)


def shard_tri_rows(tri_table: Array, n_shards: int):
    """Range-shard the packed per-triangle shading table (40 f32 per tri,
    accel/intersect.build_tri_table): shard k holds rows [k*per, (k+1)*per).
    Returns (rows (n_shards*per, C) padded, per)."""
    t = tri_table.shape[0]
    per = -(-t // n_shards)
    pad = n_shards * per - t
    if pad:
        tri_table = jnp.concatenate(
            [tri_table, jnp.zeros((pad, tri_table.shape[1]),
                                  tri_table.dtype)])
    return tri_table, per


def gather_tri_rows_sharded(mesh: Mesh, rows_padded: Array, per: int,
                            tri: Array) -> Array:
    """The 'second gather keyed by the winning shard': each device holds a
    contiguous tri-id range of the shading table and contributes rows for
    the hits that fall in its range; one psum assembles the full row set.
    tri: (R,) global ids (negative = miss, returns a zero row)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("tiles"), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(rows_local, tri):
        rank = jax.lax.axis_index("tiles")
        lo = rank * per
        local = tri - lo
        mine = (tri >= 0) & (local >= 0) & (local < per)
        rows = rows_local[jnp.clip(local, 0, per - 1)]
        rows = jnp.where(mine[:, None], rows, 0.0)
        return jax.lax.psum(rows, "tiles")

    return run(rows_padded, tri)


def render_pt_scene_sharded(
    scene: FlatScene,
    mesh: Mesh,
    width: int,
    height: int,
    spp: int,
    seed: int = 0,
    max_depth: int = 8,
):
    """End-to-end PT render for scenes whose tables exceed one device's
    budget (SURVEY §2.4 row 3): the Plücker chunk tables (the dominant
    memory, ~160 f32 per tri reference) are partitioned by chunk range and
    every closest-hit/any-hit cast runs `intersect_scene_sharded` /
    `occluded_scene_sharded`; per-hit SHADING rows come from the
    range-sharded tri table via `gather_tri_rows_sharded` (each device
    holds 1/N of both). Light-sampling rows (the emissive subset, typically
    tiny) and the material/texture SoA stay replicated. Static,
    non-alpha-cutout, non-normal-mapped scenes (the instanced/two-level mix
    keeps the replicated single-device path).

    Returns (H, W, S) linear mean film, matching render/pt.py's fixed-depth
    estimator bit-for-bit in sample statistics (same RNG keying)."""
    from ..core import rng as _rng
    from ..core.rng import Decision
    from ..render.pt import resolve_sp, trace_radiance_spectral
    from ..camera.perspective import sample_camera_rays
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES, NUM_STRATA, WL_HI, WL_LO, bin_to_strata,
        strata_to_rgb,
    )

    assert scene.instances is None, "scene-sharded path: static scenes only"
    assert not scene.has_alpha and not scene.has_normal_map
    n_pix = width * height
    rows_padded, per = shard_tri_rows(scene.geometry.tri_table,
                                      mesh.devices.size)

    def isect_fn(sc, o, d, tmin=None, tmax=None, f=None, active=None):
        from ..accel.intersect import RAY_EPSILON

        return intersect_scene_sharded(sc, mesh, o, d)

    def occl_fn(sc, o, d, tmin, tmax, f=None, active=None):
        return occluded_scene_sharded(sc, mesh, o, d, tmin, tmax,
                                      active=active)

    def resolve_fn(sc, hit, o, d, f=None):
        rows = gather_tri_rows_sharded(mesh, rows_padded, per, hit.tri)
        geom2 = sc.geometry.replace(tri_table=rows)
        hit2 = hit._replace(
            tri=jnp.where(hit.tri >= 0,
                          jnp.arange(hit.tri.shape[0], dtype=jnp.int32), -1))
        sc2 = sc.replace(geometry=geom2)
        return resolve_sp(sc2, hit2, o, d, f=f)

    s_film = (NUM_STRATA if scene.stex.spectral
              else scene.stex.value.shape[-1])
    film = jnp.zeros((n_pix, s_film), jnp.float32)
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32)
    py = (pixel_id // width).astype(jnp.float32)
    seed_u = jnp.uint32(seed)
    for i in range(spp):
        sample_id = jnp.full((n_pix,), i, jnp.uint32)
        jx = _rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_X)
        jy = _rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_Y)
        lx = _rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_U)
        ly = _rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_V)
        rays = sample_camera_rays(scene.camera, px + jx, py + jy,
                                  jnp.uint32(width), jnp.uint32(height),
                                  lx, ly)
        c, lambdas = trace_radiance_spectral(
            scene, rays.o, rays.d, pixel_id, sample_id, seed_u, max_depth,
            cast_fns=(isect_fn, occl_fn), resolve_fn=resolve_fn)
        w = rays.weight[..., None] * c
        if scene.stex.spectral:
            w = bin_to_strata(lambdas, w / (NUM_SPECTRAL_SAMPLES
                                            / (WL_HI - WL_LO)))
        film = film + w
    img = (film / spp).reshape(height, width, -1)
    if scene.stex.spectral:
        img = strata_to_rgb(img)
    return img
