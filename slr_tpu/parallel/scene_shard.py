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
