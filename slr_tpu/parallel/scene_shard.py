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


def shard_image_atlas(images: Array, n_shards: int):
    """Pad the atlas image axis to a multiple of n_shards; shard k holds
    images [k*per, (k+1)*per). Returns (images padded, per)."""
    ni = images.shape[0]
    per = max(-(-ni // n_shards), 1)
    pad = n_shards * per - ni
    if pad:
        images = jnp.concatenate(
            [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)])
    return images, per


def fetch_texels_sharded(mesh: Mesh, images_padded: Array, per: int,
                         ni_total: int, image_hw: Array, image_id: Array,
                         u: Array, v: Array) -> Array:
    """The atlas analogue of `gather_tri_rows_sharded`: each device holds a
    contiguous image range and contributes the texels whose image falls in
    it; one psum assembles the RGBA rows. Signature matches
    textures._image_fetch minus `images` — installed as
    textures.IMAGE_FETCH_OVERRIDE so spectrum/float/normal/env/alpha
    texture evaluation all route through it unchanged."""
    from ..scene.textures import texel_coords

    shp = u.shape
    iid, py, px = texel_coords(image_hw, image_id, u, v, ni_total)
    iid = iid.reshape(-1)
    py = py.reshape(-1)
    px = px.reshape(-1)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("tiles"), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(img_local, iid, py, px):
        rank = jax.lax.axis_index("tiles")
        lo = rank * per
        local = iid - lo
        mine = (local >= 0) & (local < per)
        rows = img_local[jnp.clip(local, 0, per - 1), py, px]
        return jax.lax.psum(jnp.where(mine[:, None], rows, 0.0), "tiles")

    return run(images_padded, iid, py, px).reshape(shp + (4,))


def intersect_scene_sharded(
    scene: FlatScene,
    mesh: Mesh,
    o: Array,
    d: Array,
    tmin=None,
    tmax=None,
    active: Array | None = None,
) -> Hit:
    """Closest hit with chunk tables sharded over `mesh` ('tiles' axis).

    Per shard, entry ids are LOCAL (each device culls and traverses only
    its own chunk range); the winning (t, shard-rank) is min-reduced
    lexicographically so exact ties resolve to the lowest rank — matching
    the single-device traversal order closely enough for rendering (tie
    triangles are coplanar duplicates)."""
    from ..accel.intersect import RAY_EPSILON

    n = mesh.devices.size
    pt = shard_chunk_tables(scene.pallas_tris, n)
    geom = scene.geometry
    nc_l = pt.n_chunks // n
    chunk = pt.chunk
    r = o.shape[0]
    tmin_b = jnp.broadcast_to(
        jnp.asarray(RAY_EPSILON if tmin is None else tmin, jnp.float32), (r,))
    tmax_b = jnp.broadcast_to(
        jnp.asarray(jnp.inf if tmax is None else tmax, jnp.float32), (r,))
    act = jnp.ones((r,), bool) if active is None else active

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P("tiles"), P(), P(), P(), P(),
                  P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(tris_s, boxes_s, remap_s, o, d, tmin_b, tmax_b, act):
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
            geom, local, o, d, tmin=tmin_b, tmax=tmax_b, active=act,
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
    t, tri, b0, b1, mask = run(pt.tris, pt.boxes, remap2, o, d,
                               tmin_b, tmax_b, act)
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
    sample_offset: int = 0,
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
    from functools import partial as _partial

    from ..accel.intersect import RAY_EPSILON, fetch_tri_row
    from ..core import rng as _rng
    from ..core.rng import Decision
    from ..render.pt import resolve_sp, trace_radiance_spectral
    from ..camera.perspective import sample_camera_rays
    from ..scene import textures as _textures
    from ..scene.textures import eval_float_texture
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES, NUM_STRATA, WL_HI, WL_LO, bin_to_strata,
        strata_to_rgb,
    )

    if scene.instances is not None:
        # Two-level/animated scenes keep the replicated path (per-instance
        # BLAS entries don't partition by chunk range yet).
        from .mesh import render_wavefront_sharded

        return render_wavefront_sharded(scene, mesh, width, height, spp,
                                        seed=seed, max_depth=max_depth)
    n_pix = width * height
    n_dev = mesh.devices.size
    rows_padded, per = shard_tri_rows(scene.geometry.tri_table, n_dev)
    ni_total = scene.stex.images.shape[0]
    images_padded, per_img = shard_image_atlas(scene.stex.images, n_dev)
    # The traced scene carries an EMPTY atlas: texels arrive only through
    # the sharded gather, so per-device atlas residency is 1/N.
    scene = scene.replace(stex=scene.stex.replace(
        images=jnp.zeros((0,) + scene.stex.images.shape[1:],
                         scene.stex.images.dtype)))

    def raw_isect(sc, o, d, tmin, tmax, active):
        return intersect_scene_sharded(sc, mesh, o, d, tmin=tmin, tmax=tmax,
                                       active=active)

    def isect_fn(sc, o, d, tmin=None, tmax=None, f=None, active=None):
        tmin = RAY_EPSILON if tmin is None else tmin
        tmax = jnp.inf if tmax is None else tmax
        hit = raw_isect(sc, o, d, tmin, tmax, active)
        if not sc.has_alpha:
            return hit
        # Alpha-cutout retry loop (scene_intersect_alpha semantics,
        # TriangleMesh.cpp:163-168) over the SHARDED tables: the alpha id
        # and UVs come from the range-sharded tri rows, the alpha texel
        # from the sharded atlas (IMAGE_FETCH_OVERRIDE is active here).
        def alpha_zero(h):
            rows = gather_tri_rows_sharded(mesh, rows_padded, per, h.tri)
            row = fetch_tri_row(rows,
                                jnp.arange(h.tri.shape[0], dtype=jnp.int32))
            b2 = (1.0 - h.b0 - h.b1)[..., None]
            uv = (h.b0[..., None] * row.uv0 + h.b1[..., None] * row.uv1
                  + b2 * row.uv2)
            a = eval_float_texture(sc.ftex, row.alpha_id, uv,
                                   sc.stex.images, sc.stex.image_hw)
            return h.mask & (row.alpha_id >= 0) & (a == 0.0)

        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32),
                                  hit.t.shape)

        def cond(carry):
            h, _ = carry
            return jnp.any(alpha_zero(h))

        def body(carry):
            h, tmin_b = carry
            cut = alpha_zero(h)
            tmin_b = jnp.where(cut, h.t + RAY_EPSILON, tmin_b)
            rehit = raw_isect(sc, o, d, tmin_b, tmax, cut)
            h = Hit(
                t=jnp.where(cut, rehit.t, h.t),
                tri=jnp.where(cut, rehit.tri, h.tri),
                b0=jnp.where(cut, rehit.b0, h.b0),
                b1=jnp.where(cut, rehit.b1, h.b1),
                mask=jnp.where(cut, rehit.mask, h.mask),
            )
            return h, tmin_b

        hit, _ = jax.lax.while_loop(cond, body, (hit, tmin_b))
        return hit

    def occl_fn(sc, o, d, tmin, tmax, f=None, active=None):
        if sc.has_alpha:
            # A fully cut-out surface must not cast a shadow
            # (scene_occluded semantics): reuse the retrying closest-hit.
            return isect_fn(sc, o, d, tmin, tmax, active=active).mask
        return occluded_scene_sharded(sc, mesh, o, d, tmin, tmax,
                                      active=active)

    def resolve_fn(sc, hit, o, d, f=None):
        rows = gather_tri_rows_sharded(mesh, rows_padded, per, hit.tri)
        geom2 = sc.geometry.replace(tri_table=rows)
        if sc.has_normal_map:
            # resolve_sp indexes tri_ntex by hit.tri; pre-gather by the
            # ORIGINAL ids so the arange remap below stays consistent
            # (tri_ntex is a 4-byte/tri replicated table — cheap).
            geom2 = geom2.replace(
                tri_ntex=sc.geometry.tri_ntex[jnp.maximum(hit.tri, 0)])
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
    prev_fetch = _textures.IMAGE_FETCH_OVERRIDE
    _textures.IMAGE_FETCH_OVERRIDE = (
        _partial(fetch_texels_sharded, mesh, images_padded, per_img,
                 max(ni_total, 1))
        if ni_total else None)
    try:
        for i in range(spp):
            sample_id = jnp.full((n_pix,), sample_offset + i, jnp.uint32)
            jx = _rng.uniform(seed_u, pixel_id, sample_id, 0,
                              Decision.PIXEL_X)
            jy = _rng.uniform(seed_u, pixel_id, sample_id, 0,
                              Decision.PIXEL_Y)
            lx = _rng.uniform(seed_u, pixel_id, sample_id, 0,
                              Decision.LENS_U)
            ly = _rng.uniform(seed_u, pixel_id, sample_id, 0,
                              Decision.LENS_V)
            rays = sample_camera_rays(scene.camera, px + jx, py + jy,
                                      jnp.uint32(width), jnp.uint32(height),
                                      lx, ly)
            c, lambdas = trace_radiance_spectral(
                scene, rays.o, rays.d, pixel_id, sample_id, seed_u,
                max_depth, cast_fns=(isect_fn, occl_fn),
                resolve_fn=resolve_fn)
            w = rays.weight[..., None] * c
            if scene.stex.spectral:
                w = bin_to_strata(lambdas, w / (NUM_SPECTRAL_SAMPLES
                                                / (WL_HI - WL_LO)))
            film = film + w
    finally:
        _textures.IMAGE_FETCH_OVERRIDE = prev_fetch
    img = (film / spp).reshape(height, width, -1)
    if scene.stex.spectral:
        img = strata_to_rgb(img)
    return img
