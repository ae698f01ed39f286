"""Multi-chip rendering over a jax.sharding Mesh.

The reference's only parallelism is shared-memory tile jobs on a thread pool
(PathTracingRenderer.cpp:27-81) plus per-thread separated splat buffers for
BPT's t=1 contributions, summed at develop time (ImageSensor.h:35,
ImageSensor.cpp:140-158). The TPU equivalents (SURVEY.md §2.4):

* **PT** — pixels sharded over the mesh with `shard_map`; every shard traces
  its own rays against the replicated scene pytree. Spectral scenes bin each
  shard's hero-wavelength samples into film strata in-shard. The
  counter-based RNG keyed by absolute pixel id makes results bitwise
  independent of the shard count.
* **BPT** — every shard owns a *full-frame* separated splat film (t=1 light
  tracing hits arbitrary pixels) and the shard films are reduced with one
  `jax.lax.psum` over ICI, the direct analogue of the reference's
  per-thread sensor buffers.
* **Multi-host** — `init_distributed()` wires `jax.distributed.initialize`
  so `jax.devices()` spans hosts; the same single "tiles" axis then lays
  pixel shards across (host, chip) with XLA routing the psum/all_gather over
  ICI within a slice and DCN across.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..camera.perspective import (sample_camera_rays,
                                  sample_camera_rays_equirect)
from ..core import rng
from ..core.rng import Decision
from ..render.pt import trace_radiance_spectral
from ..scene.types import CameraKind, FlatScene


# Re-exported from the import-light module so it can run BEFORE anything
# initializes the XLA backend (see parallel/distributed.py).
from .distributed import init_distributed  # noqa: E402,F401


def make_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n], dtype=object).reshape(n), axis_names=("tiles",))


def _film_channels(scene: FlatScene) -> int:
    from ..spectrum.spectral import NUM_STRATA

    return NUM_STRATA if scene.stex.spectral else scene.stex.value.shape[-1]


def _shard_film_pass(scene, pixel_id, sample_id, width, height, seed_u,
                     max_depth):
    """One sample pass for a pixel shard -> per-pixel film contribution
    (RGB channels or spectral strata — matching render_batch semantics)."""
    from ..spectrum.spectral import (
        NUM_SPECTRAL_SAMPLES,
        WL_HI,
        WL_LO,
        bin_to_strata,
    )

    px = (pixel_id % width).astype(jnp.float32)
    py = (pixel_id // width).astype(jnp.float32)
    jx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_X)
    jy = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_Y)
    if scene.camera.kind == CameraKind.EQUIRECTANGULAR:
        rays = sample_camera_rays_equirect(
            scene.camera, px + jx, py + jy, width, height
        )
    else:
        lx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_U)
        ly = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_V)
        rays = sample_camera_rays(
            scene.camera, px + jx, py + jy, width, height, lx, ly
        )
    c, lambdas = trace_radiance_spectral(
        scene, rays.o, rays.d, pixel_id, sample_id, seed_u, max_depth
    )
    weight = rays.weight[..., None] * c
    if scene.stex.spectral:
        select_wl_pdf = NUM_SPECTRAL_SAMPLES / (WL_HI - WL_LO)
        return bin_to_strata(lambdas, weight / select_wl_pdf)
    return weight


def render_sharded(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int = 16,
):
    """PT with pixels sharded over the `tiles` mesh axis. Returns (H, W, S)
    linear film (RGB channels or spectral strata), identical (up to fp
    reduction order) to the single-chip render since RNG streams are keyed by
    absolute pixel id. Pixel counts that don't divide the mesh are padded
    with inert lanes."""
    n_pix = width * height
    n_dev = mesh.devices.size
    n_pad = -(-n_pix // n_dev) * n_dev
    s = _film_channels(scene)
    seed_u = jnp.uint32(seed)
    # Padding lanes re-trace pixel 0 (cheap, coherent) and are dropped below.
    pixel_id = jnp.where(
        jnp.arange(n_pad, dtype=jnp.uint32) < n_pix,
        jnp.minimum(jnp.arange(n_pad, dtype=jnp.uint32), n_pix - 1),
        0,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(None, P("tiles")),
        out_specs=P("tiles"),
        check_vma=False,
    )
    def render_shard(scene: FlatScene, pixel_id: jnp.ndarray):
        film = jnp.zeros((pixel_id.shape[0], s), jnp.float32)

        def body(i, film):
            sample_id = jnp.full(pixel_id.shape, i, jnp.uint32)
            return film + _shard_film_pass(
                scene, pixel_id, sample_id, width, height, seed_u, max_depth
            )

        film = jax.lax.fori_loop(0, spp, body, film)
        return film / spp

    film = render_shard(scene, pixel_id)
    return film[:n_pix].reshape(height, width, s)


def render_wavefront_sharded(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int | None = None,
    sample_offset: int = 0,
    n_lanes: int | None = None,
):
    """The SHIPPED persistent-wavefront scheduler over the mesh — one
    renderer at every scale (the reference runs the same PT for all workers,
    PathTracingRenderer.cpp:72-81). The global (pixel, sample) work space is
    split into one contiguous slice per device; each shard drains its slice
    with its own dynamic work queue, lanes and full-frame film, and films
    reduce with one psum. The counter-based RNG keys by (pixel, sample), so
    every work item's estimate is bit-identical to the single-chip
    render_wavefront regardless of shard count (film sums may differ by fp
    reduction order only). Returns (H, W, S) mean linear radiance."""
    from ..render.wavefront import (
        DEFAULT_LANE_CAP,
        DEFAULT_MAX_DEPTH,
        _run_wavefront,
    )
    from ..spectrum.spectral import strata_to_rgb

    if max_depth is None:
        max_depth = DEFAULT_MAX_DEPTH
    n_pix = width * height
    total = spp * n_pix
    n_dev = mesh.devices.size
    per = -(-total // n_dev)
    lanes = n_lanes or min(per, n_pix, DEFAULT_LANE_CAP)
    bounds = (jnp.arange(n_dev, dtype=jnp.uint32) * jnp.uint32(per))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(None, P("tiles")),
        out_specs=P(),
        check_vma=False,
    )
    def render_shard(scene: FlatScene, lo: jnp.ndarray):
        lo = lo[0]
        film, _ = _run_wavefront(
            scene, n_pix, spp + sample_offset, jnp.uint32(seed),
            jnp.uint32(width), jnp.uint32(height),
            jnp.uint32(sample_offset), max_depth, n_lanes=lanes,
            ranged=True, work_lo=lo, work_hi=lo + jnp.uint32(per),
        )
        return jax.lax.psum(film, "tiles")

    film = render_shard(scene, bounds)
    img = (film / spp).reshape(height, width, -1)
    if scene.stex.spectral:
        img = strata_to_rgb(img)
    return img


def render_bpt_sharded(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_light_verts: int = 8,
    max_eye_verts: int = 8,
):
    """BPT with eye pixels sharded and per-shard separated splat films
    reduced by `psum` (the reference's per-thread sensor buffers,
    ImageSensor.cpp:140-158). Returns (H, W, S) linear film."""
    from ..render.bpt import bpt_batch

    n_pix = width * height
    n_dev = mesh.devices.size
    # Arbitrary crops shard fine: padding lanes carry lane_mask=False so
    # their own-pixel AND splat contributions are zeroed (the reference has
    # no divisibility constraint; r3 weak #5).
    n_pad = -(-n_pix // n_dev) * n_dev
    s = _film_channels(scene)
    seed_u = jnp.uint32(seed)
    w_j = jnp.int32(width)
    h_j = jnp.int32(height)
    ids_all = jnp.arange(n_pad, dtype=jnp.uint32)
    ids = jnp.minimum(ids_all, n_pix - 1)
    mask = ids_all < n_pix

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(None, P("tiles"), P("tiles")),
        out_specs=P(),
        check_vma=False,
    )
    def render_shard(scene: FlatScene, pixel_id: jnp.ndarray,
                     lane_mask: jnp.ndarray):
        film = jnp.zeros((n_pix, s), jnp.float32)

        def body(i, film):
            sample_id = jnp.full(pixel_id.shape, i, jnp.uint32)
            return bpt_batch(
                scene, pixel_id, sample_id, seed_u, w_j, h_j, film,
                max_light_verts, max_eye_verts, lane_mask=lane_mask,
            )

        film = jax.lax.fori_loop(0, spp, body, film)
        return jax.lax.psum(film, "tiles")

    film = render_shard(scene, ids, mask)
    return (film / spp).reshape(height, width, s)


def dryrun(n_devices: int) -> None:
    """Compile + run sharded render steps on tiny shapes (driver hook):
    RGB PT, spectral PT (strata film), and RGB BPT with psum'd splats."""
    from ..scene.presets import cornell_box_spheres

    mesh = make_mesh(n_devices)
    scene = cornell_box_spheres(sphere_res=6, use_bvh=True)
    img = render_sharded(scene, 32, 24, spp=1, mesh=mesh, max_depth=3)
    img.block_until_ready()
    assert img.shape == (24, 32, 3)
    print(f"dryrun PT rgb ok on {n_devices} devices; "
          f"mean={float(img.mean()):.5f}")

    spec = cornell_box_spheres(sphere_res=6, use_bvh=True, spectral=True)
    img_s = render_sharded(spec, 20, 10, spp=1, mesh=mesh, max_depth=3)
    img_s.block_until_ready()
    from ..spectrum.spectral import NUM_STRATA

    assert img_s.shape == (10, 20, NUM_STRATA)
    print(f"dryrun PT spectral ok; mean={float(img_s.mean()):.5f}")

    img_b = render_bpt_sharded(scene, 16, 12, spp=1, mesh=mesh,
                               max_light_verts=3, max_eye_verts=3)
    img_b.block_until_ready()
    assert img_b.shape == (12, 16, 3)
    print(f"dryrun BPT ok; mean={float(img_b.mean()):.5f}")

    # The SHIPPED renderer (persistent wavefront, dynamic work queue,
    # depth cap 100) over the same mesh — per-shard work-range slices +
    # film psum.
    img_w = render_wavefront_sharded(spec, 20, 10, spp=2, mesh=mesh)
    img_w.block_until_ready()
    assert img_w.shape == (10, 20, 3)
    print(f"dryrun wavefront-sharded (spectral) ok; "
          f"mean={float(img_w.mean()):.5f}")

    # Scene-sharded path (>HBM scenes): chunk tables, shading rows AND the
    # image atlas partitioned by range; texels/rows psum-gathered.
    from .scene_shard import render_pt_scene_sharded

    img_ss = render_pt_scene_sharded(scene, mesh, 16, 12, spp=1,
                                     max_depth=3)
    jax.block_until_ready(img_ss)
    assert img_ss.shape == (12, 16, 3)
    print(f"dryrun scene-sharded PT ok; mean={float(jnp.asarray(img_ss).mean()):.5f}")
    print(f"dryrun_multichip ok on {n_devices} devices; "
          f"mean={float(img.mean()):.5f}")
