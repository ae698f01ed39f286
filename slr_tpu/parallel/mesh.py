"""Multi-chip rendering over a jax.sharding Mesh.

The reference's only parallelism is shared-memory tile jobs on a thread pool
(PathTracingRenderer.cpp:27-81). The TPU equivalent (SURVEY.md §2.4): shard
the pixel wavefront over a device mesh with `shard_map`; every shard traces
its own rays against the replicated scene (scene pytrees are broadcast), and
the film is assembled with an `all_gather` over ICI — the analogue of the
reference's separated-buffer-then-sum film (ImageSensor.cpp:140-158). The
counter-based RNG makes the result bitwise independent of the shard count.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..camera.perspective import sample_camera_rays
from ..core import rng
from ..core.rng import Decision
from ..render.pt import trace_radiance
from ..scene.types import FlatScene


def make_mesh(n_devices: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n], dtype=object).reshape(n), axis_names=("tiles",))


def render_sharded(
    scene: FlatScene,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int = 16,
):
    """Render with pixels sharded over the `tiles` mesh axis. Returns (H, W, S)
    linear radiance, identical (up to fp reduction order) to the single-chip
    render since RNG streams are keyed by absolute pixel id."""
    n_pix = width * height
    n_dev = mesh.devices.size
    assert n_pix % n_dev == 0, "pixel count must divide the mesh for now"
    s = scene.stex.value.shape[-1]
    seed_u = jnp.uint32(seed)

    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(None, P("tiles")),
        out_specs=P("tiles"),
        check_rep=False,
    )
    def render_shard(scene: FlatScene, pixel_id: jnp.ndarray):
        px = (pixel_id % width).astype(jnp.float32)
        py = (pixel_id // width).astype(jnp.float32)
        film = jnp.zeros((pixel_id.shape[0], s), jnp.float32)

        def body(i, film):
            sample_id = jnp.full(pixel_id.shape, i, jnp.uint32)
            jx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_X)
            jy = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.PIXEL_Y)
            lx = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_U)
            ly = rng.uniform(seed_u, pixel_id, sample_id, 0, Decision.LENS_V)
            rays = sample_camera_rays(
                scene.camera, px + jx, py + jy, width, height, lx, ly
            )
            c = trace_radiance(
                scene, rays.o, rays.d, pixel_id, sample_id, seed_u, max_depth
            )
            return film + rays.weight[..., None] * c

        film = jax.lax.fori_loop(0, spp, body, film)
        return film / spp

    film = render_shard(scene, pixel_id)
    return film.reshape(height, width, s)


def dryrun(n_devices: int) -> None:
    """Compile + run one sharded render step on tiny shapes (driver hook)."""
    from ..scene.presets import cornell_box_spheres

    mesh = make_mesh(n_devices)
    scene = cornell_box_spheres(sphere_res=6, use_bvh=True)
    img = render_sharded(scene, 32, 24, spp=1, mesh=mesh, max_depth=3)
    img.block_until_ready()
    assert img.shape == (24, 32, 3)
    print(f"dryrun_multichip ok on {n_devices} devices; mean={float(img.mean()):.5f}")
