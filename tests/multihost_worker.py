"""Worker process for the 2-process jax.distributed test.

Launched by tests/test_parallel.py::test_multihost_two_process with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set. Each
process owns 4 virtual CPU devices; the 8-device global mesh renders a
pixel-sharded frame, a cross-host psum sanity-checks the collective path,
and every process asserts the gathered film equals its own single-process
render (the RNG is keyed by absolute pixel id, so they must agree to fp
reduction order).
"""
from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np


def main() -> None:
    # Import-light entry: must precede any slr_tpu import that creates
    # device constants (spectrum/rgb.py does at module level).
    from slr_tpu.parallel.distributed import init_distributed

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mh
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from slr_tpu.parallel.mesh import _film_channels, _shard_film_pass
    from slr_tpu.render.pt import render
    from slr_tpu.scene.presets import cornell_box_spheres

    mesh = Mesh(np.asarray(jax.devices(), dtype=object).reshape(8),
                axis_names=("tiles",))

    # Cross-host collective sanity check: psum over the full mesh.
    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=P("tiles"), out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), "tiles")

    ones = mh.host_local_array_to_global_array(
        np.ones((4,), np.float32), mesh, P("tiles"))
    t = np.asarray(total(ones).addressable_data(0))
    assert float(t.ravel()[0]) == 8.0, t

    # Deterministic scene build on both hosts.
    scene = cornell_box_spheres(sphere_res=6, use_bvh=False)
    w, h, spp, depth = 16, 8, 2, 3
    n_pix = w * h
    s = _film_channels(scene)
    seed_u = jnp.uint32(3)

    scene_g = jax.tree.map(
        lambda x: mh.host_local_array_to_global_array(
            np.asarray(x), mesh, P()),
        scene,
    )
    pixel_np = np.arange(n_pix, dtype=np.uint32)
    local = pixel_np.reshape(2, n_pix // 2)[jax.process_index()]
    pixel_g = mh.host_local_array_to_global_array(local, mesh, P("tiles"))

    @jax.jit
    @lambda f: shard_map(f, mesh=mesh, in_specs=(P(), P("tiles")),
                         out_specs=P("tiles"), check_vma=False)
    def render_shard(scene, pixel_id):
        film = jnp.zeros((pixel_id.shape[0], s), jnp.float32)

        def body(i, film):
            sample_id = jnp.full(pixel_id.shape, i, jnp.uint32)
            return film + _shard_film_pass(
                scene, pixel_id, sample_id, jnp.uint32(w), jnp.uint32(h),
                seed_u, depth)

        return jax.lax.fori_loop(0, spp, body, film) / spp

    film = render_shard(scene_g, pixel_g)
    film_full = np.asarray(mh.process_allgather(film, tiled=True))
    film_full = film_full.reshape(h, w, s)

    expected = np.asarray(render(scene, w, h, spp=spp, max_depth=depth,
                                 seed=3))
    np.testing.assert_allclose(film_full, expected, rtol=2e-3, atol=2e-4)
    print(f"process {jax.process_index()} OK", flush=True)


if __name__ == "__main__":
    main()
