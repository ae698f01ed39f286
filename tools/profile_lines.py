"""Line-attributed device profile of one render_batch pass on the parity
scene. Run: python tools/profile_lines.py [--no-sort]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.trace_by_line import profile_by_line


def main():
    sort = "--no-sort" not in sys.argv
    from slr_tpu.scene.api import load_scene
    from slr_tpu.render.pt import _trace_core
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.core import rng
    from slr_tpu.core.rng import Decision

    scene, _, _ = load_scene("tests/parity_scenes/Cornell_Box_Parity.txt",
                             spectral=True)
    w, h = 256, 192
    n_pix = w * h
    pid = jnp.arange(n_pix, dtype=jnp.uint32)
    sid = jnp.zeros((n_pix,), jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("sort",))
    def run(seed, sort):
        px = (pid % w).astype(jnp.float32)
        py = (pid // w).astype(jnp.float32)
        jx = rng.uniform(seed, pid, sid, 0, Decision.PIXEL_X)
        jy = rng.uniform(seed, pid, sid, 0, Decision.PIXEL_Y)
        lx = rng.uniform(seed, pid, sid, 0, Decision.LENS_U)
        ly = rng.uniform(seed, pid, sid, 0, Decision.LENS_V)
        rays = sample_camera_rays(scene.camera, px + jx, py + jy,
                                  jnp.uint32(w), jnp.uint32(h), lx, ly)
        c, lam = _trace_core(scene, rays.o, rays.d, pid, sid, seed, 16,
                             sort_rays=sort)
        return c

    lowered = run.lower(jnp.uint32(1), sort)
    fn = lambda: run(jnp.uint32(1), sort).block_until_ready()
    profile_by_line(fn, lowered=lowered, top=50)


if __name__ == "__main__":
    main()
