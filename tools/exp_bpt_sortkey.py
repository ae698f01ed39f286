"""A/B the contact-point sort key's effect on BPT throughput (parity scene).

Run: python tools/exp_bpt_sortkey.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, "tests/parity_scenes/Cornell_Box_Parity.txt")


def main():
    from slr_tpu.scene.api import load_scene
    from slr_tpu.render.bpt import render_bpt
    from slr_tpu.render import pt as pt_mod

    scene, _, _ = load_scene(SCENE, spectral=True)
    w, h, spp = 256, 192, 8
    n_pix = w * h

    def bench(tag):
        img = render_bpt(scene, w, h, spp=1, seed=1)
        img.block_until_ready()
        t0 = time.perf_counter()
        img = render_bpt(scene, w, h, spp=spp, seed=1)
        img.block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{tag:28s} {n_pix * spp / dt / 1e3:8.1f} ksamples/s")

    bench("contact-point key")

    orig = pt_mod._ray_sort_key

    def old_key(scene_, o, d, active):
        lo = scene_.world_center - scene_.world_radius
        ext = jnp.maximum(2.0 * scene_.world_radius, 1e-12)
        q = jnp.clip((o - lo) / ext * 511.0, 0.0, 511.0).astype(jnp.uint32)

        def expand9(v):
            v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
            v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
            v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
            v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
            return v

        morton = ((expand9(q[..., 0]) << jnp.uint32(2))
                  | (expand9(q[..., 1]) << jnp.uint32(1))
                  | expand9(q[..., 2]))
        octant = (((d[..., 0] < 0).astype(jnp.uint32) << jnp.uint32(2))
                  | ((d[..., 1] < 0).astype(jnp.uint32) << jnp.uint32(1))
                  | (d[..., 2] < 0).astype(jnp.uint32))
        key = (octant << jnp.uint32(27)) | morton
        return jnp.where(active, key, jnp.uint32(0xFFFFFFFF))

    pt_mod._ray_sort_key = old_key
    try:
        bench("origin key (old)")
    finally:
        pt_mod._ray_sort_key = orig
    bench("contact-point key (again)")


if __name__ == "__main__":
    main()
