"""Line-attributed device profile of the shipped wavefront renderer on the
parity scene. Run: python tools/profile_wavefront.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.trace_by_line import profile_by_line


def main():
    from slr_tpu.scene.api import load_scene
    from slr_tpu.render.wavefront import _run_wavefront

    scene, _, _ = load_scene("tests/parity_scenes/Cornell_Box_Parity.txt",
                             spectral=True)
    w, h, spp = 256, 192, 8
    n_pix = w * h

    def run():
        film, it = _run_wavefront(scene, n_pix, spp, jnp.uint32(1),
                                  jnp.uint32(w), jnp.uint32(h),
                                  jnp.uint32(0), 100)
        jax.block_until_ready(film)
        return it

    lowered = _run_wavefront.lower(scene, n_pix, jnp.uint32(spp),
                                   jnp.uint32(1), jnp.uint32(w),
                                   jnp.uint32(h), jnp.uint32(0), 100)
    it = run()
    print("iters:", int(it))
    profile_by_line(run, lowered=lowered, top=40, warmup=False)


if __name__ == "__main__":
    main()
