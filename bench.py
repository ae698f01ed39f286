"""Benchmark: Cornell_Box_Spheres path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: rays traced per second (Mrays/s) counting closest-hit + shadow +
env-shadow casts over all bounces, Cornell-box-spheres at 512x384. The
reference publishes no numbers (BASELINE.md); vs_baseline is against a
nominal 1.0 Mrays/s CPU-class figure until a reference build exists.

Uses the per-pass jitted `render` (the axon remote compiler takes minutes on
the fully fused program) and a persistent compilation cache so repeated
driver runs skip compilation.
"""
from __future__ import annotations

import json
import os
import time

import jax


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from slr_tpu.scene.presets import cornell_box_spheres
    from slr_tpu.render.pt import render

    width, height, spp, max_depth = 512, 384, 4, 8
    scene = cornell_box_spheres(sphere_res=24, use_bvh=False)

    # Warm-up / compile.
    img = render(scene, width, height, spp=1, max_depth=max_depth)
    img.block_until_ready()

    t0 = time.perf_counter()
    img = render(scene, width, height, spp=spp, max_depth=max_depth, seed=1)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    n_pix = width * height
    # per bounce: closest-hit + area-light shadow + env shadow = 3 casts,
    # plus the camera ray's initial cast.
    rays = n_pix * spp * (1 + 3 * max_depth)
    mrays = rays / dt / 1e6

    baseline_mrays = 1.0  # nominal CPU-reference figure; see BASELINE.md
    print(
        json.dumps(
            {
                "metric": "cornell_pt_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline_mrays, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
