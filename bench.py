"""Benchmark: Cornell_Box_Spheres path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: pixel samples per second (kilo-samples/s) at 512x384, depth 8 —
the estimator-independent throughput measure (per-sample variance is fixed
by the estimator, so samples/s tracks time-to-quality; Mrays/s would reward
casting MORE rays per sample). History in BASELINE.md records both. The
reference publishes no numbers; vs_baseline is against a nominal CPU-class
figure (1.0 Mrays/s at the original 25 casts/sample = 40k samples/s) until
a reference build exists.

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
    scene = cornell_box_spheres(sphere_res=24)

    # Warm-up / compile (spp=2 so the device-side film accumulation op is
    # also compiled before timing).
    img = render(scene, width, height, spp=2, max_depth=max_depth)
    img.block_until_ready()

    t0 = time.perf_counter()
    img = render(scene, width, height, spp=spp, max_depth=max_depth, seed=1)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    n_pix = width * height
    ksamples = n_pix * spp / dt / 1e3
    # Secondary figure for the log: actual ray casts (camera + per bounce:
    # closest-hit + one shared NEE shadow cast).
    mrays = n_pix * spp * (1 + 2 * max_depth) / dt / 1e6

    baseline_ksamples = 40.0  # nominal CPU-reference figure; see BASELINE.md
    print(
        json.dumps(
            {
                "metric": "cornell_pt_samples_per_s",
                "value": round(ksamples, 3),
                "unit": "ksamples/s",
                "vs_baseline": round(ksamples / baseline_ksamples, 3),
                "mrays_per_s": round(mrays, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
