"""Benchmark: parity-scene path tracing throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scene + baseline are measured-vs-measured: the scene is
tests/parity_scenes/Cornell_Box_Parity.txt (the reference's
Cornell_Box_Spheres with DSL-tessellated spheres, 1,932 tris, spectral),
and the baseline is the actual reference build rendering the very same
file on this machine's CPU — 392 ksamples/s at 256 spp (BASELINE.md,
"Measured (round 2)"). Both renderers run the same estimator family
(spectral PT, NEE+MIS, RR), so pixel samples/s tracks time-to-quality.

Depth: the reference's own semantics — RR-unbounded paths with cap 100
(PathTracingRenderer.cpp:160). The persistent-wavefront scheduler with a
dynamic work queue (render/wavefront.py) makes the cap affordable: depth
no longer costs padded iterations.

Uses a persistent compilation cache so repeated driver runs skip the
remote XLA compile.
"""
from __future__ import annotations

import json
import os
import time

import jax

REPO = os.path.dirname(os.path.abspath(__file__))
SCENE = os.path.join(REPO, "tests/parity_scenes/Cornell_Box_Parity.txt")

# Reference build, same scene file, same machine (BASELINE.md round 2):
# 256x192 @ 256 spp in 32.1 s on the 2-core host CPU.
BASELINE_KSAMPLES = 392.0


def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from slr_tpu.render.wavefront import render_wavefront
    from slr_tpu.scene.api import load_scene

    width, height, spp, max_depth = 256, 192, 64, 100
    scene, _, _ = load_scene(SCENE, spectral=True)

    # Warm-up / compile.
    img = render_wavefront(scene, width, height, spp=2, max_depth=max_depth)
    img.block_until_ready()

    t0 = time.perf_counter()
    img, iters = render_wavefront(scene, width, height, spp=spp,
                                  max_depth=max_depth, seed=1,
                                  return_iters=True)
    img.block_until_ready()
    dt = time.perf_counter() - t0

    n_pix = width * height
    ksamples = n_pix * spp / dt / 1e3
    # Secondary figure: actual ray casts — each wavefront iteration performs
    # one closest-hit and one NEE shadow cast per lane.
    mrays = n_pix * iters * 2 / dt / 1e6

    # Secondary metric: the reference's own working resolution (1024x768,
    # Cornell_Box_Spheres.txt) — the r3 large-frame regression row. Lanes
    # auto-cap at DEFAULT_LANE_CAP so the wavefront state stays HBM-resident.
    bw, bh, bspp = 1024, 768, 8
    img_l = render_wavefront(scene, bw, bh, spp=1)
    img_l.block_until_ready()
    t0 = time.perf_counter()
    img_l = render_wavefront(scene, bw, bh, spp=bspp, seed=1)
    img_l.block_until_ready()
    ksamples_1024 = bw * bh * bspp / (time.perf_counter() - t0) / 1e3

    # Secondary metric: RTC3-class instanced scene (4096 grass-blade
    # instances x 26 local tris = ~106k effective triangles, 25% animated
    # for motion blur) through the instanced Pallas kernel — the workload
    # class of the reference's RTC3.txt (60x60 scanXZFromYPlus instances).
    from slr_tpu.scene.presets import grass_field

    gscene = grass_field(n_side=64, blade_segments=13, animated_fraction=0.25)
    gw, gh, gspp = 512, 384, 4
    img_g = render_wavefront(gscene, gw, gh, spp=1, seed=1)
    img_g.block_until_ready()
    t0 = time.perf_counter()
    img_g = render_wavefront(gscene, gw, gh, spp=gspp, seed=1)
    img_g.block_until_ready()
    rtc3_ksamples = gw * gh * gspp / (time.perf_counter() - t0) / 1e3

    # Secondary metric: BPT throughput on the same scene (all (s,t)
    # strategies at the shipped ADAPTIVE subpath caps: 8+8 base with
    # cap-clipped lanes re-run at 16+16 — the energy-correct defaults;
    # BidirectionalPathTracingRenderer.cpp).
    from slr_tpu.render.bpt import render_bpt

    bpt_spp = 8
    img_b = render_bpt(scene, width, height, spp=1, seed=1)
    img_b.block_until_ready()
    t0 = time.perf_counter()
    img_b = render_bpt(scene, width, height, spp=bpt_spp, seed=1)
    img_b.block_until_ready()
    bpt_ksamples = n_pix * bpt_spp / (time.perf_counter() - t0) / 1e3

    print(
        json.dumps(
            {
                "metric": "parity_scene_pt_samples_per_s",
                "value": round(ksamples, 3),
                "unit": "ksamples/s",
                "vs_baseline": round(ksamples / BASELINE_KSAMPLES, 3),
                "mrays_per_s": round(mrays, 3),
                "ksamples_1024x768": round(ksamples_1024, 3),
                "bpt_ksamples_per_s": round(bpt_ksamples, 3),
                "rtc3_instanced_ksamples_per_s": round(rtc3_ksamples, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
