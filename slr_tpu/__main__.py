"""CLI driver: render a scene file (reference HostProgram/main.cpp:20-62).

    python -m slr_tpu <scene.txt> [--spp N] [--out DIR] [--spectral]
                      [--width W] [--height H] [--renderer pt|debug]
                      [--max-depth D]

Like the reference, renders progressive power-of-2 checkpoints (000.png,
001.png, ... at 1, 2, 4, ... spp) scaled by brightness/(samples so far)
(PathTracingRenderer.cpp:83-94).
"""
from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser(prog="slr_tpu")
    ap.add_argument("scene", help="scene description file (SLR DSL)")
    ap.add_argument("--spp", type=int, default=None,
                    help="override sample count (default: from the scene file)")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default=".", help="output directory")
    ap.add_argument("--spectral", action="store_true",
                    help="full spectral rendering (default RGB)")
    ap.add_argument("--renderer",
                    choices=("pt", "bpt", "debug", "sppm", "amcmcppm"),
                    default=None, help="override the scene's renderer "
                    "(sppm/amcmcppm: progressive photon mapping)")
    ap.add_argument("--format", choices=("png", "bmp"), default="png",
                    help="image output format (bmp matches the reference)")
    ap.add_argument("--max-depth", type=int, default=100,
                help="path cap; the reference PT caps at 100 with RR (PathTracingRenderer.cpp:160)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--scene-shard", action="store_true",
                    help="partition the scene (chunk tables, shading rows, "
                    "image atlas) by range across the device mesh instead "
                    "of replicating it — for scenes exceeding one chip's "
                    "HBM (PT only; requires >1 device)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the first pass to DIR")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="log build/render stats (BVH SAH cost, rays/s, ...)")
    ap.add_argument("--check", action="store_true",
                    help="debug guardrails: assert film finiteness and "
                    "non-negativity after every pass (the reference's "
                    "SLRAssert NaN/Inf checks, defines.h:78-85 / "
                    "ImageSensor.cpp:159-164)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint in --out (film + sample "
                    "counter; continuation is bitwise-identical to an "
                    "uninterrupted run thanks to the counter-based RNG)")
    args = ap.parse_args()

    import logging

    import jax

    if args.verbose:
        logging.basicConfig(level=logging.INFO, format="%(message)s")
        logging.getLogger("slr_tpu").setLevel(logging.INFO)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/slr_tpu_xla"))

    import numpy as np

    from .render.film import develop, save_bmp, save_png
    from .scene.api import load_scene

    ext = args.format
    save_img = save_bmp if args.format == "bmp" else save_png

    t0 = time.time()
    scene, renderer_cfg, settings = load_scene(args.scene,
                                               spectral=args.spectral)
    print(f"scene loaded: {scene.geometry.num_tris} tris, "
          f"{scene.materials.num} materials, {scene.lights.num} lights "
          f"({time.time() - t0:.2f}s)")

    width = args.width or settings["width"]
    height = args.height or settings["height"]
    brightness = settings["brightness"]
    method = (args.renderer or renderer_cfg.get("method", "PT")).lower()
    spp = args.spp or int(renderer_cfg.get("samples", 16))
    os.makedirs(args.out, exist_ok=True)

    if method == "debug":
        from .render.debug import render_aovs

        aov = render_aovs(scene, width, height)
        save_img(os.path.join(args.out, f"gnormal.{ext}"),
                 np.asarray(aov.g_normal) * 0.5 + 0.5)
        save_img(os.path.join(args.out, f"snormal.{ext}"),
                 np.asarray(aov.s_normal) * 0.5 + 0.5)
        save_img(os.path.join(args.out, f"stangent.{ext}"),
                 np.asarray(aov.s_tangent) * 0.5 + 0.5)
        dist = np.asarray(aov.distance)
        dmax = dist.max() or 1.0
        save_img(os.path.join(args.out, f"distance.{ext}"),
                 np.repeat((dist / dmax)[..., None], 3, axis=-1))
        print(f"AOVs written to {args.out}")
        return

    if method in ("sppm", "amcmcppm"):
        from .render.ppm import render_ppm

        img = render_ppm(scene, width, height, n_iterations=max(spp, 1),
                         n_photon_paths=1 << 15, max_bounces=args.max_depth,
                         seed=int(settings.get("rngSeed", 0)) & 0xFFFFFFFF,
                         use_mcmc=(method == "amcmcppm"))
        out = os.path.join(args.out, f"ppm.{ext}")
        save_img(out, develop(np.asarray(img), brightness))
        print(f"{method} ({spp} waves x 32768 photon paths): {out}, "
              f"{time.time() - t0:.1f}s")
        return

    use_bpt = method == "bpt"

    rng_seed = int(settings.get("rngSeed", 0)) & 0xFFFFFFFF

    def render_pass(step: int, offset: int) -> np.ndarray:
        if use_bpt:
            from .render.bpt import render_bpt

            return np.asarray(render_bpt(scene, width, height, spp=step,
                                         seed=rng_seed, sample_offset=offset))
        # The shipped PT is the persistent-wavefront scheduler at the
        # reference's depth semantics (cap 100 + RR); the fixed-depth
        # pass renderer in render/pt.py remains the differentiable path.
        # With >1 device the SAME scheduler shards over the mesh (one
        # renderer at every scale, PathTracingRenderer.cpp:72-81).
        import jax

        if len(jax.devices()) > 1:
            from .parallel.mesh import make_mesh, render_wavefront_sharded

            if args.scene_shard:
                from .parallel.scene_shard import render_pt_scene_sharded

                # The >HBM path: tables partitioned by range, fixed-depth
                # estimator (sample_offset folds into the seed stream via
                # per-sample ids starting at `offset`).
                return np.asarray(render_pt_scene_sharded(
                    scene, make_mesh(), width, height, spp=step,
                    seed=rng_seed, sample_offset=offset,
                    max_depth=min(args.max_depth, 16)))
            return np.asarray(render_wavefront_sharded(
                scene, width, height, spp=step, mesh=make_mesh(),
                seed=rng_seed, max_depth=args.max_depth,
                sample_offset=offset))
        from .render.wavefront import render_wavefront

        return np.asarray(render_wavefront(
            scene, width, height, spp=step, seed=rng_seed,
            max_depth=args.max_depth, sample_offset=offset))

    # Progressive power-of-2 exports like the reference, with a resumable
    # film checkpoint at every export (utils/checkpoint.py).
    from .utils.checkpoint import load_checkpoint, save_checkpoint

    ckpt_path = os.path.join(args.out, "checkpoint")
    t0 = time.time()
    accum = None
    comp = None  # Kahan compensation (CompensatedSum.h:18-27 semantics)
    done = 0
    if args.resume:
        state = load_checkpoint(ckpt_path)
        if state is not None:
            accum = np.asarray(state["accum"])
            comp = np.asarray(state.get("comp", np.zeros_like(accum)))
            done = int(state["done"])
            print(f"resumed at {done} samples")
    img_idx = 0
    next_export = 1
    while next_export <= done:
        img_idx += 1
        next_export *= 2
    from .utils.metrics import RenderMeter, profile_trace

    meter = RenderMeter(width, height, args.max_depth, has_env=scene.has_env)
    first_pass = True
    while done < spp:
        step = min(next_export, spp) - done
        meter.start()
        with profile_trace(args.profile if first_pass else None):
            img = render_pass(step, offset=done)
        meter.stop(step)
        first_pass = False
        if args.check:
            bad = ~np.isfinite(img) | (img < 0.0)
            if bad.any():
                raise RuntimeError(
                    f"--check: {int(bad.sum())} non-finite/negative film "
                    f"texels after pass at {done}+{step} spp"
                )
        # Kahan-compensated progressive accumulation (the reference's
        # CompensatedSum film, SpectrumTypes.h:826-835): matters for very
        # long runs where per-texel sums span many orders of magnitude.
        from .render.film import kahan_add

        if accum is None:
            accum = np.zeros_like(img)
            comp = np.zeros_like(img)
        accum, comp = kahan_add(accum, comp, img * step)
        done += step
        out = os.path.join(args.out, f"{img_idx:03d}.{ext}")
        save_img(out, develop((accum + comp) / done, brightness))
        save_checkpoint(ckpt_path, {"accum": accum, "comp": comp,
                                    "done": done})
        print(f"{done} samples: {out}, {time.time() - t0:.1f}s "
              f"[{meter.mrays_per_s:.2f} Mrays/s]")
        img_idx += 1
        next_export *= 2
    print(meter.report())


if __name__ == "__main__":
    main()
