"""Parity harness (SURVEY stage S0): render the parity scene with slr_tpu and
compare against the reference SLR build's progressive BMP dumps.

Usage:
  python tools/parity.py --build            # build the reference (cached)
  python tools/parity.py --reference SPP    # run HostProgram on the scene
  python tools/parity.py --render SPP       # render ours (TPU if available)
  python tools/parity.py --compare SPP      # diff the two at SPP

The scene (tests/parity_scenes/Cornell_Box_Parity.txt) is the reference's
Cornell_Box_Spheres with the spheres tessellated in the scene DSL itself, so
both renderers consume byte-identical geometry/materials (the original's
models/sphere.assbin is not in the reference repo). The reference build is
spectral (defines.h:160), so ours renders spectral too.

Comparison metric: mean absolute difference of the 8-bit tone-mapped images
(the reference's saveImage output) plus per-channel means. MC noise at N spp
bounds the achievable difference; the acceptance thresholds in
tests/test_parity.py are calibrated against the reference's own 16-vs-256 spp
self-difference.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCENE = os.path.join(REPO, "tests/parity_scenes/Cornell_Box_Parity.txt")
REF_WORK = "/tmp/slr_ref"
REF_BIN = f"{REF_WORK}/build/bin/HostProgram"
REF_OUT = "/tmp/slr_ref_out"
OURS_OUT = "/tmp/slr_tpu_out"
WIDTH, HEIGHT = 256, 192


def spp_to_dump(spp: int) -> str:
    """The reference dumps %03u.bmp at 1,2,4,... spp (PathTracingRenderer
    .cpp:83-94): dump index = log2(spp)."""
    return f"{int(math.log2(spp)):03d}.bmp"


def build_reference() -> None:
    subprocess.run(
        ["bash", os.path.join(REPO, "tools/ref_build/build_ref.sh"), REF_WORK],
        check=True,
    )


def run_reference(spp: int) -> None:
    os.makedirs(REF_OUT, exist_ok=True)
    scene = open(SCENE).read()
    scene = scene.replace('"samples": 256', f'"samples": {spp}')
    tmp_scene = os.path.join(REF_OUT, "scene.txt")
    open(tmp_scene, "w").write(scene)
    subprocess.run([REF_BIN, tmp_scene], cwd=REF_OUT, check=True)


def render_ours(spp: int) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from slr_tpu.render.film import develop, save_png
    from slr_tpu.render.pt import render
    from slr_tpu.scene.api import load_scene

    # max_depth=16 ~ the reference's RR-unbounded depth on this scene (path
    # survival past 16 bounces is <1e-4); shares bench.py's compiled program.
    scene, _, _ = load_scene(SCENE, spectral=True)
    img = render(scene, WIDTH, HEIGHT, spp=spp, max_depth=16)
    os.makedirs(OURS_OUT, exist_ok=True)
    np.save(os.path.join(OURS_OUT, f"ours_{spp}.npy"), np.asarray(img))
    save_png(os.path.join(OURS_OUT, f"ours_{spp}.png"), develop(img))
    print(f"rendered {spp} spp -> {OURS_OUT}/ours_{spp}.png")


def compare(spp: int) -> dict:
    import numpy as np
    from PIL import Image

    import jax

    from slr_tpu.render.film import develop

    ref = np.asarray(
        Image.open(os.path.join(REF_OUT, spp_to_dump(spp)))
    ).astype(np.float32)[:, :, :3]
    ours_lin = np.load(os.path.join(OURS_OUT, f"ours_{spp}.npy"))
    ours = np.asarray(develop(jax.numpy.asarray(ours_lin))) * 255.0
    d = np.abs(ours - ref)
    out = {
        "spp": spp,
        "ref_mean": [round(float(x), 3) for x in ref.mean(axis=(0, 1))],
        "ours_mean": [round(float(x), 3) for x in ours.mean(axis=(0, 1))],
        "mad": round(float(d.mean()), 3),
        "p95": round(float(np.percentile(d, 95)), 3),
        "p99": round(float(np.percentile(d, 99)), 3),
    }
    print(json.dumps(out))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--reference", type=int, metavar="SPP")
    ap.add_argument("--render", type=int, metavar="SPP")
    ap.add_argument("--compare", type=int, metavar="SPP")
    args = ap.parse_args()
    if args.build:
        build_reference()
    if args.reference:
        run_reference(args.reference)
    if args.render:
        render_ours(args.render)
    if args.compare:
        compare(args.compare)


if __name__ == "__main__":
    main()
