"""Golden-image parity vs the BUILT reference renderer (SURVEY stage S0).

The goldens in tests/goldens/ are tone-mapped BMP outputs of the actual
reference build (tools/ref_build/build_ref.sh — CMake build of
/root/reference with assimp stubbed and OpenEXR 3 lib names) rendering
tests/parity_scenes/Cornell_Box_Parity.txt, the reference's own
Cornell_Box_Spheres scene with the two unbundled-model spheres tessellated
in the scene DSL so both renderers consume byte-identical input:

  ref_parity_256spp.bmp          PT, 256 spp, default seed
  ref_parity_256spp_seed777.bmp  PT, 256 spp, rngSeed 777
  ref_parity_1024spp.bmp         PT, 1024 spp, default seed

The reference build is spectral (its compile default, defines.h:160) with
RR-unbounded path depth; ours renders the same file in spectral mode.

Thresholds are calibrated against the reference's OWN seed-to-seed
difference at 256 spp: MAD 11.5/255 per pixel, channel means within
0.2/255 (measured; see BASELINE.md). Comparisons here run on 4x4
block-downsampled images (box pixel filters compose, so a 64x48 render
estimates the same block means), which averages MC noise 16x; the tone
map's concavity biases noisier estimates slightly dark, so mean tolerances
carry margin for our lower spp. Full-resolution 256-spp TPU comparisons
are recorded in BASELINE.md via tools/parity.py.

CPU-budget note: ours renders 64x48 @ 32 spp (~100k pixel samples).
"""
from __future__ import annotations

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
SCENE = os.path.join(
    os.path.dirname(__file__), "parity_scenes", "Cornell_Box_Parity.txt"
)


def _load_bmp(name: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.open(os.path.join(GOLD, name))
    ).astype(np.float32)[:, :, :3]


def _down(img: np.ndarray, f: int = 4) -> np.ndarray:
    h, w, c = img.shape
    return img.reshape(h // f, f, w // f, f, c).mean(axis=(1, 3))


def test_reference_selfnoise_calibration():
    """The two independent-seed reference renders agree to the documented
    noise level — pins the threshold calibration itself."""
    a = _down(_load_bmp("ref_parity_256spp.bmp"))
    b = _down(_load_bmp("ref_parity_256spp_seed777.bmp"))
    d = np.abs(a - b)
    assert d.mean() < 6.0, d.mean()
    assert np.abs(a.mean(axis=(0, 1)) - b.mean(axis=(0, 1))).max() < 1.5


@pytest.fixture(scope="module")
def ours_64x48():
    import jax

    from slr_tpu.render.film import develop
    from slr_tpu.render.wavefront import render_wavefront
    from slr_tpu.scene.api import load_scene

    # The SHIPPED renderer at the reference's own depth semantics (RR with
    # cap 100, PathTracingRenderer.cpp:160) — parity is gated on what the
    # CLI/bench actually run.
    scene, _, _ = load_scene(SCENE, spectral=True)
    img = render_wavefront(scene, 64, 48, spp=32, max_depth=100, seed=11)
    return np.asarray(develop(jax.numpy.asarray(img))) * 255.0


def test_parity_channel_means(ours_64x48):
    """Image-level radiometric agreement with the reference render: per
    channel tone-mapped means. Catches wrong albedos/emitter scale/MIS
    weighting (each shifts means by tens of /255)."""
    gold = _down(_load_bmp("ref_parity_1024spp.bmp"))
    ours_mean = ours_64x48.mean(axis=(0, 1))
    gold_mean = gold.mean(axis=(0, 1))
    # Reference seed-to-seed mean deltas are ~0.2/255; ours at 16 spp adds
    # MC-mean noise and the tone-map's noise bias (~1-2/255 dark). 6/255
    # still catches any real estimator disagreement.
    assert np.abs(ours_mean - gold_mean).max() < 6.0, (ours_mean, gold_mean)


def test_parity_block_mad(ours_64x48):
    """Spatial agreement: mean absolute difference over 4x4-block means.
    Catches geometry/shadow/material-placement errors that happen to
    preserve global means."""
    gold = _down(_load_bmp("ref_parity_1024spp.bmp"))
    d = np.abs(ours_64x48 - gold)
    # Budget: measured 14.4 MAD at these settings right after the round-2
    # parity fixes — dominated by 32-spp MC noise on the glass-sphere
    # caustic pixels; the pre-fix broken state measured 44.5.
    assert d.mean() < 18.0, d.mean()
    assert np.percentile(d, 95) < 55.0, np.percentile(d, 95)


def test_parity_quadrant_means(ours_64x48):
    """Noise-robust spatial check: per-quadrant tone-mapped means. Each
    quadrant averages ~770 pixels x 32 spp, so MC noise contributes <2/255;
    a wall/sphere/light systematic shows up directly (the pre-fix broken
    state differed by 25-50/255 per quadrant)."""
    gold = _down(_load_bmp("ref_parity_1024spp.bmp"))
    for ys in (slice(0, 24), slice(24, 48)):
        for xs in (slice(0, 32), slice(32, 64)):
            om = ours_64x48[ys, xs].mean(axis=(0, 1))
            gm = gold[ys, xs].mean(axis=(0, 1))
            assert np.abs(om - gm).max() < 9.0, (ys, xs, om, gm)


@pytest.fixture(scope="module")
def ours_bpt_64x48():
    import jax

    from slr_tpu.render.bpt import render_bpt
    from slr_tpu.render.film import develop
    from slr_tpu.scene.api import load_scene

    scene, _, _ = load_scene(SCENE, spectral=True)
    img = render_bpt(scene, 64, 48, spp=24, seed=13)
    return np.asarray(develop(jax.numpy.asarray(img))) * 255.0


def test_parity_bpt_channel_means(ours_bpt_64x48):
    """BPT vs the reference's own BPT render of the parity scene
    (BidirectionalPathTracingRenderer.cpp:100-256; golden from the built
    binary at 256 spp). Same thresholds rationale as the PT tests."""
    gold = _down(_load_bmp("ref_parity_bpt_256spp.bmp"))
    ours_mean = ours_bpt_64x48.mean(axis=(0, 1))
    gold_mean = gold.mean(axis=(0, 1))
    assert np.abs(ours_mean - gold_mean).max() < 6.0, (ours_mean, gold_mean)


def test_parity_bpt_block_mad(ours_bpt_64x48):
    gold = _down(_load_bmp("ref_parity_bpt_256spp.bmp"))
    d = np.abs(ours_bpt_64x48 - gold)
    assert d.mean() < 18.0, d.mean()
    assert np.percentile(d, 95) < 55.0, np.percentile(d, 95)


def test_parity_bpt_quadrant_means(ours_bpt_64x48):
    gold = _down(_load_bmp("ref_parity_bpt_256spp.bmp"))
    for ys in (slice(0, 24), slice(24, 48)):
        for xs in (slice(0, 32), slice(32, 64)):
            dq = np.abs(
                ours_bpt_64x48[ys, xs].mean(axis=(0, 1))
                - gold[ys, xs].mean(axis=(0, 1))
            ).max()
            assert dq < 10.0, (ys, xs, dq)


def test_parity_aov_channels():
    """Geometry-validation oracle (SURVEY §3.5): our AOV pass vs the built
    reference DebugRenderer (DebugRenderer.cpp:69-190) on the parity scene.
    Goldens rendered by HostProgram with setRenderer("debug", outputs=
    ("geometric normal", "shading normal", "shading tangent")). Encoding is
    the reference's 0.5*n+0.5 into 8-bit. Differences concentrate on edge
    pixels (the reference jitters its 1-spp positions; ours samples pixel
    centers), so we gate the mean and the fraction of agreeing pixels."""
    import jax

    from slr_tpu.render.debug import render_aovs
    from slr_tpu.scene.api import load_scene

    scene, _, _ = load_scene(SCENE, spectral=True)
    aov = render_aovs(scene, 256, 192)
    for name, ours in (("gnormal", aov.g_normal),
                       ("snormal", aov.s_normal),
                       ("tangent", aov.s_tangent)):
        gold = _load_bmp(f"ref_parity_aov_{name}.bmp")
        enc = np.clip((0.5 * np.asarray(ours) + 0.5) * 255.0, 0.0, 255.0)
        d = np.abs(enc - gold)
        assert d.mean() < 2.5, (name, d.mean())
        assert (d.max(axis=-1) <= 8.0).mean() > 0.96, (
            name, (d.max(axis=-1) <= 8.0).mean())
