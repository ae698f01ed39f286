"""End-to-end loading of ALL bundled reference TestScenes.

The reference repo does not bundle its binary model assets or EXR
environments (README.md:71-72); missing assets substitute placeholders
(unit cube / procedural sky) so every scene still parses through the full
DSL -> graph -> flatten pipeline. RTC3 exercises createReferenceNode
instancing + scanXZFromYPlus scattering; IBL_Test exercises the env light.
"""
import os

import numpy as np
import pytest

from slr_tpu.scene.api import load_scene

REF_SCENES = "/root/reference/TestScenes"
ALL = [
    "Cornell_Box_Spheres.txt",
    "Cornell_Box_Boxes.txt",
    "Cornell_Box_ColorChecker.txt",
    "Cornell_Box_ColorChecker_OverrideMaterial.txt",
    "IBL_Test.txt",
    "RTC3.txt",
    "RTC3_pika.txt",
]


@pytest.mark.parametrize("name", ALL)
def test_scene_loads(name):
    path = os.path.join(REF_SCENES, name)
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    scene, renderer_cfg, settings = load_scene(path, use_bvh=False)
    assert scene.geometry.num_tris > 0
    assert scene.materials.num >= 1
    assert settings["width"] > 0 and settings["height"] > 0
    assert renderer_cfg.get("method") in ("PT", "BPT", "debug", "DEBUG",
                                          "pt", "bpt")


def test_rtc3_instances_shared():
    # RTC3 scatters grass/trees with createReferenceNode. Since r4, STATIC
    # instances are BAKED into world-space static geometry at scene build
    # (the reference's own static-transform flattening, nodes.cpp:110-171)
    # so the single Pallas kernel traverses them without per-ray
    # transforms; only ANIMATED instances keep shared-BLAS
    # (chunk, instance) rows — that sharing is asserted by
    # test_instancing. Here: the scatter must have expanded into the
    # static tables, all-static scenes carry no two-level remainder, and
    # the scene renders.
    path = os.path.join(REF_SCENES, "RTC3.txt")
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    scene, _, _ = load_scene(path, use_bvh=False)
    assert scene.geometry.num_tris > 10_000   # 60x60 scatter expanded
    assert scene.instances is None            # all-static: fully baked


def test_ibl_scene_renders():
    path = os.path.join(REF_SCENES, "IBL_Test.txt")
    if not os.path.exists(path):
        pytest.skip("reference scenes unavailable")
    from slr_tpu.render.pt import render

    scene, _, _ = load_scene(path, use_bvh=False)
    assert scene.has_env
    img = render(scene, 24, 24, spp=1, max_depth=3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.mean() > 0.0


def test_placeholder_scenes_render_nonblack():
    """Shape-appropriate placeholders for unbundled .assbin assets: the
    Cornell_box_* shell stand-in gives the asset-dependent scenes a
    renderable interior (they were black with a generic cube — camera saw
    the unlit exterior)."""
    import jax.numpy as jnp

    from slr_tpu.render.pt import render
    from slr_tpu.scene.api import load_scene

    for name in ("Cornell_Box_Boxes", "Cornell_Box_ColorChecker"):
        scene, _, _ = load_scene(
            f"/root/reference/TestScenes/{name}.txt", spectral=True)
        img = np.asarray(render(scene, 32, 24, spp=2, max_depth=5, seed=1))
        assert np.isfinite(img).all(), name
        assert (img.sum(axis=-1) > 0).mean() > 0.5, (
            name, (img.sum(axis=-1) > 0).mean())
