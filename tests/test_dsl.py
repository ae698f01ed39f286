"""Scene-DSL tests: lexer/parser/interpreter semantics and end-to-end loading
of the reference's bundled TestScenes (SURVEY.md §7 delta 6: the scene-file
surface is preserved verbatim)."""
import numpy as np
import pytest

from slr_tpu.scene.api import ApiContext, make_global_env, read_scene, load_scene
from slr_tpu.scene.dsl.parser import Env, TupleVal, execute, parse
from slr_tpu.scene.graph import SceneDesc

REF_SCENES = "/root/reference/TestScenes"


def run_src(src: str):
    scene = SceneDesc()
    ctx = ApiContext(scene)
    env = make_global_env(ctx)
    execute(src, env, ctx)
    return env, ctx


class TestInterpreter:
    def test_arithmetic_and_vars(self):
        env, _ = run_src("x = 1 + 2 * 3; y = (1 + 2) * 3; z = x - y;")
        assert env.lookup("x") == 7
        assert env.lookup("y") == 9
        assert env.lookup("z") == -2

    def test_comparison_logic(self):
        env, _ = run_src("a = 1 < 2 && 3 >= 3; b = !a || 1 == 2;")
        assert env.lookup("a") is True
        assert env.lookup("b") is False

    def test_if_else_for(self):
        env, _ = run_src(
            "total = 0; for (i = 0; i < 5; ++i) { if (i % 2 == 0) total += i; }"
        )
        assert env.lookup("total") == 6  # 0+2+4

    def test_function_def_and_call(self):
        env, _ = run_src(
            "function sq(x) { return x * x; } function add(a, b = 10) "
            "{ return a + b; } r1 = sq(5); r2 = add(3); r3 = add(3, 4);"
        )
        assert env.lookup("r1") == 25
        assert env.lookup("r2") == 13
        assert env.lookup("r3") == 7

    def test_tuples(self):
        env, _ = run_src(
            't = (1, 2, "k": 3); n = numElements(t); e0 = t[0]; e1 = t[1];'
        )
        assert env.lookup("n") == 3
        assert env.lookup("e0") == 1
        t = env.lookup("t")
        assert t.named()["k"] == 3

    def test_single_element_tuple_and_empty(self):
        env, _ = run_src("t1 = (5,); t0 = (,); p = (5);")
        assert isinstance(env.lookup("t1"), TupleVal)
        assert len(env.lookup("t1")) == 1
        assert len(env.lookup("t0")) == 0
        assert env.lookup("p") == 5  # parenthesized expression, not tuple

    def test_transforms_compose(self):
        env, _ = run_src("m = translate(1, 2, 3) * scale(2);")
        m = env.lookup("m")
        np.testing.assert_allclose(m[:3, 3], [1, 2, 3])
        np.testing.assert_allclose(np.diag(m)[:3], [2, 2, 2])

    def test_spectrum_overloads(self):
        env, _ = run_src(
            's1 = Spectrum(0.75, 0.25, 0.5); s2 = Spectrum("Reflectance", 1.0); '
            's3 = Spectrum("ID": "D65") * 4; s4 = Spectrum("ID": "Aluminium", 1);'
        )
        s1 = env.lookup("s1")
        # Default space "sRGB" = ColorSpace::sRGB_NonLinear (strToColorSpace,
        # API.cpp:62-63): DSL RGB constants are degamma'd to linear.
        def deg(v):
            return v / 12.92 if v <= 0.04045 else ((v + 0.055) / 1.055) ** 2.4

        assert s1.kind == "rgb"
        np.testing.assert_allclose(
            s1.rgb, (deg(0.75), deg(0.25), deg(0.5)), rtol=1e-6
        )
        s2 = env.lookup("s2")
        assert s2.kind == "mono" and s2.value == 1.0
        s3 = env.lookup("s3")
        assert s3.kind == "library" and s3.library_id == "D65" and s3.scale == 4
        s4 = env.lookup("s4")
        assert s4.library_comp == 1

    def test_spectrum_color_spaces(self):
        """"Rec709" is LINEAR sRGB primaries; "sRGB" is nonlinear; XYZ round
        trips exactly through the reflectance (E-white) matrix."""
        from slr_tpu.spectrum.spectral import _sRGB_E_to_XYZ

        env, _ = run_src(
            's_lin = Spectrum("Reflectance", "Rec709", 0.5, 0.5, 0.5); '
            's_xyz = Spectrum("Reflectance", "XYZ", 0.3, 0.4, 0.3);'
        )
        np.testing.assert_allclose(env.lookup("s_lin").rgb, (0.5, 0.5, 0.5))
        xyz = np.asarray(_sRGB_E_to_XYZ, np.float64) @ np.asarray(
            env.lookup("s_xyz").rgb
        )
        np.testing.assert_allclose(xyz, (0.3, 0.4, 0.3), atol=1e-6)

    def test_string_comparison_switchlike(self):
        env, _ = run_src('name = "abc"; eq = name == "abc";')
        assert env.lookup("eq") is True


class TestSceneLoading:
    def test_cornell_box_spheres_loads(self):
        flat, renderer, settings = load_scene(
            f"{REF_SCENES}/Cornell_Box_Spheres.txt", use_bvh=False
        )
        assert settings["width"] == 1024 and settings["height"] == 768
        assert renderer["method"] == "BPT"
        assert renderer["samples"] == 16384
        assert flat.geometry.num_tris > 1000  # box + 2 spheres
        assert flat.lights.num == 2           # light quad = 2 triangles
        assert flat.materials.num >= 8

    def test_cornell_box_spheres_spectral_loads(self):
        flat, _, _ = load_scene(
            f"{REF_SCENES}/Cornell_Box_Spheres.txt", spectral=True, use_bvh=False
        )
        assert flat.stex.spectral
        assert flat.stex.curves_wl.shape[0] >= 3  # D65, Al eta/k, Air, BK7

    def test_cornell_renders(self):
        from slr_tpu.render.pt import render

        flat, _, _ = load_scene(
            f"{REF_SCENES}/Cornell_Box_Spheres.txt", use_bvh=False
        )
        img = np.asarray(render(flat, 32, 24, spp=1, max_depth=4))
        assert np.isfinite(img).all()
        assert img.mean() > 0  # D65*4 integrates to a bright emitter

    def test_aovs_match_camera_setup(self):
        from slr_tpu.render.debug import render_aovs

        flat, _, _ = load_scene(
            f"{REF_SCENES}/Cornell_Box_Spheres.txt", use_bvh=False
        )
        aov = render_aovs(flat, 32, 24)
        assert float(aov.hit.mean()) == 1.0  # closed box fills the view


def test_texture_mapping_offset_scale():
    """Texture2DMapping offset/scale parameters reach the flattened scene
    (OffsetAndScale2DMapping semantics, textures.h:32-42): a scaled checker
    samples differently from the default mapping."""
    import numpy as np
    from slr_tpu.scene.api import read_scene
    from slr_tpu.scene.graph import flatten
    from slr_tpu.scene.textures import eval_stex
    import jax.numpy as jnp

    base = """
surfMat = createSurfaceMaterial("matte", (SpectrumTexture("checker board",
    (Spectrum(1, 1, 1), Spectrum(0, 0, 0){mapping})),));
m = createMesh(
  (
    ((0, 0, 0), (0, 0, 1), (1, 0, 0), (0, 0)),
    ((1, 0, 0), (0, 0, 1), (1, 0, 0), (1, 0)),
    ((1, 1, 0), (0, 0, 1), (1, 0, 0), (1, 1))
  ),
  ((surfMat, ((0, 1, 2),)),)
);
addChild(root, m);
camera = createPerspectiveCamera("aspect": 1.0, "fovY": 0.5, "radius": 0.0,
                                 "imgDist": 1.0, "objDist": 5.0);
addChild(root, camera);
"""
    import tempfile, os
    def build(mapping):
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write(base.format(mapping=mapping))
            path = f.name
        try:
            scene, _ = read_scene(path)
            return flatten(scene)
        finally:
            os.unlink(path)

    plain = build("")
    mapped = build(', "mapping": Texture2DMapping("texcoord 2D", '
                   '("offset": (0.25, 0.0), "scale": (2.0, 2.0)))')
    uv = jnp.asarray([[0.3, 0.3], [0.6, 0.8]], jnp.float32)
    tid = jnp.zeros((2,), jnp.int32)
    # checker texture is texture id of the matte reflectance: find it
    def checker_id(s):
        k = np.asarray(s.stex.kind)
        ids = np.nonzero(k == 2)[0]
        assert len(ids) == 1
        return jnp.full((2,), int(ids[0]), jnp.int32)

    v_plain = np.asarray(eval_stex(plain.stex, checker_id(plain), uv, None))
    v_mapped = np.asarray(eval_stex(mapped.stex, checker_id(mapped), uv, None))
    ms = np.asarray(mapped.stex.map_scale)
    mo = np.asarray(mapped.stex.map_offset)
    kk = int(np.nonzero(np.asarray(mapped.stex.kind) == 2)[0][0])
    np.testing.assert_allclose(ms[kk], [2.0, 2.0])
    np.testing.assert_allclose(mo[kk], [0.25, 0.0])
    assert not np.allclose(v_plain, v_mapped)
