"""BPT tests: PT-vs-BPT convergence cross-check (the reference's own
verification method, SURVEY.md §4 item 1) and basic sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.render.bpt import render_bpt
from slr_tpu.render.pt import render
from slr_tpu.scene.presets import cornell_box_spheres


@pytest.fixture(scope="module")
def cornell_small():
    return cornell_box_spheres(sphere_res=6, use_bvh=False, metal=False,
                               glass=False)


class TestBPT:
    def test_finite_and_positive(self, cornell_small):
        img = np.asarray(render_bpt(cornell_small, 24, 18, spp=2))
        assert np.isfinite(img).all()
        assert (img >= 0).all()
        assert img.mean() > 0.01

    def test_pt_bpt_agree(self, cornell_small):
        """Two independent estimators of the same integral must agree in the
        mean (reference cross-check: both renderers configured per scene)."""
        w, h = 24, 18
        pt = np.asarray(render(cornell_small, w, h, spp=48, max_depth=4))
        bpt = np.asarray(
            render_bpt(cornell_small, w, h, spp=48, max_light_verts=4,
                       max_eye_verts=4)
        )
        # compare mean image intensity (pixel-level MC noise is large at
        # these sample counts; the integrals must match)
        np.testing.assert_allclose(bpt.mean(), pt.mean(), rtol=0.12)
        # and per-channel means
        np.testing.assert_allclose(
            bpt.mean(axis=(0, 1)), pt.mean(axis=(0, 1)), rtol=0.15
        )

    def test_pt_bpt_agree_per_block(self, cornell_small):
        """Spatially-resolved convergence: 3x3-block means of independent
        PT and BPT renders agree everywhere, not just globally — a wrong
        MIS weight distorts specific regions (near the light, in shadow)
        by O(2x) while barely moving the image mean. Measured at these
        settings: mean block rel-err 0.076, max 0.204 (MC noise)."""
        w, h = 24, 18
        pt = np.asarray(render(cornell_small, w, h, spp=256, max_depth=6))
        bpt = np.asarray(
            render_bpt(cornell_small, w, h, spp=64, max_light_verts=4,
                       max_eye_verts=4)
        )

        def blocks(a, f=3):
            return a.reshape(h // f, f, w // f, f, 3).mean(axis=(1, 3))

        rel = np.abs(blocks(bpt) - blocks(pt)) / np.maximum(blocks(pt), 1e-3)
        assert rel.mean() < 0.12, rel.mean()
        assert rel.max() < 0.35, rel.max()

    def test_light_tracing_splats_present(self, cornell_small):
        """t=1 strategies splat energy outside the pixel's own path."""
        img1 = np.asarray(
            render_bpt(cornell_small, 16, 12, spp=2, max_eye_verts=1)
        )
        # with only the lens vertex on the eye side, ALL energy comes from
        # t=1 splats; image must still be lit
        assert img1.mean() > 0.001

    def test_deterministic(self, cornell_small):
        a = np.asarray(render_bpt(cornell_small, 12, 9, spp=1))
        b = np.asarray(render_bpt(cornell_small, 12, 9, spp=1))
        np.testing.assert_array_equal(a, b)


class TestBPTEnv:
    """Environment-light strategies in BPT (SurfaceObject.cpp:187-209,
    IBLEDF.cpp): env-lit scenes render under BPT and agree with PT."""

    def test_env_scene_renders(self):
        from slr_tpu.scene.presets import env_sphere_scene

        scene = env_sphere_scene(env_scale=1.5)
        img = np.asarray(render_bpt(scene, 24, 18, spp=2,
                                    max_light_verts=3, max_eye_verts=3))
        assert np.isfinite(img).all()
        assert (img >= 0).all()
        # The background (s=0 env hits) must carry the env radiance.
        assert img.mean() > 0.1

    def test_env_pt_bpt_agree(self):
        from slr_tpu.scene.presets import env_sphere_scene

        scene = env_sphere_scene(reflectance=0.6, env_scale=1.0)
        w, h = 20, 16
        pt = np.asarray(render(scene, w, h, spp=32, max_depth=4))
        bpt = np.asarray(render_bpt(scene, w, h, spp=32,
                                    max_light_verts=4, max_eye_verts=4))
        np.testing.assert_allclose(bpt.mean(), pt.mean(), rtol=0.12)
        np.testing.assert_allclose(
            bpt.mean(axis=(0, 1)), pt.mean(axis=(0, 1)), rtol=0.15
        )


class TestAnimatedBPT:
    """Shutter-time sampling in BPT (VERDICT r3 #4): an animated/instanced
    scene must converge PT <-> BPT and actually integrate over the shutter
    — before round 4 BPT silently rendered t=0 (no Decision.TIME anywhere
    in bpt.py). Reference: one time sample per pixel threaded through
    subpaths and visibility
    (BidirectionalPathTracingRenderer.cpp:104,126,148,201)."""

    @staticmethod
    def _make_scene(x0, x1=None):
        from slr_tpu.scene.build import SceneBuilder
        import slr_tpu.core.math3d as m3

        b = SceneBuilder()
        white = b.add_matte(b.add_stex_const((0.6,) * 3))
        g = np.float32([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]])
        nrm = np.tile(np.float32([0, 1, 0]), (4, 1))
        tan = np.tile(np.float32([1, 0, 0]), (4, 1))
        b.add_mesh(g, nrm, tan, np.zeros((4, 2), np.float32),
                   np.array([[0, 1, 2], [0, 2, 3]], np.int32), white)
        em = b.add_stex_const((30.0,) * 3)
        lm = b.add_emitter(b.add_matte(b.add_stex_const((0.5,) * 3)), em)
        s = np.float32([[-1, 3, -1], [1, 3, -1], [1, 3, 1], [-1, 3, 1]])
        b.add_mesh(s, np.tile(np.float32([0, -1, 0]), (4, 1)), tan,
                   np.zeros((4, 2), np.float32),
                   np.array([[0, 2, 1], [0, 3, 2]], np.int32), lm)
        bid = b.begin_blas()
        q = np.float32([[-0.6, 0, 0], [0.6, 0, 0],
                        [0.6, 1.4, 0], [-0.6, 1.4, 0]])
        b.add_mesh(q, np.tile(np.float32([0, 0, 1]), (4, 1)), tan,
                   np.zeros((4, 2), np.float32),
                   np.array([[0, 1, 2], [0, 2, 3]], np.int32), white)
        b.end_blas()
        m0 = np.eye(4, dtype=np.float32)
        m0[0, 3] = x0
        if x1 is None:
            b.add_instance(bid, m0)
        else:
            m1 = m0.copy()
            m1[0, 3] = x1
            b.add_instance(bid, m0, m1)
        cam = (
            np.asarray(m3.mat_translate(np.array([0.0, 1.0, 3.0])))
            @ np.asarray(m3.mat_rotate_y(np.pi))
        ).astype(np.float32)
        b.set_camera_perspective(cam, 4.0 / 3.0, 1.0)
        return b.build(use_bvh=False)

    def test_pt_bpt_agree_animated(self):
        anim = self._make_scene(-1.0, 1.0)
        w, h = 24, 18
        pt = np.asarray(render(anim, w, h, spp=64, max_depth=4))
        bpt = np.asarray(
            render_bpt(anim, w, h, spp=64, max_light_verts=4,
                       max_eye_verts=4))
        assert np.isfinite(bpt).all()
        np.testing.assert_allclose(bpt.mean(), pt.mean(), rtol=0.12)

    def test_bpt_integrates_the_shutter(self):
        """The BPT image of a quad sweeping x: -1 -> 1 must sit closer to
        the average of the two frozen endpoint renders than to either
        endpoint (measured on CPU: |blur-avg| 0.034 vs |blur-t0| 0.056,
        |t0-t1| 0.071 — a frozen-at-t0 BPT would fail by 2x)."""
        anim = self._make_scene(-1.0, 1.0)
        f0 = self._make_scene(-1.0)
        f1 = self._make_scene(1.0)
        w, h, spp = 32, 24, 32
        kw = dict(max_light_verts=3, max_eye_verts=3)
        blur = np.asarray(render_bpt(anim, w, h, spp=spp, **kw))
        i0 = np.asarray(render_bpt(f0, w, h, spp=spp, **kw))
        i1 = np.asarray(render_bpt(f1, w, h, spp=spp, **kw))
        d_avg = np.abs(blur - 0.5 * (i0 + i1)).mean()
        d_t0 = np.abs(blur - i0).mean()
        d_t1 = np.abs(blur - i1).mean()
        assert np.abs(i0 - i1).mean() > 0.03      # signal sanity
        assert d_avg < 0.75 * d_t0, (d_avg, d_t0)
        assert d_avg < 0.75 * d_t1, (d_avg, d_t1)


class TestIncrementalMIS:
    """The O(V^2) recursive MIS partial sums (_mis_incremental) must agree
    with the literal reference walk (_mis_weight_static, BPT cpp:353-414)
    for every (s, t) on randomized pdf/delta tables."""

    def test_matches_static_walk(self):
        import numpy as np
        import jax.numpy as jnp
        from slr_tpu.render.bpt import (
            Vertices, _mis_incremental, _mis_weight_static, _safe_div)

        rng_np = np.random.default_rng(7)
        r, n_l, n_e = 64, 5, 6
        def mk(n):
            area = rng_np.uniform(0.05, 3.0, (n, r)).astype(np.float32)
            rrp = rng_np.uniform(0.2, 1.0, (n, r)).astype(np.float32)
            rev_a = rng_np.uniform(0.05, 3.0, (n, r)).astype(np.float32)
            rev_r = rng_np.uniform(0.2, 1.0, (n, r)).astype(np.float32)
            delta = rng_np.uniform(size=(n, r)) < 0.25
            return area, rrp, rev_a, rev_r, delta

        la, lr, lra, lrr, ld = mk(n_l)
        ea, er, era, err, ed = mk(n_e)
        z = jnp.zeros((n_l, r))
        lv = Vertices(*([z] * 10), jnp.asarray(la), jnp.asarray(lr),
                      jnp.asarray(lra), jnp.asarray(lrr), jnp.asarray(ld),
                      z, z, z)
        z = jnp.zeros((n_e, r))
        evv = Vertices(*([z] * 10), jnp.asarray(ea), jnp.asarray(er),
                       jnp.asarray(era), jnp.asarray(err), jnp.asarray(ed),
                       z, z, z)
        d_l, zb_l, s_l = _mis_incremental(lv, n_l, 0)
        d_e, zb_e, s_e = _mis_incremental(evv, n_e, 1)

        ext = [rng_np.uniform(0.05, 2.0, (8, r)).astype(np.float32)
               for _ in range(1)][0]
        l_e1, l_r1, l_e2, l_r2, e_e1, e_r1, e_e2, e_r2 = (
            jnp.asarray(ext[i]) for i in range(8))

        for s in range(0, n_l + 1):
            for t in range(1, n_e + 1):
                ref = _mis_weight_static(
                    l_e1, l_r1, l_e2, l_r2, e_e1, e_r1, e_e2, e_r2, s, t,
                    # static walk indexes [:, i]: lane-major tables
                    jnp.asarray(la).T, jnp.asarray(lr).T,
                    jnp.asarray(lra).T, jnp.asarray(lrr).T,
                    jnp.asarray(ld).T,
                    jnp.asarray(ea).T, jnp.asarray(er).T,
                    jnp.asarray(era).T, jnp.asarray(err).T,
                    jnp.asarray(ed).T,
                )
                rec = jnp.ones((r,))
                if t > 1:
                    c1 = _safe_div(l_e1 * l_r1, d_e[t - 1])
                    c2 = _safe_div(l_e2 * l_r2, d_e[t - 2])
                    rec = rec + zb_e[t - 1] * c1 * c1 + (c1 * c2) ** 2 * s_e[t]
                if s > 0:
                    c1 = _safe_div(e_e1 * e_r1, d_l[s - 1])
                    c2 = _safe_div(
                        e_e2 * e_r2,
                        d_l[s - 2] if s >= 2 else jnp.ones((r,)))
                    rec = rec + zb_l[s - 1] * c1 * c1 + (c1 * c2) ** 2 * s_l[s]
                got = 1.0 / rec
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=2e-5,
                    err_msg=f"s={s} t={t}")


class TestGlassCorridor:
    """Specular-slab transport (VERDICT r4 item 2): a full-section glass
    pane between camera and scene routes ~all transport through refracted
    paths. Gates two properties at the SHIPPED defaults:

    * energy: BPT must agree with PT (the r4 code lost 2/3 of every
      hero-collapsed path in RGB mode — the xN collapse compensation was
      spectral-gated; the reference applies it unconditionally,
      BPT cpp:194-196, 305-306);
    * adaptive tiers: render_bpt's base->deep re-run must equal a flat
      deep-cap render bit-near-exactly (same RNG keys reproduce the
      shallow prefix, so tiering is pure scheduling).
    """

    def test_energy_matches_pt_at_defaults(self):
        from slr_tpu.scene.presets import glass_corridor

        sc = glass_corridor(n_panes=1)
        pt = np.asarray(render(sc, 20, 15, spp=32, max_depth=20))
        bpt = np.asarray(render_bpt(sc, 20, 15, spp=16))
        assert np.isfinite(bpt).all()
        ratio = bpt.mean() / pt.mean()
        # generous band: both estimators are noisy on specular-slab
        # transport at this spp; the r4 bug sat at ratio ~0.35
        assert 0.75 < ratio < 1.35, ratio

    def test_tiered_equals_flat_deep(self):
        from slr_tpu.scene.presets import glass_corridor

        sc = glass_corridor(n_panes=1)
        tiered = np.asarray(render_bpt(sc, 16, 12, spp=2, base_verts=6,
                                       max_light_verts=12, max_eye_verts=12))
        flat = np.asarray(render_bpt(sc, 16, 12, spp=2, base_verts=12,
                                     max_light_verts=12, max_eye_verts=12))
        np.testing.assert_allclose(tiered, flat, rtol=2e-4, atol=1e-6)
