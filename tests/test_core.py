"""Unit tests for core math, sampling, and RNG (SURVEY.md §4 test pyramid:
NumPy-oracle tests for every kernel-level primitive)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.core import math3d as m3
from slr_tpu.core import rng, sampling


class TestMath3D:
    def test_dot_cross(self):
        a = jnp.array([[1.0, 0, 0], [0, 2, 0]])
        b = jnp.array([[0.0, 1, 0], [0, 1, 0]])
        np.testing.assert_allclose(m3.dot(a, b), [0.0, 2.0])
        np.testing.assert_allclose(m3.cross(a, b)[0], [0, 0, 1])

    def test_normalize(self):
        v = jnp.array([[3.0, 4.0, 0.0]])
        n = m3.normalize(v)
        np.testing.assert_allclose(np.asarray(m3.length(n)), 1.0, rtol=1e-6)

    def test_onb_orthonormal(self):
        rs = np.random.RandomState(0)
        z = m3.normalize(jnp.asarray(rs.randn(100, 3), jnp.float32))
        x, y, zz = m3.onb_from_z(z)
        np.testing.assert_allclose(np.asarray(m3.dot(x, y)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m3.dot(x, zz)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(m3.length(x)), 1.0, atol=1e-5)
        # right-handed
        np.testing.assert_allclose(
            np.asarray(m3.cross(x, y)), np.asarray(zz), atol=1e-5
        )

    def test_frame_roundtrip(self):
        rs = np.random.RandomState(1)
        z = m3.normalize(jnp.asarray(rs.randn(10, 3), jnp.float32))
        v = jnp.asarray(rs.randn(10, 3), jnp.float32)
        x, y, zz = m3.onb_from_z(z)
        local = m3.frame_to_local(x, y, zz, v)
        back = m3.frame_from_local(x, y, zz, local)
        np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-5)

    def test_transforms(self):
        t = m3.mat_translate(jnp.array([1.0, 2.0, 3.0]))
        p = m3.transform_point(t, jnp.array([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(p), [1, 2, 3])
        r = m3.mat_rotate_y(jnp.pi)
        d = m3.transform_vector(r, jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(d), [0, 0, -1], atol=1e-6)

    def test_reflect(self):
        v = jnp.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        n = jnp.array([0.0, 0.0, 1.0])
        r = m3.reflect(v, n)
        np.testing.assert_allclose(np.asarray(r), [-v[0], 0, v[2]], atol=1e-6)


class TestSampling:
    def test_concentric_disk_in_unit(self):
        rs = np.random.RandomState(2)
        u = jnp.asarray(rs.rand(2, 10000), jnp.float32)
        x, y = sampling.concentric_sample_disk(u[0], u[1])
        r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
        assert r2.max() <= 1.0 + 1e-5

    def test_concentric_disk_uniform_over_quadrants(self):
        """Regression: the round-1 mapping used |r| instead of the signed
        radius, collapsing half the square onto the +x/+y quadrants and
        biasing EVERY cosine-sampled direction (caught by reference image
        parity, round 2)."""
        rs = np.random.RandomState(2)
        u = jnp.asarray(rs.rand(2, 100000), jnp.float32)
        x, y = sampling.concentric_sample_disk(u[0], u[1])
        x, y = np.asarray(x), np.asarray(y)
        np.testing.assert_allclose([x.mean(), y.mean()], [0.0, 0.0], atol=5e-3)
        quad = (x > 0).astype(int) * 2 + (y > 0).astype(int)
        counts = np.bincount(quad, minlength=4) / len(x)
        np.testing.assert_allclose(counts, 0.25, atol=0.01)

    def test_concentric_disk_matches_reference_mapping(self):
        """Exact agreement with concentricSampleDisk
        (distributions.cpp:37-70), region by region."""
        import math

        def ref_disk(u0, u1):
            sx, sy = 2 * u0 - 1, 2 * u1 - 1
            if sx == 0 and sy == 0:
                return 0.0, 0.0
            if sx >= -sy:
                if sx > sy:
                    r, th = sx, sy / sx
                else:
                    r, th = sy, 2 - sx / sy
            else:
                if sx > sy:
                    r, th = -sy, 6 + sx / sy
                else:
                    r, th = -sx, 4 + sy / sx
            th *= math.pi / 4
            return r * math.cos(th), r * math.sin(th)

        rs = np.random.RandomState(7)
        u = rs.rand(2, 512).astype(np.float32)
        x, y = sampling.concentric_sample_disk(jnp.asarray(u[0]),
                                               jnp.asarray(u[1]))
        expect = np.array([ref_disk(a, b) for a, b in zip(u[0], u[1])],
                          np.float32)
        np.testing.assert_allclose(
            np.stack([np.asarray(x), np.asarray(y)], axis=1), expect,
            atol=1e-6,
        )

    def test_cosine_hemisphere_distribution(self):
        rs = np.random.RandomState(3)
        u = jnp.asarray(rs.rand(2, 200000), jnp.float32)
        d = sampling.cosine_sample_hemisphere(u[0], u[1])
        z = np.asarray(d[..., 2])
        assert (z >= 0).all()
        # E[cos(theta)] under pdf cos/pi is 2/3.
        np.testing.assert_allclose(z.mean(), 2.0 / 3.0, atol=5e-3)

    def test_uniform_sphere(self):
        rs = np.random.RandomState(4)
        u = jnp.asarray(rs.rand(2, 100000), jnp.float32)
        d = np.asarray(sampling.uniform_sample_sphere(u[0], u[1]))
        np.testing.assert_allclose(
            np.linalg.norm(d, axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_allclose(d.mean(axis=0), [0, 0, 0], atol=1e-2)

    def test_discrete_1d(self):
        w = jnp.array([1.0, 3.0, 0.0, 4.0])
        dist = sampling.build_discrete_1d(w)
        np.testing.assert_allclose(np.asarray(dist.pmf), [1 / 8, 3 / 8, 0, 4 / 8])
        u = jnp.asarray(np.random.RandomState(5).rand(100000), jnp.float32)
        idx, prob, rem = sampling.sample_discrete_1d(dist, u)
        idx = np.asarray(idx)
        counts = np.bincount(idx, minlength=4) / len(idx)
        np.testing.assert_allclose(counts, [1 / 8, 3 / 8, 0, 4 / 8], atol=5e-3)
        assert (np.asarray(rem) >= 0).all() and (np.asarray(rem) < 1).all()

    def test_continuous_1d_pdf_integrates_to_one(self):
        vals = jnp.asarray(np.random.RandomState(6).rand(32), jnp.float32)
        dist = sampling.build_continuous_1d(vals)
        integral = np.asarray(dist.pdf).mean()
        np.testing.assert_allclose(integral, 1.0, rtol=1e-5)

    def test_continuous_2d_sampling_matches_pdf(self):
        rs = np.random.RandomState(7)
        vals = jnp.asarray(rs.rand(8, 16) + 0.1, jnp.float32)
        dist = sampling.build_continuous_2d(vals)
        u = jnp.asarray(rs.rand(2, 100000), jnp.float32)
        x, y, pdf = sampling.sample_continuous_2d(dist, u[0], u[1])
        pdf2 = sampling.pdf_continuous_2d(dist, x, y)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
        # Histogram should match the normalized values.
        hx = (np.asarray(x) * 16).astype(int)
        hy = (np.asarray(y) * 8).astype(int)
        hist = np.zeros((8, 16))
        np.add.at(hist, (hy, hx), 1.0)
        hist /= hist.sum()
        expect = np.asarray(vals) / np.asarray(vals).sum()
        np.testing.assert_allclose(hist, expect, atol=5e-3)

    def test_power_heuristic(self):
        w = sampling.power_heuristic(jnp.array(2.0), jnp.array(1.0))
        np.testing.assert_allclose(float(w), 4.0 / 5.0, rtol=1e-6)
        assert float(sampling.power_heuristic(jnp.array(0.0), jnp.array(0.0))) == 0.0


class TestRNG:
    def test_uniform_range_and_determinism(self):
        pix = jnp.arange(10000, dtype=jnp.uint32)
        u1 = rng.uniform(0, pix, 3, 2, rng.Decision.BSDF_U)
        u2 = rng.uniform(0, pix, 3, 2, rng.Decision.BSDF_U)
        u = np.asarray(u1)
        assert (u >= 0).all() and (u < 1).all()
        np.testing.assert_array_equal(u, np.asarray(u2))

    def test_streams_decorrelated(self):
        pix = jnp.arange(100000, dtype=jnp.uint32)
        a = np.asarray(rng.uniform(0, pix, 0, 0, rng.Decision.BSDF_U))
        b = np.asarray(rng.uniform(0, pix, 0, 0, rng.Decision.BSDF_V))
        c = np.asarray(rng.uniform(0, pix, 0, 1, rng.Decision.BSDF_U))
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.01
        assert abs(np.corrcoef(a, c)[0, 1]) < 0.01
        np.testing.assert_allclose(a.mean(), 0.5, atol=0.01)
        np.testing.assert_allclose(a.var(), 1.0 / 12.0, atol=0.01)


def test_export_continuous_2d_bmp(tmp_path):
    """RegularConstantContinuous2D::exportBMP analogue
    (distributions.cpp:227): the importance table dumps as a valid BMP."""
    import numpy as np
    import jax.numpy as jnp
    from slr_tpu.core.sampling import (build_continuous_2d,
                                       export_continuous_2d_bmp)

    d = build_continuous_2d(
        jnp.asarray(np.random.RandomState(0).rand(8, 16).astype(np.float32)))
    p = str(tmp_path / "dist.bmp")
    export_continuous_2d_bmp(d, p)
    data = open(p, "rb").read()
    assert data[:2] == b"BM" and len(data) > 100
