"""BSDF lobe tests: sample/eval/pdf consistency and energy conservation
(SURVEY.md §4: chi-square/hemisphere checks promoted to automated form)."""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.bsdf import lobes as lb
from slr_tpu.bsdf.fresnel import fresnel_conductor, fresnel_dielectric
from slr_tpu.bsdf.lobes import LobeBatch
from slr_tpu.scene.types import LobeKind


def make_batch(kind, s0=(0.75, 0.75, 0.75), s1=(1.0, 1.0, 1.0),
               s2=(0.0, 0.0, 0.0), f0=0.0, f1=0.0, n=1):
    ones = np.ones((n, 1), np.float32)
    return LobeBatch(
        kind=jnp.full((n,), int(kind), jnp.int32),
        s0=jnp.asarray(ones * np.asarray(s0, np.float32)),
        s1=jnp.asarray(ones * np.asarray(s1, np.float32)),
        s2=jnp.asarray(ones * np.asarray(s2, np.float32)),
        f0=jnp.full((n,), f0, jnp.float32),
        f1=jnp.full((n,), f1, jnp.float32),
    )


class TestFresnel:
    def test_dielectric_normal_incidence(self):
        # R0 = ((n1-n2)/(n1+n2))^2; air->glass 1.5 => 0.04
        f = fresnel_dielectric(
            jnp.ones((1, 3)), jnp.full((1, 3), 1.5), jnp.array([1.0])
        )
        np.testing.assert_allclose(np.asarray(f)[0], 0.04, rtol=1e-3)

    def test_dielectric_tir(self):
        # from inside glass at grazing angle beyond critical: F = 1
        f = fresnel_dielectric(
            jnp.ones((1, 3)), jnp.full((1, 3), 1.5), jnp.array([-0.3])
        )
        np.testing.assert_allclose(np.asarray(f)[0], 1.0)

    def test_conductor_range(self):
        f = fresnel_conductor(
            jnp.full((1, 3), 1.345), jnp.full((1, 3), 7.47),
            jnp.array([0.7]),
        )
        a = np.asarray(f)
        assert (a > 0.8).all() and (a <= 1.0).all()  # aluminium is shiny


class TestLambert:
    def test_eval_value(self):
        b = make_batch(LobeKind.LAMBERT)
        wo = jnp.array([[0.0, 0.0, 1.0]])
        wi = jnp.array([[0.3, 0.0, 0.9539392]])
        fs = lb.lambert_eval(b, wo, wi)
        np.testing.assert_allclose(np.asarray(fs)[0], 0.75 / np.pi, rtol=1e-5)

    def test_eval_opposite_side_zero(self):
        b = make_batch(LobeKind.LAMBERT)
        wo = jnp.array([[0.0, 0.0, 1.0]])
        wi = jnp.array([[0.3, 0.0, -0.95]])
        assert np.asarray(lb.lambert_eval(b, wo, wi)).sum() == 0.0

    def test_sample_pdf_consistency(self):
        n = 10000
        rs = np.random.RandomState(0)
        b = make_batch(LobeKind.LAMBERT, n=n)
        wo = jnp.broadcast_to(jnp.array([0.1, 0.2, 0.97]), (n, 3))
        front = jnp.ones((n,), bool)
        out = lb.lambert_sample(
            b, wo, front, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        wi = np.asarray(out.wi)
        np.testing.assert_allclose(
            np.asarray(out.pdf), np.abs(wi[:, 2]) / np.pi, rtol=1e-4
        )
        pdf2 = lb.lambert_pdf(b, wo, out.wi)
        np.testing.assert_allclose(np.asarray(pdf2), np.asarray(out.pdf), rtol=1e-4)

    def test_white_furnace_rho(self):
        """Integral of fs*cos/pdf over cosine samples == reflectance."""
        n = 200000
        rs = np.random.RandomState(1)
        b = make_batch(LobeKind.LAMBERT, s0=(0.6, 0.6, 0.6), n=n)
        wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        front = jnp.ones((n,), bool)
        out = lb.lambert_sample(
            b, wo, front, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
        )
        est = np.asarray(out.fs)[:, 0] * np.abs(np.asarray(out.wi)[:, 2]) / np.asarray(out.pdf)
        np.testing.assert_allclose(est.mean(), 0.6, rtol=2e-2)


class TestMicrofacet:
    def _batch(self, alpha, n=1, kind=None):
        from slr_tpu.scene.types import LobeKind as LK

        return make_batch(
            kind or LK.MICROFACET_REFLECTION,
            s0=(1, 1, 1), s1=(1.345, 0.965, 0.617), s2=(7.47, 6.40, 5.30),
            f0=alpha, n=n,
        )

    def test_ggx_D_normalization(self):
        """Integral of D(m) cos(m) over the hemisphere must be 1."""
        rs = np.random.RandomState(0)
        n = 200000
        u = rs.rand(2, n).astype(np.float32)
        # uniform hemisphere sampling
        from slr_tpu.core.sampling import uniform_sample_hemisphere

        m = uniform_sample_hemisphere(jnp.asarray(u[0]), jnp.asarray(u[1]))
        alpha = jnp.full((n,), 0.3)
        d = np.asarray(lb.ggx_D(alpha, m))
        integral = (d * np.asarray(m[..., 2])).mean() * 2 * np.pi
        np.testing.assert_allclose(integral, 1.0, rtol=0.05)

    def test_vndf_sample_pdf_consistency(self):
        n = 20000
        rs = np.random.RandomState(1)
        v = jnp.broadcast_to(
            jnp.asarray([0.4, 0.1, np.sqrt(1 - 0.16 - 0.01)], jnp.float32), (n, 3)
        )
        alpha = jnp.full((n,), 0.25)
        m, pdf = lb.ggx_sample_vndf(
            alpha, v, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        pdf2 = np.asarray(lb.ggx_vndf_pdf(alpha, v, m))
        np.testing.assert_allclose(np.asarray(pdf), pdf2, rtol=1e-3)
        assert (np.asarray(m[..., 2]) > 0).all()

    def test_brdf_sample_eval_pdf_agree(self):
        n = 20000
        rs = np.random.RandomState(2)
        b = self._batch(0.3, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.3, -0.2, np.sqrt(1 - 0.13)],
                                          jnp.float32), (n, 3))
        out = lb.microfacet_reflection_sample(
            b, wo, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 0
        pdf2 = np.asarray(lb.microfacet_reflection_pdf(b, wo, out.wi))
        np.testing.assert_allclose(pdf2[ok], np.asarray(out.pdf)[ok], rtol=1e-3)
        fs2 = np.asarray(lb.microfacet_reflection_eval(b, wo, out.wi))
        np.testing.assert_allclose(fs2[ok], np.asarray(out.fs)[ok], rtol=1e-3)

    def test_brdf_energy_bounded(self):
        """fs*cos/pdf estimates of albedo stay <= max Fresnel (~1)."""
        n = 100000
        rs = np.random.RandomState(3)
        b = self._batch(0.4, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        out = lb.microfacet_reflection_sample(
            b, wo, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 0
        est = (
            np.asarray(out.fs)[ok, 0]
            * np.abs(np.asarray(out.wi)[ok, 2])
            / np.asarray(out.pdf)[ok]
        )
        assert est.mean() < 1.0

    def test_rough_glass_snell(self):
        from slr_tpu.scene.types import LobeKind as LK

        n = 4
        b = make_batch(LK.MICROFACET_SCATTERING, s0=(1, 1, 1),
                       s1=(1.0, 1.0, 1.0), s2=(1.5, 1.5, 1.5), f0=1e-3, n=n)
        cos_i = 0.8
        sin_i = np.sqrt(1 - cos_i * cos_i)
        wo = jnp.broadcast_to(jnp.asarray([sin_i, 0, cos_i], jnp.float32), (n, 3))
        hero = jnp.zeros((n,), jnp.int32)
        out = lb.microfacet_scattering_sample(
            b, wo, hero, jnp.full((n,), 0.999), jnp.full((n,), 0.5),
            jnp.full((n,), 0.5)
        )
        wi = np.asarray(out.wi)
        # With nearly-smooth alpha, the refracted direction ~ Snell's law.
        np.testing.assert_allclose(np.abs(wi[:, 0]), sin_i / 1.5, atol=5e-3)
        assert (wi[:, 2] < 0).all()


class TestWardAshikhmin:
    def test_ward_sample_eval_pdf_agree(self):
        from slr_tpu.scene.types import LobeKind as LK

        n = 20000
        rs = np.random.RandomState(4)
        b = make_batch(LK.WARD, s0=(0.7, 0.7, 0.7), f0=0.2, f1=0.1, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, np.sqrt(1 - 0.13)],
                                          jnp.float32), (n, 3))
        out = lb.ward_sample(
            b, wo, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 1e-6
        pdf2 = np.asarray(lb.ward_pdf(b, wo, out.wi))
        np.testing.assert_allclose(pdf2[ok], np.asarray(out.pdf)[ok], rtol=1e-3)
        fs2 = np.asarray(lb.ward_eval(b, wo, out.wi))
        np.testing.assert_allclose(fs2[ok], np.asarray(out.fs)[ok], rtol=1e-3)

    def test_ward_energy_bounded(self):
        from slr_tpu.scene.types import LobeKind as LK

        n = 100000
        rs = np.random.RandomState(5)
        b = make_batch(LK.WARD, s0=(1.0, 1.0, 1.0), f0=0.3, f1=0.3, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        out = lb.ward_sample(
            b, wo, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 1e-6
        est = (
            np.asarray(out.fs)[ok, 0]
            * np.abs(np.asarray(out.wi)[ok, 2])
            / np.asarray(out.pdf)[ok]
        )
        # bounded-albedo Ward: reflectance <= R
        assert est.sum() / n <= 1.02

    def test_ashikhmin_sample_eval_pdf_agree(self):
        from slr_tpu.scene.types import LobeKind as LK

        n = 20000
        rs = np.random.RandomState(6)
        b = make_batch(LK.ASHIKHMIN, s0=(0.1, 0.1, 0.1), s1=(0.6, 0.3, 0.2),
                       f0=100.0, f1=10.0, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, np.sqrt(1 - 0.13)],
                                          jnp.float32), (n, 3))
        front = jnp.ones((n,), bool)
        hero = jnp.zeros((n,), jnp.int32)
        out = lb.ashikhmin_sample(
            b, wo, front, hero, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 1e-6
        pdf2 = np.asarray(lb.ashikhmin_pdf(b, wo, out.wi, hero))
        np.testing.assert_allclose(pdf2[ok], np.asarray(out.pdf)[ok], rtol=1e-3)
        fs2 = np.asarray(lb.ashikhmin_eval(b, wo, out.wi))
        np.testing.assert_allclose(fs2[ok], np.asarray(out.fs)[ok], rtol=1e-3)

    def test_ashikhmin_energy_bounded(self):
        from slr_tpu.scene.types import LobeKind as LK

        n = 100000
        rs = np.random.RandomState(7)
        b = make_batch(LK.ASHIKHMIN, s0=(0.05, 0.05, 0.05), s1=(0.7, 0.7, 0.7),
                       f0=50.0, f1=50.0, n=n)
        wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
        front = jnp.ones((n,), bool)
        hero = jnp.zeros((n,), jnp.int32)
        out = lb.ashikhmin_sample(
            b, wo, front, hero, jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32),
            jnp.asarray(rs.rand(n), jnp.float32)
        )
        ok = np.asarray(out.pdf) > 1e-6
        est = (
            np.asarray(out.fs)[ok, 0]
            * np.abs(np.asarray(out.wi)[ok, 2])
            / np.asarray(out.pdf)[ok]
        )
        assert est.sum() / n <= 1.02


class TestSpecular:
    def test_mirror_direction(self):
        b = make_batch(LobeKind.SPECULAR_REFLECTION, s0=(1, 1, 1),
                       s1=(1.345, 0.965, 0.617), s2=(7.47, 6.40, 5.30))
        wo = jnp.array([[0.5, 0.3, np.sqrt(1 - 0.25 - 0.09)]])
        out = lb.specular_reflection_sample(b, wo)
        wi = np.asarray(out.wi)[0]
        np.testing.assert_allclose(wi[:2], [-0.5, -0.3], atol=1e-6)
        np.testing.assert_allclose(wi[2], np.asarray(wo)[0, 2], atol=1e-6)
        assert bool(out.is_delta[0])

    def test_glass_snell(self):
        b = make_batch(LobeKind.SPECULAR_SCATTERING, s0=(1, 1, 1),
                       s1=(1.0, 1.0, 1.0), s2=(1.5, 1.5, 1.5))
        cos_i = 0.8
        sin_i = np.sqrt(1 - cos_i**2)
        wo = jnp.array([[sin_i, 0.0, cos_i]])
        hero = jnp.array([0])
        # force refraction with u_comp ~ 1
        out = lb.specular_scattering_sample(b, wo, hero, jnp.array([0.999]))
        wi = np.asarray(out.wi)[0]
        sin_t = np.abs(wi[0])
        np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-5)
        assert wi[2] < 0  # transmitted to the lower hemisphere
        assert bool(out.is_transmission[0])

    def test_glass_tir(self):
        b = make_batch(LobeKind.SPECULAR_SCATTERING, s0=(1, 1, 1),
                       s1=(1.0, 1.0, 1.0), s2=(1.5, 1.5, 1.5))
        # from inside glass beyond the critical angle: refraction impossible,
        # Fresnel -> 1 so even u_comp=0.999 lands in the reflection branch
        # (total internal reflection), matching basic_BSDFs.cpp:96-116.
        cos_i = -0.3
        sin_i = np.sqrt(1 - cos_i**2)
        wo = jnp.array([[sin_i, 0.0, cos_i]])
        out = lb.specular_scattering_sample(b, wo, jnp.array([0]), jnp.array([0.999]))
        assert not bool(out.is_transmission[0])
        np.testing.assert_allclose(float(out.pdf[0]), 1.0)
        wi = np.asarray(out.wi)[0]
        np.testing.assert_allclose(wi, [-sin_i, 0.0, cos_i], atol=1e-6)

    def test_glass_energy_split(self):
        """Reflect+refract weights together preserve energy (radiance scaling
        aside): F + (1-F) == 1 at the hero wavelength."""
        b = make_batch(LobeKind.SPECULAR_SCATTERING, s0=(1, 1, 1),
                       s1=(1.0, 1.0, 1.0), s2=(1.5, 1.5, 1.5))
        wo = jnp.array([[0.0, 0.0, 1.0]])
        hero = jnp.array([0])
        out_r = lb.specular_scattering_sample(b, wo, hero, jnp.array([0.0]))
        out_t = lb.specular_scattering_sample(b, wo, hero, jnp.array([0.999]))
        # fs*|cos|/pdf summed over both branches, hero channel:
        er = float(out_r.fs[0, 0]) * 1.0 / float(out_r.pdf[0])
        # transmission: cos_exit = 1, radiance scale (1/1.5^2 entering)
        et = float(out_t.fs[0, 0]) * 1.0 / float(out_t.pdf[0])
        f0 = 0.04
        np.testing.assert_allclose(er * float(out_r.pdf[0]), f0, rtol=2e-2)
        # undo radiance scaling (eta_enter/eta_exit)^2 = 1/2.25
        np.testing.assert_allclose(et * float(out_t.pdf[0]) / (1 / 2.25), 1 - f0,
                                   rtol=2e-2)
