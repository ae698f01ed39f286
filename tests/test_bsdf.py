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
