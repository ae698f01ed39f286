"""Spectral pipeline tests: Meng-Simon upsampling vs its defining properties,
CMF strata reduction, tabulated spectra, and the spectral render path
(SURVEY.md §4(a): spectral upsampling vs the grid tables)."""
import jax.numpy as jnp
import numpy as np
import pytest

from slr_tpu.spectrum import spectral as sp


def dense_lambdas(n=2048):
    """Many stratified wavelength sets for near-exact spectral integrals."""
    rs = np.random.RandomState(0)
    offs = jnp.asarray(rs.rand(n), jnp.float32)
    u = jnp.asarray(rs.rand(n), jnp.float32)
    return sp.sample_wavelengths(offs, u)


class TestWavelengths:
    def test_stratified_layout(self):
        wls = sp.sample_wavelengths(jnp.array([0.5]), jnp.array([0.0]))
        lam = np.asarray(wls.lambdas)[0]
        assert lam.shape == (16,)
        np.testing.assert_allclose(lam[0], 360 + 470 * 0.5 / 16, rtol=1e-5)
        np.testing.assert_allclose(np.diff(lam), 470 / 16, rtol=1e-5)
        np.testing.assert_allclose(float(wls.pdf[0]), 16 / 470, rtol=1e-6)

    def test_hero_selection(self):
        wls = sp.sample_wavelengths(jnp.array([0.1]), jnp.array([0.99]))
        assert int(wls.hero[0]) == 15


class TestUpsampling:
    def test_white_reflectance_is_flat_one(self):
        """rgb (1,1,1) with the EqualEnergyReflectance normalization must
        evaluate to ~1 across the visible range (Spectrum.h:130-133)."""
        wls = dense_lambdas(256)
        spec = sp.rgb_to_spectrum(
            jnp.ones((256, 3)), wls.lambdas, illuminant=False
        )
        vals = np.asarray(spec)
        np.testing.assert_allclose(vals.mean(), 1.0, rtol=0.02)
        assert vals.std() < 0.05

    def test_round_trip_rgb_under_d65(self):
        """RGB reflectance -> spectrum, viewed under D65, -> sensor strata ->
        sRGB is close to the input (the defining property of Meng2015; the
        E-matrix ingest + D65-out chain mirrors the reference's render path
        where reflectances multiply a D65 emitter)."""
        rs = np.random.RandomState(1)
        rgbs = rs.rand(8, 3).astype(np.float32) * 0.8 + 0.1
        n = 4096
        wls = dense_lambdas(n)
        illum = sp.d65_spectrum(wls.lambdas)
        # Normalize D65 so its Y is 1.
        _, yb, _, integral = sp.strata_cmfs()
        illum_strata = np.asarray(
            sp.bin_to_strata(wls.lambdas, illum / (16 / 470.0))
        ).mean(axis=0)
        y_illum = float(illum_strata @ yb) / integral
        for rgb in rgbs:
            spec = sp.rgb_to_spectrum(
                jnp.broadcast_to(jnp.asarray(rgb), (n, 3)), wls.lambdas
            )
            strata = sp.bin_to_strata(
                wls.lambdas, spec * illum / y_illum / (16 / 470.0)
            )
            mean_strata = np.asarray(strata).mean(axis=0)
            out = np.asarray(sp.strata_to_rgb(jnp.asarray(mean_strata)))
            np.testing.assert_allclose(out, rgb, atol=0.1)

    def test_out_of_grid_is_zero(self):
        lam = jnp.broadcast_to(jnp.linspace(360.0, 830.0, 16), (1, 16))
        v = sp.upsample_eval(
            jnp.array([-5.0]), jnp.array([3.0]), jnp.array([1.0]), lam
        )
        np.testing.assert_array_equal(np.asarray(v), 0.0)


class TestTabulated:
    def test_d65_values(self):
        lam = jnp.array([[560.0, 400.0, 700.0]])
        v = np.asarray(sp.d65_spectrum(lam))[0]
        np.testing.assert_allclose(v[0], 100.0, atol=1.0)  # normalized at 560
        assert 80 < v[1] < 90
        assert 65 < v[2] < 80

    def test_ior_curves(self):
        lambdas, etas, ks = sp.ior_spectrum("Glass_BK7")
        # BK7 at ~590nm is ~1.516
        lam = jnp.array([[589.0]])
        v = float(
            np.asarray(sp.eval_irregular_spectrum(
                jnp.asarray(lambdas), jnp.asarray(etas), lam
            ))[0, 0]
        )
        assert 1.51 < v < 1.53

    def test_aluminium_k_large(self):
        lambdas, etas, ks = sp.ior_spectrum("Aluminium")
        lam = jnp.array([[550.0]])
        k = float(np.asarray(sp.eval_irregular_spectrum(
            jnp.asarray(lambdas), jnp.asarray(ks), lam))[0, 0])
        assert 5.0 < k < 8.0


class TestStrata:
    def test_integral_cmf(self):
        xb, yb, zb, integral = sp.strata_cmfs()
        # CIE ybar integrates to ~106.857 over 1nm steps
        np.testing.assert_allclose(integral, 106.857, rtol=0.01)
        assert xb.shape == (16,)

    def test_flat_unit_spectrum_has_unit_luminance(self):
        """Strata store mean spectral radiance (the 16/470 bin width in
        SpectrumStorage::add cancels the selectWLPDF division in the
        estimator): a flat radiance of 1 must develop to Y = 1."""
        strata = jnp.ones((1, 16))
        rgb = np.asarray(sp.strata_to_rgb(strata))[0]
        y = 0.2126729 * rgb[0] + 0.7151522 * rgb[1] + 0.0721750 * rgb[2]
        np.testing.assert_allclose(y, 1.0, rtol=0.02)

    def test_binning_recovers_flat_radiance(self):
        """bin_to_strata of flat radiance 1 (after selectWLPDF division)
        averages to ~1 in every stratum over many passes."""
        wls = dense_lambdas(4096)
        vals = jnp.ones_like(wls.lambdas) / (16.0 / 470.0)
        strata = np.asarray(sp.bin_to_strata(wls.lambdas, vals)).mean(axis=0)
        np.testing.assert_allclose(strata, 1.0, rtol=0.05)


class TestSpectralRender:
    def test_cornell_spectral_smoke(self):
        from slr_tpu.scene.presets import cornell_box_spheres
        from slr_tpu.render.pt import render

        scene = cornell_box_spheres(sphere_res=6, use_bvh=False, spectral=True)
        img = render(scene, 24, 18, spp=2, max_depth=4)
        a = np.asarray(img)
        assert a.shape == (18, 24, 3)
        assert np.isfinite(a).all()
        assert a.mean() > 0.005
        # red wall on the left, blue on the right (in sRGB after reduction)
        left = a[:, :8]
        right = a[:, -8:]
        assert left[..., 0].mean() > left[..., 2].mean()
        assert right[..., 2].mean() > right[..., 0].mean()
