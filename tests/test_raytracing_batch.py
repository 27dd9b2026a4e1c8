"""Device-resident batched raytrace analysis vs the host path."""
import numpy as onp
import pytest

import jax  # NOQA: F401  (platform selection through conftest)

import prysm_tpu.x.raytracing as rt
import prysm_tpu.x.materials as mat
from prysm_tpu.x.raytracing.batch import (
    device_wavefront_fit, merged_trace, unmerge)
from prysm_tpu.x.raytracing.analysis import wavefront_zernike_fit

WVLS = [0.4861, 0.5876, 0.6563]
NMS = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]


def _system(wavelengths=None):
    bk7 = mat.model_glass(1.5168, 64.17, name='BK7ish')
    sf5 = mat.model_glass(1.6727, 32.2, name='SF5ish')
    lens = rt.LensData()
    lens.add(rt.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(rt.Sphere(-1 / 128.0), thickness=95.0, material=mat.air)
    sys_ = rt.OpticalSystem(lens, aperture=rt.ApertureSpec.epd(20.0),
                            fields=[0.0, 1.0, 2.0],
                            wavelengths=wavelengths or WVLS,
                            stop_index=1)
    sys_.solve.image_distance()
    return sys_


def test_device_fit_matches_host_chain():
    """(W, F, K) coefficients equal the host launch->wavefront->fit chain."""
    sys_ = _system()
    samp = rt.Sampling.hex(6)
    NR = 10.0
    coefs, rms = device_wavefront_fit(sys_, NMS, sampling=samp,
                                      normalization_radius=NR)
    coefs, rms = onp.asarray(coefs), onp.asarray(rms)
    assert coefs.shape == (3, 3, len(NMS))
    for iw, w in enumerate(WVLS):
        for if_ in range(3):
            f = sys_.fields[if_]
            P, S = rt.launch(sys_, f, w, samp)
            opd, up, vp = rt.wavefront(sys_, P, S, w, field=f)
            want, want_rms = wavefront_zernike_fit(
                opd, up, vp, NMS, normalization_radius=NR)
            scale = max(float(onp.abs(want).max()), 1e-9)
            onp.testing.assert_allclose(coefs[iw, if_], want,
                                        atol=1e-8 * scale, rtol=1e-7)
            assert rms[iw, if_] == pytest.approx(want_rms, rel=1e-6,
                                                 abs=1e-12)


def test_merged_trace_matches_per_field():
    """The F*N merged bundle reproduces each per-field trace."""
    sys_ = _system()
    samp = rt.Sampling.hex(5)
    wls, results = merged_trace(sys_, sampling=samp)
    for iw, w in enumerate(wls):
        Pm = onp.asarray(unmerge(results[iw].P, 3))
        for if_ in range(3):
            P0, S0 = rt.launch(sys_, sys_.fields[if_], float(w), samp)
            single = rt.raytrace(sys_.to_surfaces(), P0, S0, float(w))
            onp.testing.assert_allclose(
                Pm[:, if_], onp.asarray(single.P), atol=1e-10,
                equal_nan=True)


def test_device_fit_handles_vignetted_rays():
    """Dead rays drop out of the fit (weight zero), not poison it."""
    sys_ = _system()
    # clip the first surface so edge rays die
    sys_.lens.rows[1].aperture = rt.circular_aperture(8.0)
    samp = rt.Sampling.hex(6)
    coefs, rms = device_wavefront_fit(sys_, NMS, sampling=samp,
                                      normalization_radius=10.0)
    assert onp.all(onp.isfinite(onp.asarray(coefs)))
    assert onp.all(onp.isfinite(onp.asarray(rms)))


def test_merged_trace_matches_per_field_loop():
    """The merged (F*N) bundle reproduces per-field traces exactly."""
    import jax.numpy as jnp
    from prysm_tpu.x.raytracing.batch import merged_trace, unmerge
    from prysm_tpu.x.raytracing.spencer_and_murty import raytrace

    sys_ = _system()
    samp = rt.Sampling.hex(4)
    wvls, results = merged_trace(sys_, sampling=samp)
    res = results[0]
    fields = list(sys_.fields)
    F = len(fields)
    P_merged = unmerge(res.P, F)
    surfaces = sys_.to_surfaces()
    for i, f in enumerate(fields):
        P, S = rt.launch(sys_, f, float(wvls[0]), samp)
        single = raytrace(surfaces, jnp.asarray(onp.asarray(P)),
                          jnp.asarray(onp.asarray(S)), float(wvls[0]))
        onp.testing.assert_allclose(onp.asarray(P_merged[:, i]),
                                    onp.asarray(single.P),
                                    rtol=1e-12, atol=1e-12)


def test_device_fit_multiwavelength_shapes_and_dispersion():
    """(W, F, K) output shapes; defocus coefficient moves with wavelength
    through the glass dispersion."""
    sys_ = _system(wavelengths=[0.48, 0.5876, 0.65])
    coefs, rms = device_wavefront_fit(sys_, NMS, sampling=rt.Sampling.hex(5))
    W = 3
    F = len(list(sys_.fields))
    assert coefs.shape[:2] == (W, F)
    assert rms.shape == (W, F)
    focus_idx = NMS.index((2, 0)) if (2, 0) in NMS else 0
    defocus = onp.asarray(coefs)[:, 0, focus_idx]
    # dispersion: blue and red focus differ (mm-scale OPD, small but real)
    assert abs(defocus[0] - defocus[2]) > 3e-5
