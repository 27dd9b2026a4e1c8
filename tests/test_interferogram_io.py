"""Interferogram analysis + file IO vs the reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu import interferogram as itf
from prysm_tpu import io as tio
from prysm_tpu.interferogram import Interferogram

import prysm.interferogram as ref_itf
import prysm.io as ref_io
from prysm.interferogram import Interferogram as RefInterferogram

DAT = '/root/reference/sample_files/valid_zygo_dat_file.dat'


def test_read_zygo_dat_matches():
    ours = tio.read_zygo_dat(DAT)
    theirs = ref_io.read_zygo_dat(DAT)
    np.testing.assert_allclose(ours['phase'], np.asarray(theirs['phase']),
                               rtol=1e-12, equal_nan=True)
    np.testing.assert_array_equal(ours['intensity'], np.asarray(theirs['intensity']))
    assert ours['meta']['cn_width'] == theirs['meta']['cn_width']
    assert ours['meta']['wavelength'] == pytest.approx(theirs['meta']['wavelength'])


def test_zygo_dat_roundtrip(tmp_path):
    data = tio.read_zygo_dat(DAT)
    phase = data['phase']
    out = tmp_path / 'out.dat'
    tio.write_zygo_dat(out, phase, dx=0.1, wavelength=0.6328)
    back_ref = ref_io.read_zygo_dat(out)  # read our file with the REFERENCE
    # quantization LSB: wavelength_m / 32768 * 1e9 nm ~= 0.0193 nm
    np.testing.assert_allclose(np.asarray(back_ref['phase']), phase,
                               atol=0.02, equal_nan=True)


def test_interferogram_from_dat_stats_match():
    ours = Interferogram.from_zygo_dat(DAT)
    theirs = RefInterferogram.from_zygo_dat(DAT)
    np.testing.assert_allclose(float(ours.pv), float(theirs.pv), rtol=1e-10)
    np.testing.assert_allclose(float(ours.rms), float(theirs.rms), rtol=1e-10)
    np.testing.assert_allclose(float(ours.Sa), float(theirs.Sa), rtol=1e-10)
    np.testing.assert_allclose(float(ours.strehl), float(theirs.strehl), rtol=1e-10)
    np.testing.assert_allclose(ours.dropout_percentage, theirs.dropout_percentage,
                               rtol=1e-10)


def test_interferogram_processing_chain_matches():
    ours = Interferogram.from_zygo_dat(DAT).crop().remove_piston()
    theirs = RefInterferogram.from_zygo_dat(DAT).crop().remove_piston()
    assert ours.data.shape == theirs.data.shape
    np.testing.assert_allclose(np.asarray(ours.data), np.asarray(theirs.data),
                               rtol=1e-8, atol=1e-8, equal_nan=True)
    ours = ours.remove_tiptilt()
    theirs = theirs.remove_tiptilt()
    np.testing.assert_allclose(float(ours.rms), float(theirs.rms), rtol=1e-6)


def test_psd_matches():
    ours = Interferogram.from_zygo_dat(DAT).crop().fill(0)
    theirs = RefInterferogram.from_zygo_dat(DAT).crop().fill(0)
    po = ours.psd()
    pt = theirs.psd()
    np.testing.assert_allclose(np.asarray(po.data), np.asarray(pt.data),
                               rtol=1e-8, atol=1e-10)


def test_bandlimited_rms_matches():
    ours = Interferogram.from_zygo_dat(DAT).crop().fill(0)
    theirs = RefInterferogram.from_zygo_dat(DAT).crop().fill(0)
    o = float(ours.bandlimited_rms(flow=0.1, fhigh=1.0))
    t = float(theirs.bandlimited_rms(flow=0.1, fhigh=1.0))
    np.testing.assert_allclose(o, t, rtol=1e-8)


def test_pvr_matches():
    ours = Interferogram.from_zygo_dat(DAT).crop()
    theirs = RefInterferogram.from_zygo_dat(DAT).crop()
    # square-crop both the same way
    n = min(ours.data.shape)
    ours.data = ours.data[:n, :n]
    theirs.data = np.asarray(theirs.data)[:n, :n]
    np.testing.assert_allclose(float(ours.pvr()), float(theirs.pvr()), rtol=1e-6)


def test_fit_plane_and_sphere_match():
    rng = np.random.default_rng(0)
    x = np.linspace(-1, 1, 32)
    xx, yy = np.meshgrid(x, x)
    z = 3 * xx - 2 * yy + 0.5 * (xx ** 2 + yy ** 2) + 0.01 * rng.standard_normal((32, 32))
    po = np.asarray(itf.fit_plane(jnp.asarray(xx), jnp.asarray(yy), jnp.asarray(z)))
    pr = np.asarray(ref_itf.fit_plane(xx, yy, z))
    np.testing.assert_allclose(po, pr, rtol=1e-8, atol=1e-10)
    mo, so = itf.fit_sphere(jnp.asarray(z))
    mr, sr = ref_itf.fit_sphere(z)
    # the reference returns the sphere compressed to the finite points (1D);
    # ours is the full 2D field -- compare at the same points
    np.testing.assert_allclose(np.asarray(so)[np.asarray(mo)], np.asarray(sr),
                               rtol=1e-8, atol=1e-10)


def test_psd_models_and_synthesis():
    nu = np.logspace(-1, 1, 32)
    np.testing.assert_allclose(np.asarray(itf.abc_psd(jnp.asarray(nu), 10, 1, 2)),
                               np.asarray(ref_itf.abc_psd(nu, 10, 1, 2)), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(itf.ab_psd(jnp.asarray(nu), 10, 2)),
                               np.asarray(ref_itf.ab_psd(nu, 10, 2)), rtol=1e-12)
    # synthesis runs and produces the requested RMS
    x, y, z = itf.render_synthetic_surface(10, 64, rms=5.0, a=1e3, b=1, c=2,
                                           key=jax.random.key(0))
    from prysm_tpu.util import rms as rms_fn
    np.testing.assert_allclose(float(rms_fn(z)), 5.0, rtol=1e-5)


def test_fit_psd_recovers_ab():
    nu = np.logspace(-1, 1, 64)
    truth_a, truth_b = 7.0, 2.5
    psd = ref_itf.ab_psd(nu, truth_a, truth_b)
    a, b = itf.fit_psd(nu, psd, callable=itf.ab_psd)
    np.testing.assert_allclose([a, b], [truth_a, truth_b], rtol=1e-6)


def test_fit_psd_recovers_abc():
    nu = np.logspace(-2, 1, 128)
    truth = (10.0, 0.5, 3.0)
    psd = ref_itf.abc_psd(nu, *truth)
    coefs = itf.fit_psd(nu, psd, callable=itf.abc_psd)
    np.testing.assert_allclose(coefs, truth, rtol=0.05)


def test_designfilt2d_matches():
    x = np.linspace(-1, 1, 32)
    xx, yy = np.meshgrid(x, x)
    r = np.hypot(xx, yy)
    for typ in ('lp', 'hp'):
        Ho = np.asarray(itf.designfilt2d(jnp.asarray(r), 2 / 32, 4.0, typ))
        Hr = np.asarray(ref_itf.designfilt2d(r, 2 / 32, 4.0, typ))
        np.testing.assert_allclose(Ho, Hr, rtol=2e-6, atol=2e-7)
    for typ in ('bp', 'br'):
        Ho = np.asarray(itf.designfilt2d(jnp.asarray(r), 2 / 32, (2.0, 6.0), typ))
        Hr = np.asarray(ref_itf.designfilt2d(r, 2 / 32, (2.0, 6.0), typ))
        np.testing.assert_allclose(Ho, Hr, rtol=2e-6, atol=2e-7)


def test_codev_gridint_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((16, 16)) * 100
    arr[0, 0] = np.nan
    fn = tmp_path / 'test.int'
    tio.write_codev_gridint(arr, fn)
    back_ours, meta_o = tio.read_codev_gridint(fn)
    back_ref, meta_r = ref_io.read_codev_gridint(fn)
    np.testing.assert_allclose(back_ours, np.asarray(back_ref), equal_nan=True)
    assert meta_o['data meaning'] == meta_r['data meaning']
    # quantized to 16 bits; generous tolerance
    np.testing.assert_allclose(back_ours, arr, atol=np.nanmax(np.abs(arr)) / 32000,
                               equal_nan=True)


def test_zygo_ascii_write_parses(tmp_path):
    rng = np.random.default_rng(2)
    phase = rng.standard_normal((8, 8)) * 50
    fn = tmp_path / 'o.asc'
    tio.write_zygo_ascii(fn, phase, dx=0.1)
    fn2 = tmp_path / 'r.asc'
    ref_io.write_zygo_ascii(fn2, phase, dx=0.1)
    # same encoded integer payload (after the 16-line header)
    ours_payload = fn.read_text().splitlines()[16:]
    ref_payload = fn2.read_text().splitlines()[16:]
    assert ours_payload == ref_payload


def test_psd_parseval():
    """The integrated PSD equals the variance of the detrended surface
    (Parseval with the periodogram normalization, no window)."""
    rng = np.random.default_rng(7)
    N, dx = 128, 0.1
    z = rng.standard_normal((N, N))
    z -= z.mean()
    ux, uy, P = itf.psd(jnp.asarray(z), dx, window=jnp.ones((N, N)))
    dux = float(np.asarray(ux).ravel()[1] - np.asarray(ux).ravel()[0])
    duy = dux
    integral = float(jnp.sum(P)) * dux * duy
    var = float(np.var(z))
    np.testing.assert_allclose(integral, var, rtol=1e-6)


def test_interferogram_crop_and_mask_update_stats():
    """Masking NaNs a region out of every statistic; crop shrinks shape."""
    rng = np.random.default_rng(1)
    z = rng.standard_normal((96, 96)) * 20
    ig = itf.Interferogram(phase=jnp.asarray(z), dx=0.1, wavelength=0.6328)
    pv0 = float(ig.pv)
    from prysm_tpu.coordinates import cart_to_polar
    r, _ = cart_to_polar(ig.x, ig.y)
    ig.mask(np.asarray(r) < 3.0)
    assert float(ig.pv) <= pv0
    shape0 = ig.shape
    ig.crop()
    assert ig.shape[0] <= shape0[0] and ig.shape[1] <= shape0[1]


def test_remove_piston_tiptilt_reduce_rms():
    """Detrending always reduces (or holds) the RMS, and zeroes the mean."""
    rng = np.random.default_rng(2)
    y, x = np.mgrid[0:64, 0:64]
    z = 5.0 + 0.3 * x - 0.2 * y + rng.standard_normal((64, 64))
    ig = itf.Interferogram(phase=jnp.asarray(z), dx=0.1, wavelength=0.6328)
    rms0 = float(ig.rms)
    ig.remove_piston()
    assert abs(float(jnp.nanmean(ig.data))) < 1e-9
    ig.remove_tiptilt()
    assert float(ig.rms) < rms0
