"""Propagation: adjoint identities, executor equivalence, grad oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import (
    Wavefront, focus, unfocus, focus_adjoint, unfocus_adjoint,
    prepare_executor, focus_dft, unfocus_dft, unit_cell_focal_grid,
    angular_spectrum, angular_spectrum_adjoint,
    to_fpm_and_back, babinet, prepare_multiresolution,
    to_fpm_and_back_multiresolution, vortex_phase_mask,
)

import prysm.propagation as ref_prop
from prysm.propagation import Wavefront as RefWavefront


def _rand_cplx(rng, shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_focus_matches_reference():
    rng = np.random.default_rng(0)
    a = _rand_cplx(rng, (32, 32))
    ours = np.asarray(focus(jnp.asarray(a), Q=2))
    theirs = np.asarray(ref_prop.focus(a, Q=2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


def test_unfocus_matches_reference():
    rng = np.random.default_rng(1)
    a = _rand_cplx(rng, (32, 32))
    ours = np.asarray(unfocus(jnp.asarray(a), Q=2))
    theirs = np.asarray(ref_prop.unfocus(a, Q=2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize('fwd,adj,Q', [
    (focus, focus_adjoint, 2),
    (unfocus, unfocus_adjoint, 2),
])
def test_fft_vdot_adjoint(fwd, adj, Q):
    rng = np.random.default_rng(2)
    x = _rand_cplx(rng, (16, 16))
    y = _rand_cplx(rng, (32, 32))
    Ax = np.asarray(fwd(jnp.asarray(x), Q))
    Aty = np.asarray(adj(jnp.asarray(y), Q))
    np.testing.assert_allclose(np.vdot(Ax, y), np.vdot(x, Aty), rtol=1e-12)


def test_angular_spectrum_matches_reference():
    rng = np.random.default_rng(3)
    a = _rand_cplx(rng, (32, 32))
    ours = np.asarray(angular_spectrum(jnp.asarray(a), wvl=0.5, dx=0.1, z=50, Q=2))
    theirs = np.asarray(ref_prop.angular_spectrum(a, wvl=0.5, dx=0.1, z=50, Q=2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_angular_spectrum_vdot_adjoint():
    rng = np.random.default_rng(4)
    x = _rand_cplx(rng, (16, 16))
    y = _rand_cplx(rng, (32, 32))
    Ax = np.asarray(angular_spectrum(jnp.asarray(x), 0.5, 0.1, 33, Q=2))
    Aty = np.asarray(angular_spectrum_adjoint(jnp.asarray(y), 0.5, 0.1, 33, Q=2))
    np.testing.assert_allclose(np.vdot(Ax, y), np.vdot(x, Aty), rtol=1e-12)


def _setup_pupil(N=64, epd=2.0, wvl=0.55):
    x, y = make_xy_grid(N, diameter=epd * 1.1)
    dx = float(x[0, 1] - x[0, 0])
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(epd / 2, r), dx)
    return amp, dx, r, t, x, y


def test_focus_dft_matches_reference_mdft():
    amp, dx, *_ = _setup_pupil()
    wvl, efl = 0.55, 10.0
    fdx, fN = 0.25, 96
    plan = prepare_executor(dx, amp.shape, fdx, fN, wvl, efl)
    ref_ex = ref_prop.prepare_executor(dx, amp.shape, fdx, fN, wvl, efl)
    a = np.asarray(amp) + 0j
    ours = np.asarray(focus_dft(jnp.asarray(a), plan))
    theirs = np.asarray(ref_prop.focus_dft(a, ref_ex))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_fft_equals_mdft_on_compatible_grid():
    """focus(Q=2) == focus_dft on the matched unit-cell grid, up to norms."""
    amp, dx, *_ = _setup_pupil(N=32)
    wvl, efl = 0.55, 10.0
    N = amp.shape[0]
    Q = 2
    # FFT with padding Q: output grid = N*Q samples with spacing efl*wvl/(dx*N*Q)
    fN = N * Q
    fdx = efl * wvl / (dx * fN)
    wf = Wavefront(jnp.asarray(np.asarray(amp) + 0j), wvl, dx, 'pupil')
    via_fft = wf.focus(efl, Q=Q)
    plan = prepare_executor(dx, amp.shape, fdx, fN, wvl, efl)
    via_dft = wf.focus_dft(plan)
    a = np.asarray(via_fft.data)
    b = np.asarray(via_dft.data)
    # normalization differs (ortho vs optical norm); compare after scaling
    scale = np.abs(a).max() / np.abs(b).max()
    np.testing.assert_allclose(np.abs(a), np.abs(b) * scale, rtol=1e-7, atol=1e-9)


def test_jax_grad_matches_reference_manual_adjoint_chain():
    """Phase-retrieval gradient: jax.grad == reference hand-chained adjoints."""
    N = 32
    nms = [(2, 0), (2, 2), (3, 1), (4, 0)]
    amp, dx, r, t, x, y = _setup_pupil(N=N)
    wvl, efl = 0.55, 10.0
    fdx, fN = 0.5, 48
    modes = zernike_nm_seq(nms, r, t)
    coefs0 = jnp.asarray([5.0, -3.0, 2.0, 1.0])

    plan = prepare_executor(dx, amp.shape, fdx, fN, wvl, efl)
    ref_ex = ref_prop.prepare_executor(dx, np.asarray(amp).shape, fdx, fN, wvl, efl)

    rng = np.random.default_rng(7)
    I_meas = rng.random((fN, fN))

    def loss_fn(coefs):
        opd = sum_of_2d_modes(modes, coefs)
        wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        E = wf.focus_dft(plan)
        I = E.intensity.data
        return jnp.sum((I - I_meas) ** 2)

    g_jax = np.asarray(jax.grad(loss_fn)(coefs0))

    # reference manual adjoint chain (SURVEY 3.2)
    modes_np = np.asarray(modes)
    opd = np.tensordot(np.asarray(coefs0), modes_np, axes=(0, 0))
    wf_ref = RefWavefront.from_amp_and_phase(np.asarray(amp), opd, wvl, dx)
    E_ref = wf_ref.focus_dft(ref_ex)
    I_ref = E_ref.intensity.data
    Ibar = 2 * (I_ref - I_meas)
    Ebar = E_ref.intensity_adjoint(Ibar)
    pupil_bar = Ebar.focus_dft_adjoint(ref_ex)
    opd_bar = wf_ref.from_amp_and_phase_adjoint_phase(pupil_bar)
    g_ref = np.tensordot(modes_np, opd_bar, axes=((1, 2), (0, 1)))

    # the reference's adjoint chain leaves the i factor of phase_prefix in the
    # result (from_amp_and_phase_adjoint_phase returns k * imag(...) with
    # k = 1j * 2pi/wvl/1e3, prysm/propagation/wavefront.py:172-188); the true
    # real-valued gradient is its imaginary part.
    np.testing.assert_allclose(g_jax, np.imag(g_ref), rtol=1e-8, atol=1e-10)


def test_to_fpm_and_back_matches_reference():
    amp, dx, r, t, x, y = _setup_pupil(N=32)
    wvl, efl = 0.55, 10.0
    fdx, fN = unit_cell_focal_grid(dx, 2.0, wvl, efl)
    plan = prepare_executor(dx, amp.shape, fdx, fN, wvl, efl)
    ref_ex = ref_prop.prepare_executor(dx, np.asarray(amp).shape, fdx, fN, wvl, efl)
    # opaque spot FPM
    fx, fy = make_xy_grid(fN, dx=fdx)
    rr = np.hypot(np.asarray(fx), np.asarray(fy))
    fpm = (rr > 3 * fdx).astype(float)
    a = np.asarray(amp) + 0j
    ours = np.asarray(to_fpm_and_back(jnp.asarray(a), jnp.asarray(fpm), plan))
    theirs = np.asarray(ref_prop.to_fpm_and_back(a, fpm, ref_ex))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-11)

    ours_b = np.asarray(babinet(jnp.asarray(a), None, jnp.asarray(fpm), plan))
    theirs_b = np.asarray(ref_prop.babinet(a, None, fpm, ref_ex))
    np.testing.assert_allclose(ours_b, theirs_b, rtol=1e-9, atol=1e-11)


def test_multiresolution_matches_reference():
    amp, dx, *_ = _setup_pupil(N=32)
    wvl, efl = 0.55, 10.0
    fdx, fN = unit_cell_focal_grid(dx, 2.0, wvl, efl)
    mrex = prepare_multiresolution(dx, amp.shape, fdx, fN, wvl, efl,
                                   num_levels=3, fine_samples=32)
    ref_mrex = ref_prop.prepare_multiresolution(dx, np.asarray(amp).shape, fdx, fN,
                                                wvl, efl, num_levels=3,
                                                fine_samples=32)
    for w_ours, w_ref in zip(mrex.windows, ref_mrex.windows):
        np.testing.assert_allclose(np.asarray(w_ours), np.asarray(w_ref),
                                   rtol=1e-12, atol=1e-13)
    fpm = vortex_phase_mask(2)
    ref_fpm = ref_prop.vortex_phase_mask(2)
    a = np.asarray(amp) + 0j
    ours = np.asarray(to_fpm_and_back_multiresolution(jnp.asarray(a), fpm, mrex))
    theirs = np.asarray(ref_prop.to_fpm_and_back_multiresolution(a, ref_fpm, ref_mrex))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-11)


def test_wavefront_metadata_roundtrip():
    amp, dx, *_ = _setup_pupil(N=32)
    wvl, efl = 0.55, 10.0
    wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
    assert wf.space == 'pupil'
    focused = wf.focus(efl, Q=2)
    assert focused.space == 'psf'
    back = focused.unfocus(efl, Q=1)
    assert back.space == 'pupil'
    # focus padded 32 -> 64 samples; unfocus on 64 recovers the same spacing
    np.testing.assert_allclose(back.dx, dx, rtol=1e-12)


def test_wavefront_jit_through():
    """Wavefront is a pytree: jit functions can take and return it."""
    amp, dx, *_ = _setup_pupil(N=32)
    wvl = 0.55

    @jax.jit
    def step(wf):
        return (wf * 2.0).data

    wf = Wavefront.from_amp_and_phase(amp, None, wvl, dx)
    out = step(wf)
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(wf.data))


@pytest.mark.parametrize('num_levels,scaling,window', [
    (2, 4.0, (0.2, 0.7)),
    (4, 2.0, (0.2, 0.7)),
    (3, 3.0, (0.3, 0.6)),
    (5, 2.0, (0.2, 0.7)),
])
def test_multiresolution_levels_scaling_sweep(num_levels, scaling, window):
    """Half-pixel shifts + PoU windows hold across level/scale combos.

    VERDICT r1 weak #6: the multiresolution stack must be pinned at more
    than one level-count/scaling pair before coronagraph benches lean on
    it (reference prysm/propagation/dft.py:265-293).
    """
    amp, dx, *_ = _setup_pupil(N=32)
    wvl, efl = 0.55, 10.0
    fdx, fN = unit_cell_focal_grid(dx, 2.0, wvl, efl)
    kwargs = dict(num_levels=num_levels, scaling=scaling, window=window,
                  fine_samples=32)
    mrex = prepare_multiresolution(dx, amp.shape, fdx, fN, wvl, efl,
                                   **kwargs)
    ref_mrex = ref_prop.prepare_multiresolution(
        dx, np.asarray(amp).shape, fdx, fN, wvl, efl, **kwargs)
    assert len(mrex.windows) == len(ref_mrex.windows) == num_levels
    for w_ours, w_ref in zip(mrex.windows, ref_mrex.windows):
        np.testing.assert_allclose(np.asarray(w_ours), np.asarray(w_ref),
                                   rtol=1e-12, atol=1e-13)
    for ex_ours, ex_ref in zip(mrex.executors, ref_mrex.executors):
        assert ex_ours.focal_dx == pytest.approx(ex_ref.focal_dx, rel=1e-12)
    fpm = vortex_phase_mask(2)
    ref_fpm = ref_prop.vortex_phase_mask(2)
    a = np.asarray(amp) + 0j
    ours = np.asarray(to_fpm_and_back_multiresolution(jnp.asarray(a), fpm,
                                                      mrex))
    theirs = np.asarray(ref_prop.to_fpm_and_back_multiresolution(
        a, ref_fpm, ref_mrex))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-11)


def test_pruned_focus_paths_match_dense():
    """The pruned zero-padded FFT path == the dense pad+fft2 sandwich."""
    import math
    from prysm_tpu.propagation import fft as pfft
    from prysm_tpu.fttools import pad2d, crop_center

    rng = np.random.default_rng(9)
    for N, Q in ((32, 2), (64, 2), (32, 4)):
        E = jnp.asarray(rng.normal(size=(N, N))
                        + 1j * rng.normal(size=(N, N)))
        geom = pfft._pruned_geometry((N, N), Q)
        assert geom is not None

        dense_f = jnp.fft.fftshift(pfft._norm_ortho_fft2(
            jnp.fft.ifftshift(pad2d(E, Q), axes=(-2, -1))), axes=(-2, -1))
        np.testing.assert_allclose(np.asarray(pfft.focus(E, Q)),
                                    np.asarray(dense_f),
                                    rtol=1e-12, atol=1e-13)

        dense_u = jnp.fft.fftshift(pfft._norm_ortho_ifft2(
            jnp.fft.ifftshift(pad2d(E, Q), axes=(-2, -1))), axes=(-2, -1))
        np.testing.assert_allclose(np.asarray(pfft.unfocus(E, Q)),
                                    np.asarray(dense_u),
                                    rtol=1e-12, atol=1e-13)

        M = geom[0]
        X = jnp.asarray(rng.normal(size=(M, M))
                        + 1j * rng.normal(size=(M, M)))
        dense_fa = crop_center(jnp.fft.fftshift(pfft._norm_ortho_ifft2(
            jnp.fft.ifftshift(X, axes=(-2, -1))), axes=(-2, -1)), (N, N))
        np.testing.assert_allclose(np.asarray(pfft.focus_adjoint(X, Q)),
                                    np.asarray(dense_fa),
                                    rtol=1e-12, atol=1e-13)

        dense_ua = crop_center(jnp.fft.fftshift(pfft._norm_ortho_fft2(
            jnp.fft.ifftshift(X, axes=(-2, -1))), axes=(-2, -1)), (N, N))
        np.testing.assert_allclose(np.asarray(pfft.unfocus_adjoint(X, Q)),
                                    np.asarray(dense_ua),
                                    rtol=1e-12, atol=1e-13)

    # odd sizes fall back to the dense path and still work
    E = jnp.asarray(rng.normal(size=(31, 31)) + 0j)
    out = pfft.focus(E, 2)
    assert out.shape == (62, 62)

    # batched leading axes ride along
    EB = jnp.asarray(rng.normal(size=(3, 32, 32)) + 0j)
    outB = pfft.focus(EB, 2)
    np.testing.assert_allclose(np.asarray(outB[1]),
                                np.asarray(pfft.focus(EB[1], 2)),
                                rtol=1e-12, atol=1e-13)


def test_mtf_rfft_fast_path_matches_dense():
    """The real-input rfft2+mirror MTF == the complex-transform MTF."""
    from prysm_tpu.otf import mtf_from_psf, _normalized_transform

    rng = np.random.default_rng(4)
    for shape in ((64, 64), (32, 48), (3, 64, 64)):
        psf = jnp.asarray(rng.random(shape))
        fast = np.asarray(mtf_from_psf(psf, 1.0).data)
        normalized, _, _ = _normalized_transform(psf, 1.0)
        dense = np.abs(np.asarray(normalized))
        np.testing.assert_allclose(fast, dense, rtol=1e-10, atol=1e-12)
    # odd sizes fall back to the dense path
    psf = jnp.asarray(rng.random((33, 33)))
    rd = mtf_from_psf(psf, 1.0)
    c = rd.shape[0] // 2
    assert float(rd.data[c, c]) == 1.0
