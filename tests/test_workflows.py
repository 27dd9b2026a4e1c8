"""End-to-end workflows: phase retrieval and dark-hole optimization.

These exercise the whole chain a user runs — pupil synthesis,
propagation, merit, jax.grad, optym — rather than any one module.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias
from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
from prysm_tpu.propagation import Wavefront, prepare_executor
from prysm_tpu.propagation.dft import focus_dft, coordinates_for_focus
from prysm_tpu.propagation.coronagraph import vortex_phase_mask, babinet
from prysm_tpu.x import optym


@pytest.fixture(scope='module')
def pupil():
    N = 96
    dx = 2.2 / N
    x, y = make_xy_grid(N, diameter=2.2)
    r, t = cart_to_polar(x, y)
    amp = antialias(circle_sdf(1.0, r), dx)
    nms = [(2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0)]
    modes = zernike_nm_seq(nms, r, t)
    return N, dx, amp, modes, r, t


def test_phase_retrieval_recovers_coefficients(pupil):
    """Focus-diverse gradient-based phase retrieval recovers the true
    Zernike coefficients from a cold start (the single-image problem is
    ambiguous; two defocus planes resolve it)."""
    N, dx, amp, modes, r, t = pupil
    wvl, efl = 0.55, 10.0
    plan = prepare_executor(dx, (N, N), 0.3, 48, wvl, efl)
    truth = jnp.asarray([30.0, -12.0, 8.0, 6.0, -5.0, 4.0])
    # diversity: known +/- defocus (Z(2,0)) added between exposures
    defocus = modes[0] * 150.0

    def forward(c, diversity_sign):
        opd = sum_of_2d_modes(modes, c) + diversity_sign * defocus
        wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        return wf.focus_dft(plan).intensity.data

    I_plus = forward(truth, +1.0)
    I_minus = forward(truth, -1.0)

    def loss(c):
        return (jnp.sum((forward(c, +1.0) - I_plus) ** 2)
                + jnp.sum((forward(c, -1.0) - I_minus) ** 2))

    fg = jax.jit(jax.value_and_grad(loss))
    opt = optym.PrysmLBFGSB(lambda c: fg(c), jnp.zeros(6))
    res = optym.run_until(opt, optym.AnyGovernor([
        optym.MaxIterations(300), optym.GradientTolerance(1e-14)]))
    np.testing.assert_allclose(np.asarray(opt.x), np.asarray(truth),
                               atol=1e-3)
    assert res.records[-1].f < 1e-9


def test_dark_hole_optimization_improves_contrast(pupil):
    """Zernike-basis wavefront control against a vortex Lyot coronagraph
    digs the dark-zone energy by >10x."""
    N, dx, amp, modes, r, t = pupil
    wvl, efl = 0.55, 10.0
    fdx, fN = 0.25, 48
    plan = prepare_executor(dx, (N, N), fdx, fN, wvl, efl)
    # evaluate the vortex on the plan's focal grid (um coordinates)
    _, _, fx, fy = coordinates_for_focus(dx, (N, N), fdx, fN, wvl, efl)
    xf = fx * wvl * efl
    yf = fy * wvl * efl
    fxx, fyy = np.meshgrid(xf, yf)
    fpm = jnp.asarray(vortex_phase_mask(2)(fxx, fyy))
    lyot = jnp.asarray(np.asarray(antialias(circle_sdf(0.88, r), dx)))
    # dark zone: annulus in the focal plane, um units
    fr = np.hypot(fxx, fyy)
    dark = jnp.asarray(((fr > 1.5) & (fr < 4.5)).astype(float))

    rng = np.random.default_rng(3)
    aberr = sum_of_2d_modes(modes, jnp.asarray(
        30.0 * rng.standard_normal(modes.shape[0])))

    def coro_dark_energy(c):
        opd = aberr + sum_of_2d_modes(modes, c)
        wf = Wavefront.from_amp_and_phase(amp, opd, wvl, dx)
        field_after_lyot = babinet(wf.data, lyot, fpm, plan)
        img = focus_dft(field_after_lyot, plan)
        return jnp.sum((img.real ** 2 + img.imag ** 2) * dark)

    e0 = float(coro_dark_energy(jnp.zeros(modes.shape[0])))
    fg = jax.jit(jax.value_and_grad(coro_dark_energy))
    opt = optym.PrysmLBFGSB(lambda c: fg(c), jnp.zeros(modes.shape[0]))
    optym.run_until(opt, optym.MaxIterations(80))
    e1 = float(coro_dark_energy(opt.x))
    assert e1 < e0 / 10.0, (e0, e1)
    assert np.isfinite(np.asarray(opt.x)).all()


def test_phase_retrieval_with_prysm_lbfgsb(pupil):
    """The full BLNZ L-BFGS-B drives the phase-retrieval chain with box
    bounds and recovers coefficients from a warm start."""
    N, dx, amp, modes, r, t = pupil
    wvl, efl = 0.55, 10.0
    plan = prepare_executor(dx, (N, N), 0.3, 48, wvl, efl)
    truth = jnp.asarray([30.0, -12.0, 8.0, 6.0, -5.0, 4.0])

    def fwd(c):
        wf = Wavefront.from_amp_and_phase(
            amp, jnp.tensordot(c, modes, axes=(0, 0)), wvl, dx)
        return wf.focus_dft(plan).intensity.data

    I_meas = fwd(truth)

    @jax.jit
    def fg(c):
        return jax.value_and_grad(
            lambda cc: jnp.sum((fwd(cc) - I_meas) ** 2))(c)

    opt = optym.PrysmLBFGSB(fg, truth * 0.8,
                            lower_bounds=np.full(6, -60.0),
                            upper_bounds=np.full(6, 60.0))
    result = optym.run_until(opt, optym.MaxIterations(80))
    np.testing.assert_allclose(np.asarray(result.x), np.asarray(truth),
                               atol=1e-2)


def test_segmented_piston_sensing_workflow():
    """Per-segment piston estimation by gradient descent on the PSF of a
    composite hex aperture — the segmented chain end to end."""
    from prysm_tpu.segmented import CompositeHexagonalAperture

    N = 128
    x, y = make_xy_grid(N, diameter=2.4, host=True)
    dx = 2.4 / N
    cha = CompositeHexagonalAperture(x, y, 1, 0.55, 0.01)
    cha.prepare_opd_bases(zernike_nm_seq, [(0, 0)])
    nseg = len(cha.segment_ids)
    amp = jnp.asarray(cha.amp)
    truth = jnp.asarray(
        np.random.default_rng(3).uniform(-30, 30, (nseg, 1)))

    def fwd(c):
        wf = Wavefront.from_amp_and_phase(amp, cha.compose_opd(c),
                                          0.55, dx)
        return wf.focus(10.0, Q=2).intensity.data

    I_meas = fwd(truth)

    @jax.jit
    def fg(c):
        return jax.value_and_grad(
            lambda cc: jnp.sum((fwd(cc) - I_meas) ** 2) * 1e-6)(c)

    # warm start inside the right basin: intensity-only sensing has a
    # conjugate twin solution that a cold start can fall into
    opt = optym.Adam(lambda c: fg(c), truth * 0.6, alpha=1.0)
    for _ in range(400):
        opt.step()
    got = np.asarray(opt.x) - np.asarray(opt.x).mean()
    want = np.asarray(truth) - np.asarray(truth).mean()
    # piston sensing is global-phase-blind: compare mean-removed pistons
    np.testing.assert_allclose(got, want, atol=1.0)


def test_dark_hole_digging_reduces_contrast(pupil):
    """DM-style coefficient optimization digs a dark hole: mean intensity
    in the target region drops by >10x from the aberrated start."""
    N, dx, amp, modes, r, t = pupil
    wvl, efl = 0.55, 10.0
    fN = 48
    plan = prepare_executor(dx, (N, N), 0.3, fN, wvl, efl)
    fx = (np.arange(fN) - fN // 2) * 0.3
    FX, FY = np.meshgrid(fx, fx)
    hole = jnp.asarray(((np.hypot(FX, FY) > 2.0)
                        & (np.hypot(FX, FY) < 5.0)
                        & (FX > 0)).astype(np.float64))
    aberr = jnp.asarray([10.0, 5.0, -4.0, 3.0, -2.0, 2.0])

    def dark_energy(c):
        wf = Wavefront.from_amp_and_phase(
            amp, jnp.tensordot(aberr + c, modes, axes=(0, 0)), wvl, dx)
        I = wf.focus_dft(plan).intensity.data
        return jnp.sum(I * hole) / jnp.sum(hole)

    e0 = float(dark_energy(jnp.zeros(6)))

    @jax.jit
    def fg(c):
        return jax.value_and_grad(dark_energy)(c)

    opt = optym.PrysmLBFGSB(fg, jnp.zeros(6))
    optym.run_until(opt, optym.MaxIterations(60))
    e1 = float(dark_energy(opt.x))
    # the floor is set by the unaberrated Airy rings in the hole; the
    # optimizer must reach (or beat) the known perfect correction
    e_perfect = float(dark_energy(-aberr))
    assert e1 < e0
    assert e1 <= e_perfect * 1.05
