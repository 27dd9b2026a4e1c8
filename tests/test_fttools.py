"""fttools: grid conventions, pad/crop, and executor equivalence vs reference."""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu import fttools as ft

import prysm.fttools as ref_ft


@pytest.mark.parametrize('n', [3, 4, 7, 8, 129, 256])
def test_fftrange_matches_reference(n):
    ours = np.asarray(ft.fftrange(n))
    theirs = np.asarray(ref_ft.fftrange(n))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize('shape,Q,out_shape', [
    ((8, 8), 2, None),
    ((9, 9), 2, None),
    ((8, 8), 1.5, None),
    ((8, 8), 1, 13),
    ((7, 9), 1, (12, 14)),
])
def test_pad2d_matches_reference(shape, Q, out_shape):
    rng = np.random.default_rng(1234)
    a = rng.standard_normal(shape)
    ours = np.asarray(ft.pad2d(jnp.asarray(a), Q=Q, out_shape=out_shape))
    theirs = np.asarray(ref_ft.pad2d(a, Q=Q, out_shape=out_shape))
    np.testing.assert_allclose(ours, theirs)


@pytest.mark.parametrize('shape,out', [((16, 16), 7), ((16, 16), 8), ((15, 13), (9, 6))])
def test_crop_center_matches_reference(shape, out):
    rng = np.random.default_rng(55)
    a = rng.standard_normal(shape)
    ours = np.asarray(ft.crop_center(jnp.asarray(a), out))
    theirs = np.asarray(ref_ft.crop_center(a, out))
    np.testing.assert_allclose(ours, theirs)


def test_pad_crop_adjoint_pair():
    """<pad(x), y> == <x, crop(y)> for all shapes: pad/crop are adjoints."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((9, 9))
    y = rng.standard_normal((18, 18))
    px = np.asarray(ft.pad2d(jnp.asarray(x), Q=2))
    cy = np.asarray(ft.crop_center(jnp.asarray(y), (9, 9)))
    np.testing.assert_allclose(np.vdot(px, y), np.vdot(x, cy), rtol=1e-13)


def _mk_coords(Np=32, Mf=48, dx=0.1, dfx=0.7):
    x = np.asarray(ref_ft.fftrange(Np), dtype=np.float64) * dx
    fx = np.asarray(ref_ft.fftrange(Mf), dtype=np.float64) * dfx * 1e-2
    return x, fx


@pytest.mark.parametrize('planner,refcls', [
    (ft.plan_mdft, ref_ft.MDFT),
    (ft.plan_czt, ref_ft.CZT),
])
def test_executor_forward_and_adjoint_match_reference(planner, refcls):
    rng = np.random.default_rng(99)
    x, fx = _mk_coords()
    y, fy = _mk_coords(24, 40)
    a = rng.standard_normal((24, 32)) + 1j * rng.standard_normal((24, 32))
    g = rng.standard_normal((40, 48)) + 1j * rng.standard_normal((40, 48))

    plan = planner(x, y, fx, fy, norm=1.37)
    refex = refcls(x, y, fx, fy, norm=1.37)

    np.testing.assert_allclose(np.asarray(plan(jnp.asarray(a))), refex(a),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(plan.adjoint(jnp.asarray(g))), refex.adjoint(g),
                               rtol=1e-10, atol=1e-12)


def test_fftdft_matches_reference():
    rng = np.random.default_rng(3)
    N = 16
    K = 32
    x = np.asarray(ref_ft.fftrange(N), dtype=np.float64)
    fx = np.asarray(ref_ft.fftrange(24), dtype=np.float64) / K
    a = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    g = rng.standard_normal((24, 24)) + 1j * rng.standard_normal((24, 24))

    plan = ft.plan_fftdft(x, x, fx, fx)
    refex = ref_ft.FFTDFT(x, x, fx, fx)
    np.testing.assert_allclose(np.asarray(plan(jnp.asarray(a))), refex(a),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(plan.adjoint(jnp.asarray(g))), refex.adjoint(g),
                               rtol=1e-10, atol=1e-12)


def test_executor_vdot_adjoint_identity():
    """<A x, y> == <x, A^H y> for the MDFT plan."""
    rng = np.random.default_rng(42)
    x, fx = _mk_coords()
    y, fy = _mk_coords(24, 40)
    plan = ft.plan_mdft(x, y, fx, fy, norm=0.77)
    a = rng.standard_normal((24, 32)) + 1j * rng.standard_normal((24, 32))
    g = rng.standard_normal((40, 48)) + 1j * rng.standard_normal((40, 48))
    lhs = np.vdot(np.asarray(plan(jnp.asarray(a))), g)
    rhs = np.vdot(a, np.asarray(plan.adjoint(jnp.asarray(g))))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_executor_batched():
    """Leading batch axes broadcast through every executor."""
    rng = np.random.default_rng(8)
    x, fx = _mk_coords(16, 20)
    plan = ft.plan_mdft(x, x, fx, fx)
    batch = rng.standard_normal((3, 16, 16)) + 1j * rng.standard_normal((3, 16, 16))
    out = np.asarray(plan(jnp.asarray(batch)))
    for i in range(3):
        np.testing.assert_allclose(out[i], np.asarray(plan(jnp.asarray(batch[i]))),
                                   rtol=1e-12)


def test_fourier_resample_matches_reference():
    import prysm.conf
    rng = np.random.default_rng(11)
    f = rng.standard_normal((16, 16))
    ours = np.asarray(ft.fourier_resample(jnp.asarray(f), 2))
    theirs = np.asarray(ref_ft.fourier_resample(f, 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-11)


def test_czt_equals_mdft():
    rng = np.random.default_rng(5)
    x, fx = _mk_coords(16, 20)
    m = ft.plan_mdft(x, x, fx, fx)
    c = ft.plan_czt(x, x, fx, fx)
    a = rng.standard_normal((16, 16)) + 1j * rng.standard_normal((16, 16))
    np.testing.assert_allclose(np.asarray(m(jnp.asarray(a))), np.asarray(c(jnp.asarray(a))),
                               rtol=1e-8, atol=1e-10)


def test_stack_czt_plans_matches_per_plan():
    """The batched spectral CZT equals the per-wavelength loop exactly."""
    from prysm_tpu.propagation import prepare_executor
    rng = np.random.default_rng(13)
    N, fN = 64, 32
    dx, fdx = 2.2 / N, 0.25
    wvls = [0.50, 0.55, 0.60]
    plans = tuple(prepare_executor(dx, (N, N), fdx, fN, w, 10.0, kind='czt')
                  for w in wvls)
    sp = ft.stack_czt_plans(plans)
    E = jnp.asarray(rng.standard_normal((N, N))
                    + 1j * rng.standard_normal((N, N)))
    per = np.stack([np.asarray(p(E)) for p in plans])
    bat = np.asarray(sp(jnp.broadcast_to(E, (3, N, N))))
    np.testing.assert_allclose(bat, per, rtol=1e-12, atol=1e-13)
    G = jnp.asarray(rng.standard_normal((3, fN, fN))
                    + 1j * rng.standard_normal((3, fN, fN)))
    per_a = np.stack([np.asarray(p.adjoint(G[i]))
                      for i, p in enumerate(plans)])
    np.testing.assert_allclose(np.asarray(sp.adjoint(G)), per_a,
                               rtol=1e-12, atol=1e-13)


def test_stack_czt_plans_rejects_mismatched_geometry():
    from prysm_tpu.propagation import prepare_executor
    a = prepare_executor(0.01, (32, 32), 0.25, 16, 0.55, 10.0, kind='czt')
    b = prepare_executor(0.01, (32, 32), 0.25, 24, 0.55, 10.0, kind='czt')
    with pytest.raises(ValueError, match='geometry'):
        ft.stack_czt_plans((a, b))
    with pytest.raises(ValueError, match='at least one'):
        ft.stack_czt_plans(())


def test_babinet_compact_focal_window_is_exact():
    """Babinet with the focal window cropped to the complement's support
    equals the full-window propagation (1 - fpm is identically zero
    outside the occulting disk, so the clipped frequencies contribute
    nothing)."""
    from prysm_tpu.propagation import prepare_executor
    from prysm_tpu.propagation.coronagraph import babinet
    N, fN, wN = 128, 64, 24
    dx, fdx = 2.2 / N, 0.25
    r_occ = 2.0  # occulting radius: 8 px < 12 px half-window

    def fpm_for(n):
        fx, fy = np.meshgrid(*[(np.arange(n) - n // 2) * fdx] * 2,
                             indexing='xy')
        return jnp.asarray((np.hypot(fx, fy) > r_occ).astype(float))

    rng = np.random.default_rng(17)
    E = jnp.asarray(rng.standard_normal((N, N))
                    + 1j * rng.standard_normal((N, N)))
    full = babinet(E, lyot=None, fpm=fpm_for(fN),
                   executor=prepare_executor(dx, (N, N), fdx, fN, 0.55,
                                             10.0, kind='czt'))
    windowed = babinet(E, lyot=None, fpm=fpm_for(wN),
                       executor=prepare_executor(dx, (N, N), fdx, wN, 0.55,
                                                 10.0, kind='mdft'))
    np.testing.assert_allclose(np.asarray(windowed), np.asarray(full),
                               rtol=1e-10, atol=1e-11)


@pytest.mark.parametrize('n', [8, 9])
def test_mdft_on_aligned_grid_equals_fft(n):
    """With fftrange coords and the matching frequency grid, the matrix
    DFT reproduces fftshift(fft2(ifftshift(.))) exactly (reference
    test_mtp_equivalent_to_fft)."""
    rng = np.random.default_rng(91)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    dx = 0.3
    x = np.asarray(ft.fftrange(n), dtype=np.float64) * dx
    f = np.asarray(ft.fftrange(n), dtype=np.float64) / (n * dx)
    plan = ft.plan_mdft(x, x, f, f, sign=-1, norm=1.0, dtype=np.complex128)
    ours = np.asarray(plan(jnp.asarray(a)))
    theirs = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(a)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-11)


def test_mdft_unitary_geometry_reverses_self():
    """adjoint(forward(x)) == x when the plan is unitary (full-cell
    frequency window, norm 1/N; reference test_mtp_reverses_self)."""
    n = 16
    rng = np.random.default_rng(17)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    dx = 0.25
    x = np.asarray(ft.fftrange(n), dtype=np.float64) * dx
    f = np.asarray(ft.fftrange(n), dtype=np.float64) / (n * dx)
    plan = ft.plan_mdft(x, x, f, f, norm=1.0 / n, dtype=np.complex128)
    back = np.asarray(plan.adjoint(plan(jnp.asarray(a))))
    np.testing.assert_allclose(back, a, rtol=1e-11, atol=1e-12)


def test_plan_nbytes_reports_tabulated_storage():
    """nbytes() counts the complex basis/phase tables (reference
    test_mdft_nbytes_reports_basis_size / test_fftdft_nbytes...)."""
    Nx, Ny, Mx, My = 8, 12, 10, 6
    dx = 0.5
    x = np.asarray(ft.fftrange(Nx)) * dx
    y = np.asarray(ft.fftrange(Ny)) * dx
    fx = np.asarray(ft.fftrange(Mx)) * 0.01
    fy = np.asarray(ft.fftrange(My)) * 0.01
    plan = ft.plan_mdft(x, y, fx, fy, dtype=np.complex128)
    itemsize = plan.Ex_re.dtype.itemsize
    assert plan.nbytes() == (Mx * Nx + My * Ny) * 2 * itemsize
    czt = ft.plan_czt(x, y, fx, fy, dtype=np.complex128)
    assert czt.nbytes() > 0
    n = 8
    xf = np.asarray(ft.fftrange(n), dtype=np.float64) * dx
    ff = np.asarray(ft.fftrange(n), dtype=np.float64) / (n * dx)
    fdft = ft.plan_fftdft(xf, xf, ff, ff, dtype=np.complex128)
    assert fdft.nbytes() > 0


def test_fftdft_rejects_incompatible_or_nonuniform_grids():
    n = 8
    dx = 0.5
    x = np.asarray(ft.fftrange(n), dtype=np.float64) * dx
    f_good = np.asarray(ft.fftrange(n), dtype=np.float64) / (n * dx)
    bad = x.copy()
    bad[3] += 0.05
    with pytest.raises(ValueError, match='uniformly spaced'):
        ft.plan_fftdft(bad, x, f_good, f_good)
    f_bad = np.asarray(ft.fftrange(n), dtype=np.float64) * (0.7 / (n * dx))
    with pytest.raises(ValueError, match='FFT-compatible'):
        ft.plan_fftdft(x, x, f_bad, f_good)
    f_short = np.asarray(ft.fftrange(n), dtype=np.float64) / (4 * dx)
    with pytest.raises(ValueError, match='smaller than'):
        ft.plan_fftdft(x, x, f_short, f_good)
