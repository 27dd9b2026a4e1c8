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
