"""Closed-form physics oracles for the remaining subsystems, on-chip f32.

Thin films (quarter-wave AR, Brewster), Zernike orthonormality,
detector bindown/tile adjoint inner products, interferogram statistics
against host-numpy f64, and the coordinate transforms — each with an
oracle that owes nothing to the library's own math.  Every computation
runs inside jit (eager complex / scan / ufunc ops are UNIMPLEMENTED
through the axon relay); only real f32 values are fetched.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def test_quarter_wave_ar_coating_reflectance_on_chip():
    """Single quarter-wave layer: R = ((n0 ns - n1^2)/(n0 ns + n1^2))^2."""
    from prysm_tpu.thinfilm import multilayer_stack_rt
    n0, n1, ns, wvl = 1.0, 1.38, 1.52, 0.55
    t_qw = wvl / (4 * n1)

    @jax.jit
    def R(idx, th):
        r, _ = multilayer_stack_rt(idx, th, wvl, 's', ns, aoi=0.0)
        return jnp.abs(r) ** 2

    got = float(R(jnp.asarray([n1], jnp.float32),
                  jnp.asarray([t_qw], jnp.float32)))
    R_exact = ((n0 * ns - n1 ** 2) / (n0 * ns + n1 ** 2)) ** 2
    assert got == pytest.approx(R_exact, abs=1e-5)


def test_brewster_angle_kills_rp_on_chip():
    """p-pol reflectance vanishes at arctan(n1/n0) for a bare interface.

    Modeled as a vanishing film on the substrate (the characteristic
    matrix of a zero-thickness layer is the identity).
    """
    from prysm_tpu.thinfilm import multilayer_stack_rt, brewsters_angle
    n0, ns = 1.0, 1.5
    theta_b = float(np.degrees(np.arctan2(ns, n0)))

    @jax.jit
    def mags(idx, th):
        r_p, _ = multilayer_stack_rt(idx, th, 0.55, 'p', ns, aoi=theta_b)
        r_s, _ = multilayer_stack_rt(idx, th, 0.55, 's', ns, aoi=theta_b)
        return jnp.abs(r_p), jnp.abs(r_s)

    rp, rs = mags(jnp.asarray([1.3], jnp.float32),
                  jnp.asarray([0.0], jnp.float32))
    assert float(rp) < 1e-5
    assert float(rs) > 0.1
    # and the library's own brewsters_angle agrees with arctan(ns/n0)
    assert float(jax.jit(lambda: brewsters_angle(n0, ns))()) == \
        pytest.approx(theta_b, abs=1e-4)


def test_zernike_orthonormality_on_chip():
    """Unit-rms Zernikes: <Zi Zj> over the disk == delta_ij to O(1/N)."""
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq

    N = 512
    x, y = make_xy_grid(N, diameter=2.0)
    nms = [(1, 1), (2, 0), (2, 2), (3, -1), (4, 0)]

    @jax.jit
    def gram(x, y):
        r, t = cart_to_polar(x, y)
        modes = zernike_nm_seq(nms, r, t)
        inside = (r <= 1.0).astype(modes.dtype)
        npx = jnp.sum(inside)
        flat = (modes * inside).reshape(len(nms), -1)
        return flat @ flat.T / npx

    G = np.asarray(gram(x, y), dtype=np.float64)
    # pixel-quadrature error at 512^2 over the disk is ~1e-2 on the
    # diagonal (edge pixels), much smaller off-diagonal
    np.testing.assert_allclose(G, np.eye(len(nms)), atol=2e-2)


def test_bindown_tile_adjoint_vdot_on_chip():
    """<bindown_sum(x), y> == <x, tile_avg(y)> (plain repetition) at f32."""
    from prysm_tpu.detector import bindown, tile
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((256, 256)).astype(np.float32))
    y = jnp.asarray(rng.random((64, 64)).astype(np.float32))

    @jax.jit
    def both(x, y):
        lhs = jnp.sum(bindown(x, 4, mode='sum') * y)
        rhs = jnp.sum(x * tile(y, 4, scaling='avg'))
        return lhs, rhs

    lhs, rhs = both(x, y)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-5)


def test_interferogram_stats_match_host_numpy_on_chip():
    """pv/rms/Sa computed on-chip agree with host f64 numpy."""
    from prysm_tpu.util import pv, rms, Sa
    rng = np.random.default_rng(11)
    z = rng.normal(scale=30.0, size=(128, 128))
    zd = jnp.asarray(z, jnp.float32)

    @jax.jit
    def stats(zd):
        return pv(zd), rms(zd), Sa(zd)

    pv_, rms_, sa_ = stats(zd)
    assert float(pv_) == pytest.approx(z.max() - z.min(), rel=1e-5)
    assert float(rms_) == pytest.approx(np.sqrt(np.mean(z * z)), rel=1e-4)
    zc = z - z.mean()
    assert float(sa_) == pytest.approx(np.mean(np.abs(zc)), rel=1e-4)


def test_cart_polar_roundtrip_on_chip():
    from prysm_tpu.coordinates import (
        make_xy_grid, cart_to_polar, polar_to_cart)
    x, y = make_xy_grid(128, diameter=2.0)

    @jax.jit
    def roundtrip(x, y):
        r, t = cart_to_polar(x, y)
        x2, y2 = polar_to_cart(r, t)
        return jnp.max(jnp.abs(x2 - x)), jnp.max(jnp.abs(y2 - y))

    dx_, dy_ = roundtrip(x, y)
    assert float(dx_) < 1e-5 and float(dy_) < 1e-5


def test_jacobi_values_match_scipy_on_chip():
    """jacobi(n, a, b) at f32 vs scipy's f64 evaluation (host oracle)."""
    import scipy.special as sps
    from prysm_tpu.polynomials import jacobi

    xs = np.linspace(-1, 1, 257)
    xd = jnp.asarray(xs, jnp.float32)
    for n, (a, b) in [(3, (0.0, 0.0)), (5, (1.0, 2.0)), (8, (0.0, 4.0))]:
        mine = np.asarray(
            jax.jit(lambda x, n=n, a=a, b=b: jacobi(n, a, b, x))(xd),
            dtype=np.float64)
        oracle = sps.eval_jacobi(n, a, b, xs)
        scale = np.abs(oracle).max()
        assert np.abs(mine - oracle).max() / scale < 1e-5, (n, a, b)


def test_smear_jitter_transfer_functions_on_chip():
    """Degradation TFs at DC are exactly 1; jitter follows the Gaussian."""
    from prysm_tpu.degradations import smear_ft, jitter_ft
    fx = np.linspace(-0.5, 0.5, 65).astype(np.float32)
    fxx, fyy = np.meshgrid(fx, fx)
    fxd = jnp.asarray(fxx)
    fyd = jnp.asarray(fyy)

    @jax.jit
    def tfs(fxd, fyd):
        fr = jnp.hypot(fxd, fyd)
        return smear_ft(fxd, fyd, 1.0, 0.0), jitter_ft(fr, 2.0)

    sm, jt = tfs(fxd, fyd)
    sm = np.asarray(sm, dtype=np.float64)
    jt = np.asarray(jt, dtype=np.float64)
    c = 32
    assert sm[c, c] == pytest.approx(1.0, abs=1e-6)
    assert jt[c, c] == pytest.approx(1.0, abs=1e-6)
    f = float(fx[-1])
    expect = np.exp(-2 * (np.pi * 2.0 * f) ** 2)
    assert jt[c, -1] == pytest.approx(expect, rel=1e-3)
