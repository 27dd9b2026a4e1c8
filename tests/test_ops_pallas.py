"""Pallas kernel tests (interpreter mode on CPU).

The kernels in prysm_tpu/ops are the TPU-native equivalents of the
reference's hot loops (SURVEY.md §2.3).  On CPU they run through the Pallas
interpreter, which executes the same kernel logic the Mosaic compiler lowers
on TPU, so these tests validate indexing, accumulation, and VJP algebra;
on-TPU numerics are additionally exercised by the benchmark driver.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.ops import dispatch
from prysm_tpu.ops.zernike import zernike_sum_pallas


@pytest.fixture(autouse=True)
def interpret_mode():
    dispatch.set_pallas_mode('interpret')
    yield
    dispatch.set_pallas_mode('auto')


def test_dispatch_modes():
    dispatch.set_pallas_mode('off')
    assert not dispatch.pallas_enabled()
    dispatch.set_pallas_mode('force')
    assert dispatch.pallas_enabled() and not dispatch.pallas_interpret()
    dispatch.set_pallas_mode('interpret')
    assert dispatch.pallas_enabled() and dispatch.pallas_interpret()
    with pytest.raises(ValueError):
        dispatch.set_pallas_mode('nope')


def _random_problem(rng, My=16, Mx=24, Ny=40, Nx=56):
    Ey = rng.standard_normal((My, Ny)) + 1j * rng.standard_normal((My, Ny))
    Ex = rng.standard_normal((Mx, Nx)) + 1j * rng.standard_normal((Mx, Nx))
    a = (rng.standard_normal((Ny, Nx))
         + 1j * rng.standard_normal((Ny, Nx))).astype(np.complex64)
    return Ey, Ex, a


def test_zernike_sum_pallas_matches_seq():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    rng = np.random.default_rng(9)
    x, y = make_xy_grid(96, diameter=2.0)
    r, t = cart_to_polar(x, y)
    r = r.astype(jnp.float32)
    t = t.astype(jnp.float32)
    nms = [(0, 0), (2, 0), (2, 2), (2, -2), (3, 1), (3, -1), (4, 0),
           (5, 5), (6, -4)]
    coefs = jnp.asarray(rng.standard_normal(len(nms)), jnp.float32)
    zp = np.asarray(zernike_sum_pallas(coefs, nms, r, t))
    zj = np.asarray(sum_of_2d_modes(zernike_nm_seq(nms, r, t), coefs))
    assert np.abs(zp - zj).max() / np.abs(zj).max() < 1e-5


def test_zernike_sum_pallas_vjp_all_args():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    rng = np.random.default_rng(10)
    x, y = make_xy_grid(64, diameter=2.0)
    r, t = cart_to_polar(x, y)
    r = r.astype(jnp.float32)
    t = t.astype(jnp.float32)
    nms = [(2, 0), (3, 3), (4, -2)]
    coefs = jnp.asarray(rng.standard_normal(len(nms)), jnp.float32)

    def lp(c, r, t):
        return jnp.sum(zernike_sum_pallas(c, nms, r, t) ** 2)

    def lj(c, r, t):
        return jnp.sum(sum_of_2d_modes(zernike_nm_seq(nms, r, t), c) ** 2)

    gp = jax.grad(lp, argnums=(0, 1, 2))(coefs, r, t)
    gj = jax.grad(lj, argnums=(0, 1, 2))(coefs, r, t)
    for a, b in zip(gp, gj):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() / max(np.abs(b).max(), 1e-30) < 1e-4


def test_zernike_sum_pallas_norm_off_and_empty():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm
    x, y = make_xy_grid(32, diameter=2.0)
    r, t = cart_to_polar(x, y)
    r = r.astype(jnp.float32)
    t = t.astype(jnp.float32)
    z = zernike_sum_pallas(jnp.asarray([2.0]), [(3, -1)], r, t, norm=False)
    ref = 2.0 * zernike_nm(3, -1, r, t, norm=False)
    assert np.abs(np.asarray(z) - np.asarray(ref)).max() < 1e-5
    empty = zernike_sum_pallas(jnp.zeros(0), [], r, t)
    assert np.all(np.asarray(empty) == 0)


def test_expose_fused_deterministic_chain():
    # zero-signal scene: only bias flows through the deterministic tail
    from prysm_tpu.detector import Detector
    det = Detector(dark_current=0.0, read_noise=0.0, bias=150.0, fwc=120.0,
                   conversion_gain=0.5, bits=8, exposure_time=1.0)
    img = jnp.zeros((40, 52))
    out = np.asarray(det.expose_fused(img, frames=1, seed=3))
    # bias 150 clips at fwc 120, / gain 0.5 -> 240 DN, under the 255 cap
    assert out.shape == (40, 52)
    assert out.dtype == np.uint8
    assert np.all(out == 240)


def test_expose_fused_moments_and_reproducibility():
    from prysm_tpu.detector import Detector
    det = Detector(dark_current=10.0, read_noise=5.0, bias=200.0, fwc=90000.0,
                   conversion_gain=1.0, bits=16, exposure_time=1.0)
    lam = 2000.0
    img = jnp.full((64, 64), lam)
    frames = 24
    out = np.asarray(det.expose_fused(img, frames=frames, seed=7), dtype=np.float64)
    assert out.shape == (frames, 64, 64)
    mean = out.mean()
    var = out.var()
    expect_mean = lam + 10.0 + 200.0
    expect_var = (lam + 10.0) + 5.0 ** 2
    assert abs(mean - expect_mean) / expect_mean < 0.01
    assert abs(var - expect_var) / expect_var < 0.05
    out2 = np.asarray(det.expose_fused(img, frames=frames, seed=7), dtype=np.float64)
    assert np.array_equal(out, out2)
    out3 = np.asarray(det.expose_fused(img, frames=frames, seed=8), dtype=np.float64)
    assert not np.array_equal(out, out3)


def test_zernike_sum_pallas_grads_coefs_mode():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.polynomials import zernike_nm_seq, sum_of_2d_modes
    rng = np.random.default_rng(11)
    x, y = make_xy_grid(64, diameter=2.0)
    r, t = cart_to_polar(x, y)
    r = r.astype(jnp.float32)
    t = t.astype(jnp.float32)
    nms = [(2, 0), (3, 3), (4, -2)]
    coefs = jnp.asarray(rng.standard_normal(len(nms)), jnp.float32)

    def lp(c):
        return jnp.sum(zernike_sum_pallas(c, nms, r, t, grads='coefs') ** 2)

    def lj(c):
        return jnp.sum(sum_of_2d_modes(zernike_nm_seq(nms, r, t), c) ** 2)

    gp = jax.grad(lp)(coefs)
    gj = jax.grad(lj)(coefs)
    assert np.abs(np.asarray(gp) - np.asarray(gj)).max() / np.abs(np.asarray(gj)).max() < 1e-4
    # grid cotangents are declared zero in this mode
    gr = jax.grad(lambda rr: jnp.sum(
        zernike_sum_pallas(coefs, nms, rr, t, grads='coefs')))(r)
    assert np.all(np.asarray(gr) == 0)
    with pytest.raises(ValueError):
        zernike_sum_pallas(coefs, nms, r, t, grads='bogus')


# ---------------------------------------------------------------------------
# round 2: CZT chirp fusion + extended raster shapes
# ---------------------------------------------------------------------------


def _grids(N=192, diameter=2.2):
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    x, y = make_xy_grid(N, diameter=diameter)
    r, t = cart_to_polar(x, y)
    xb, yb = jnp.broadcast_arrays(x, y)
    return xb, yb, r, diameter / N

