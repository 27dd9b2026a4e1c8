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
from prysm_tpu.ops import mdft as om
from prysm_tpu.ops.zernike import zernike_sum_pallas
from prysm_tpu.ops.raster import polygon_raster_pallas, circle_raster_pallas


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


def test_mdft2_matches_dense():
    rng = np.random.default_rng(5)
    Ey, Ex, a = _random_problem(rng)
    norm = 0.73
    pack = om.plan_mdft_pack(Ey, Ex, norm)
    out = np.asarray(om.mdft2(pack, jnp.asarray(a)))
    ref = norm * Ey @ a @ Ex.T
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-6


def test_mdft2_adjoint_matches_dense_and_vdot():
    rng = np.random.default_rng(6)
    Ey, Ex, a = _random_problem(rng)
    norm = 1.31
    pack = om.plan_mdft_pack(Ey, Ex, norm)
    g = (rng.standard_normal((16, 24))
         + 1j * rng.standard_normal((16, 24))).astype(np.complex64)
    adj = np.asarray(om.mdft2_adjoint(pack, jnp.asarray(g)))
    ref = norm * Ey.conj().T @ g @ Ex.conj()
    assert np.abs(adj - ref).max() / np.abs(ref).max() < 5e-6
    # <Ax, y> == <x, A^H y>
    Ax = np.asarray(om.mdft2(pack, jnp.asarray(a)))
    lhs = np.vdot(Ax, g)
    rhs = np.vdot(a, adj)
    assert abs(lhs - rhs) / abs(lhs) < 5e-6


def test_mdft2_vjp_matches_jnp_autodiff():
    rng = np.random.default_rng(7)
    Ey, Ex, a = _random_problem(rng)
    pack = om.plan_mdft_pack(Ey, Ex, 0.5)
    Eyj = jnp.asarray(Ey, jnp.complex64)
    Exj = jnp.asarray(Ex, jnp.complex64)
    g1 = jax.grad(lambda v: jnp.sum(jnp.abs(om.mdft2(pack, v)) ** 2))(jnp.asarray(a))
    g2 = jax.grad(lambda v: jnp.sum(jnp.abs(0.5 * Eyj @ v @ Exj.T) ** 2))(jnp.asarray(a))
    g1, g2 = np.asarray(g1), np.asarray(g2)
    assert np.abs(g1 - g2).max() / np.abs(g2).max() < 1e-4


def test_mdft2_batched_field_and_basis():
    rng = np.random.default_rng(8)
    Ey, Ex, a = _random_problem(rng)
    W = 3
    EyW = np.stack([Ey * (k + 1) for k in range(W)])
    pack = om.plan_mdft_pack(EyW, Ex, 1.0)
    aW = np.stack([a, 2 * a, 3 * a])
    out = np.asarray(om.mdft2(pack, jnp.asarray(aW)))
    ref = np.stack([EyW[k] @ aW[k] @ Ex.T for k in range(W)])
    assert np.abs(out - ref).max() / np.abs(ref).max() < 5e-6
    with pytest.raises(ValueError):
        om.mdft2(pack, jnp.asarray(aW[:2]))


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


def test_polygon_raster_matches_geometry():
    from prysm_tpu.coordinates import make_xy_grid
    from prysm_tpu.geometry import polygon_sdf, antialias, _generate_vertices
    x, y = make_xy_grid(80, diameter=2.0)
    dx = float(x[0, 1] - x[0, 0])
    verts = _generate_vertices(6, 0.77, (0.1, -0.06), 9.0)
    mp = np.asarray(polygon_raster_pallas(verts, x, y, dx))
    mj = np.asarray(antialias(polygon_sdf(verts, x, y), dx))
    assert np.abs(mp - mj).max() < 2e-4


def test_circle_raster_matches_geometry_incl_invert():
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    from prysm_tpu.geometry import circle_sdf, antialias
    x, y = make_xy_grid(80, diameter=2.0)
    r, _ = cart_to_polar(x, y)
    dx = float(x[0, 1] - x[0, 0])
    cp = np.asarray(circle_raster_pallas(0.8, r, dx))
    cj = np.asarray(antialias(circle_sdf(0.8, r), dx))
    assert np.abs(cp - cj).max() < 2e-4
    obsc = np.asarray(circle_raster_pallas(0.3, r, dx, invert=True))
    ref = np.asarray(antialias(-circle_sdf(0.3, r), dx))
    assert np.abs(obsc - ref).max() < 2e-4


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

@pytest.mark.parametrize('ps,fs', [((64, 64), (48, 48)),
                                   ((48, 64), (32, 40)),
                                   ((33, 47), (21, 27)),
                                   ((256, 16), (8, 96))])  # x_first False
def test_czt_pallas_matches_plan(interpret_mode, ps, fs):
    from prysm_tpu.propagation import dft
    from prysm_tpu.ops.czt import czt_pallas

    plan = dft.prepare_executor(0.01, ps, 0.4, fs, 0.55, 10.0, kind='czt')
    rng = np.random.default_rng(0)
    E = rng.normal(size=ps) + 1j * rng.normal(size=ps)
    want = np.asarray(plan(jnp.asarray(E)))
    got = np.asarray(czt_pallas(plan, jnp.asarray(E)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def test_czt_pallas_rejects_batched(interpret_mode):
    from prysm_tpu.propagation import dft
    from prysm_tpu.ops.czt import czt_pallas

    plan = dft.prepare_executor(0.01, (16, 16), 0.4, (8, 8), 0.55, 10.0,
                                kind='czt')
    with pytest.raises(ValueError, match='single'):
        czt_pallas(plan, jnp.zeros((2, 16, 16), jnp.complex128))


def _grids(N=192, diameter=2.2):
    from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
    x, y = make_xy_grid(N, diameter=diameter)
    r, t = cart_to_polar(x, y)
    xb, yb = jnp.broadcast_arrays(x, y)
    return xb, yb, r, diameter / N


def test_annulus_raster_matches(interpret_mode):
    from prysm_tpu.ops.raster import annulus_raster_pallas
    from prysm_tpu import geometry as g
    _, _, r, dx = _grids()
    got = np.asarray(annulus_raster_pallas(0.3, 0.9, r, dx))
    want = np.asarray(g.antialias(g.annulus_sdf(0.3, 0.9, r), dx))
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize('angle', [0, 25, 90])
def test_rectangle_raster_matches(interpret_mode, angle):
    from prysm_tpu.ops.raster import rectangle_raster_pallas
    from prysm_tpu import geometry as g
    x, y, _, dx = _grids()
    got = np.asarray(rectangle_raster_pallas(0.5, x, y, dx, height=0.3,
                                             angle=angle))
    want = np.asarray(g.antialias(
        g.rectangle_sdf(0.5, x, y, height=0.3, angle=angle), dx))
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize('sides,rotation', [(6, 0), (6, 10), (5, 33)])
def test_regular_polygon_raster_matches(interpret_mode, sides, rotation):
    from prysm_tpu.ops.raster import regular_polygon_raster_pallas
    from prysm_tpu import geometry as g
    x, y, _, dx = _grids()
    got = np.asarray(regular_polygon_raster_pallas(sides, 0.8, x, y, dx,
                                                   rotation=rotation))
    want = np.asarray(g.antialias(
        g.regular_polygon_sdf(sides, 0.8, x, y, rotation=rotation), dx))
    assert np.abs(got - want).max() < 1e-5


def test_telescope_pupil_raster_matches_csg_chain(interpret_mode):
    from prysm_tpu.ops.raster import telescope_pupil_raster_pallas
    from prysm_tpu import geometry as g
    x, y, r, dx = _grids()
    got = np.asarray(telescope_pupil_raster_pallas(
        x, y, dx, outer_radius=1.0, inner_radius=0.3,
        spider_vanes=4, spider_width=0.05, spider_rotation=15))
    d = g.subtract(g.subtract(g.circle_sdf(1.0, r), g.circle_sdf(0.3, r)),
                   g.spider_sdf(4, 0.05, x, y, rotation=15))
    want = np.asarray(g.antialias(d, dx))
    assert np.abs(got - want).max() < 1e-5


def test_telescope_pupil_unobscured_is_circle(interpret_mode):
    from prysm_tpu.ops.raster import (telescope_pupil_raster_pallas,
                                      circle_raster_pallas)
    x, y, r, dx = _grids()
    got = np.asarray(telescope_pupil_raster_pallas(x, y, dx,
                                                   outer_radius=0.9))
    want = np.asarray(circle_raster_pallas(0.9, r, dx))
    # r arrives f64-then-cast in one path, sqrt(x^2+y^2) in f32 in the other
    assert np.abs(got - want).max() < 1e-5
