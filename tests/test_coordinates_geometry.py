"""Coordinates and geometry vs the reference implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu import coordinates as coords
from prysm_tpu import geometry as geom

import prysm.coordinates as ref_coords
import prysm.geometry as ref_geom


def _grid(n=64, dx=2 / 64):
    x, y = coords.make_xy_grid(n, dx=dx)
    rx, ry = ref_coords.make_xy_grid(n, dx=dx)
    return (x, y), (rx, ry)


def test_make_xy_grid_matches():
    (x, y), (rx, ry) = _grid()
    np.testing.assert_allclose(np.asarray(x), rx)
    np.testing.assert_allclose(np.asarray(y), ry)


def test_cart_to_polar_matches():
    (x, y), (rx, ry) = _grid()
    r, t = coords.cart_to_polar(x, y)
    rr, rt = ref_coords.cart_to_polar(rx, ry)
    np.testing.assert_allclose(np.asarray(r), rr)
    np.testing.assert_allclose(np.asarray(t), rt)


@pytest.mark.parametrize('shape_fn,ref_fn,args', [
    ('circle_sdf', 'circle_sdf', (0.8,)),
    ('annulus_sdf', 'annulus_sdf', (0.3, 0.9)),
])
def test_radial_sdfs_match(shape_fn, ref_fn, args):
    (x, y), (rx, ry) = _grid()
    r, _ = coords.cart_to_polar(x, y)
    rr, _ = ref_coords.cart_to_polar(rx, ry)
    ours = getattr(geom, shape_fn)(*args, r)
    theirs = getattr(ref_geom, ref_fn)(*args, rr)
    np.testing.assert_allclose(np.asarray(ours), theirs)


def test_antialias_circle_matches():
    (x, y), (rx, ry) = _grid()
    dx = 2 / 64
    r, _ = coords.cart_to_polar(x, y)
    rr, _ = ref_coords.cart_to_polar(rx, ry)
    ours = geom.antialias(geom.circle_sdf(0.8, r), dx)
    theirs = ref_geom.antialias(ref_geom.circle_sdf(0.8, rr), dx)
    np.testing.assert_allclose(np.asarray(ours), theirs)


def test_rectangle_sdf_matches():
    (x, y), (rx, ry) = _grid()
    ours = geom.rectangle_sdf(0.4, x, y, height=0.6, angle=23)
    theirs = ref_geom.rectangle_sdf(0.4, rx, ry, height=0.6, angle=23)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-12)


def test_polygon_and_regular_polygon_match():
    (x, y), (rx, ry) = _grid()
    ours = geom.regular_polygon_sdf(6, 0.8, x, y, rotation=10)
    theirs = ref_geom.regular_polygon_sdf(6, 0.8, rx, ry, rotation=10)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-12)


def test_spider_matches():
    (x, y), (rx, ry) = _grid()
    ours = geom.spider_sdf(4, 0.05, x, y, rotation=30)
    theirs = ref_geom.spider_sdf(4, 0.05, rx, ry, rotation=30)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=1e-12)


def test_csg_ops_match():
    (x, y), (rx, ry) = _grid()
    r, _ = coords.cart_to_polar(x, y)
    rr, _ = ref_coords.cart_to_polar(rx, ry)
    d1 = geom.circle_sdf(0.8, r)
    d2 = geom.circle_sdf(0.3, r)
    rd1 = ref_geom.circle_sdf(0.8, rr)
    rd2 = ref_geom.circle_sdf(0.3, rr)
    np.testing.assert_allclose(np.asarray(geom.subtract(d1, d2)),
                               ref_geom.subtract(rd1, rd2))
    np.testing.assert_allclose(np.asarray(geom.union(d1, d2)),
                               ref_geom.union(rd1, rd2))
    np.testing.assert_allclose(np.asarray(geom.intersect(d1, d2)),
                               ref_geom.intersect(rd1, rd2))


def test_rotation_matrix_matches():
    ours = np.asarray(coords.make_rotation_matrix((10, 20, 30)))
    theirs = np.asarray(ref_coords.make_rotation_matrix((10, 20, 30)))
    np.testing.assert_allclose(ours, theirs, atol=1e-14)


def test_apply_homography_matches():
    H = np.asarray(ref_coords.make_rotation_matrix((15, 0, 0)))
    (x, y), (rx, ry) = _grid(16)
    xo, yo = coords.apply_homography(jnp.asarray(H), x, y)
    xr, yr = ref_coords.apply_homography(H, rx, ry)
    np.testing.assert_allclose(np.asarray(xo), xr, atol=1e-13)
    np.testing.assert_allclose(np.asarray(yo), yr, atol=1e-13)


def test_solve_planar_homography_roundtrip():
    src = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.25]])
    dst = src * 1.5 + np.asarray([0.2, -0.1])
    H = np.asarray(coords.solve_for_planar_homography(src, dst))
    Href = np.asarray(ref_coords.solve_for_planar_homography(src, dst))
    np.testing.assert_allclose(H, Href, atol=1e-10)


def test_warp_identity():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((16, 16))
    rows, cols = np.meshgrid(np.arange(16.), np.arange(16.), indexing='ij')
    out = np.asarray(coords.warp(jnp.asarray(img), jnp.asarray(cols), jnp.asarray(rows)))
    np.testing.assert_allclose(out, img, atol=1e-13)


def test_distort_annular_grid_matches():
    r = np.linspace(0, 1, 32)
    ours = np.asarray(coords.distort_annular_grid(jnp.asarray(r), 0.2))
    theirs = np.asarray(ref_coords.distort_annular_grid(r, 0.2))
    np.testing.assert_allclose(ours, theirs)


def test_chebygauss_matches():
    ox, oy = coords.chebygauss_quadrature_xy(5, radius=1.2)
    tx, ty = ref_coords.chebygauss_quadrature_xy(5, radius=1.2)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(tx), atol=1e-12)
    np.testing.assert_allclose(np.asarray(oy), np.asarray(ty), atol=1e-12)


@pytest.mark.parametrize('angle', [0.0, 25.0])
def test_rotated_ellipse_matches(angle):
    (x, y), (rx, ry) = _grid()
    ours = geom.rotated_ellipse_sdf(0.8, 0.4, x, y, major_axis_angle=angle)
    theirs = ref_geom.rotated_ellipse_sdf(0.8, 0.4, rx, ry,
                                          major_axis_angle=angle)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-12)


def test_rectangle_with_corner_fillets_matches():
    (x, y), (rx, ry) = _grid()
    ours = geom.rectangle_with_corner_fillets_sdf(0.7, 0.5, 0.1, x, y)
    theirs = ref_geom.rectangle_with_corner_fillets_sdf(0.7, 0.5, 0.1,
                                                        rx, ry)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-12)


def test_offset_circle_matches():
    (x, y), (rx, ry) = _grid()
    ours = geom.offset_circle(0.4, x, y, center=(0.2, -0.1))
    theirs = ref_geom.offset_circle(0.4, rx, ry, center=(0.2, -0.1))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               atol=1e-12)


def test_gaussian_matches():
    (x, y), (rx, ry) = _grid()
    ours = geom.gaussian(0.3, x, y)
    theirs = ref_geom.gaussian(0.3, rx, ry)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-12)


def test_multisample_matches_antialias_tier():
    """Edge-multisampled membership tracks the SDF antialias within a
    coverage tolerance (they are different estimators of the same edge)."""
    (x, y), _ = _grid()
    r, _ = coords.cart_to_polar(x, y)
    dx = float(x[0, 1] - x[0, 0])
    aa = np.asarray(geom.antialias(geom.circle_sdf(0.8, r), dx))
    ms = np.asarray(geom.multisample(
        lambda xx, yy: (xx * xx + yy * yy) <= 0.8 ** 2, x, y, samples=8))
    assert np.abs(aa - ms).max() < 0.3      # edge pixels only
    # the two estimators agree closely away from the exact edge band
    interior = aa == 1.0
    assert np.abs(aa - ms)[interior].max() < 0.05


def test_rotated_ellipse_rejects_minor_larger_than_major():
    (x, y), _ = _grid()
    with pytest.raises(ValueError, match='major'):
        geom.rotated_ellipse_sdf(0.3, 0.8, x, y)


def test_polygon_sdf_winding_invariant():
    """Reversing the vertex order (CW vs CCW) gives the same SDF."""
    (x, y), _ = _grid()
    verts = np.asarray([[-0.5, -0.4], [0.6, -0.3], [0.4, 0.5], [-0.3, 0.55]])
    fwd = np.asarray(geom.polygon_sdf(verts, x, y))
    rev = np.asarray(geom.polygon_sdf(verts[::-1], x, y))
    np.testing.assert_allclose(fwd, rev, atol=1e-12)
