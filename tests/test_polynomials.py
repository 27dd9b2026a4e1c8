"""Polynomials vs the reference implementation and autodiff checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu import polynomials as poly

import prysm.polynomials as ref_poly
from prysm.polynomials import zernike as ref_zernike


XS = np.linspace(-1, 1, 64)


@pytest.mark.parametrize('n', [0, 1, 2, 3, 5, 10])
@pytest.mark.parametrize('ab', [(0, 0), (0, 2), (1.5, 0.5)])
def test_jacobi_matches(n, ab):
    a, b = ab
    ours = np.asarray(poly.jacobi(n, a, b, jnp.asarray(XS)))
    theirs = np.asarray(ref_poly.jacobi(n, a, b, XS))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


def test_jacobi_seq_matches():
    ns = [1, 2, 3, 5, 8]
    ours = np.asarray(poly.jacobi_seq(ns, 0, 2, jnp.asarray(XS)))
    theirs = np.asarray(ref_poly.jacobi_seq(ns, 0, 2, XS))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize('n', [0, 1, 2, 4, 7])
def test_jacobi_der_matches(n):
    ours = np.asarray(poly.jacobi_der(n, 0, 1, jnp.asarray(XS)))
    theirs = np.asarray(ref_poly.jacobi_der(n, 0, 1, XS))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


def test_jacobi_der_seq_matches():
    ns = [0, 1, 3, 6]
    ours = np.asarray(poly.jacobi_der_seq(ns, 0, 1, jnp.asarray(XS)))
    theirs = np.asarray(ref_poly.jacobi_der_seq(ns, 0, 1, XS))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


def test_jacobi_sum_clenshaw_matches():
    s = [0.5, -1.0, 2.0, 0.25, -0.7]
    ours = np.asarray(poly.jacobi_sum_clenshaw(s, 0, 2, jnp.asarray(XS)))
    from prysm.polynomials.jacobi import jacobi_sum_clenshaw as ref_jsc
    theirs = np.asarray(ref_jsc(s, 0, 2, XS))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


NMS = [(0, 0), (1, 1), (1, -1), (2, 0), (2, 2), (2, -2), (3, 1), (3, -1),
       (4, 0), (5, 3), (6, -4), (8, 0)]


def _polar_grid(n=32):
    x = np.linspace(-1, 1, n)
    xx, yy = np.meshgrid(x, x)
    r = np.hypot(xx, yy)
    t = np.arctan2(yy, xx)
    return r, t, xx, yy


@pytest.mark.parametrize('nm', NMS)
@pytest.mark.parametrize('norm', [True, False])
def test_zernike_nm_matches(nm, norm):
    r, t, _, _ = _polar_grid()
    ours = np.asarray(poly.zernike_nm(*nm, jnp.asarray(r), jnp.asarray(t), norm=norm))
    theirs = np.asarray(ref_poly.zernike_nm(*nm, r, t, norm=norm))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_zernike_nm_seq_matches():
    r, t, _, _ = _polar_grid()
    ours = np.asarray(poly.zernike_nm_seq(NMS, jnp.asarray(r), jnp.asarray(t)))
    theirs = np.asarray(ref_poly.zernike_nm_seq(NMS, r, t))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_zernike_nm_der_seq_matches():
    r, t, _, _ = _polar_grid()
    ours = np.asarray(poly.zernike_nm_der_seq(NMS, jnp.asarray(r), jnp.asarray(t)))
    theirs = np.asarray(ref_poly.zernike_nm_der_seq(NMS, r, t))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_zernike_nm_der_xy_seq_matches():
    _, _, xx, yy = _polar_grid()
    ours = np.asarray(poly.zernike_nm_der_xy_seq(NMS, jnp.asarray(xx), jnp.asarray(yy)))
    theirs = np.asarray(ref_poly.zernike_nm_der_xy_seq(NMS, xx, yy))
    np.testing.assert_allclose(ours, theirs, rtol=1e-11, atol=1e-12)


def test_zernike_sum_der_xy_matches():
    _, _, xx, yy = _polar_grid()
    coefs = [0.1, -0.2, 0.3, 0.4, -0.5, 0.6, -0.7, 0.8, 0.9, -1.0, 1.1, 1.2]
    ours = poly.zernike_sum_der_xy(coefs, NMS, jnp.asarray(xx), jnp.asarray(yy))
    theirs = ref_zernike.zernike_sum_der_xy(coefs, NMS, xx, yy)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), np.asarray(t), rtol=1e-10, atol=1e-11)


def test_zernike_autodiff_consistent_with_der():
    """jax.grad through zernike_nm agrees with the analytic radial derivative."""
    r0, t0 = 0.63, 1.1

    def zfun(r):
        return poly.zernike_nm(4, 2, r, jnp.asarray(t0))

    g = jax.grad(lambda r: zfun(r))(jnp.asarray(r0))
    dr, _ = poly.zernike_nm_der(4, 2, jnp.asarray(r0), jnp.asarray(t0))
    np.testing.assert_allclose(np.asarray(g), np.asarray(dr), rtol=1e-10)


@pytest.mark.parametrize('conv_pair', [
    ('nm_to_fringe', [(0, 0), (4, 0), (3, 1), (5, -3)]),
    ('nm_to_ansi_j', [(0, 0), (4, 0), (3, 1), (5, -3)]),
])
def test_index_conversions_match(conv_pair):
    name, pairs = conv_pair
    ours = getattr(poly, name)
    theirs = getattr(ref_poly, name)
    for nm in pairs:
        assert ours(*nm) == theirs(*nm)


def test_index_roundtrips_match():
    for j in range(1, 37):
        assert poly.fringe_to_nm(j) == ref_poly.fringe_to_nm(j)
        assert poly.noll_to_nm(j) == ref_poly.noll_to_nm(j)
        assert poly.ansi_j_to_nm(j) == ref_poly.ansi_j_to_nm(j)


def test_nm_to_name_matches():
    # exhaustive through order 12: covers Piston/Tilt/Defocus specials,
    # the Primary..Quinary ladder, every -foil family, and the numeric
    # fallbacks for high orders
    for n in range(0, 13):
        for m in range(-n, n + 1, 2):
            assert poly.nm_to_name(n, m) == ref_poly.nm_to_name(n, m), (n, m)


def test_sum_of_2d_modes_matches():
    r, t, _, _ = _polar_grid()
    modes = np.asarray(ref_poly.zernike_nm_seq(NMS, r, t))
    weights = np.linspace(-1, 1, len(NMS))
    ours = np.asarray(poly.sum_of_2d_modes(jnp.asarray(modes), jnp.asarray(weights)))
    theirs = np.asarray(ref_poly.sum_of_2d_modes(modes, weights))
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-13)


def test_lstsq_matches():
    r, t, _, _ = _polar_grid()
    modes = np.asarray(ref_poly.zernike_nm_seq(NMS[:6], r, t))
    truth = np.asarray([0.5, -0.3, 0.2, 0.8, -0.1, 0.05])
    data = np.tensordot(truth, modes, axes=(0, 0))
    data_nan = data.copy()
    data_nan[r > 1] = np.nan
    ours = np.asarray(poly.lstsq(jnp.asarray(modes), jnp.asarray(data_nan)))
    theirs = np.asarray(ref_poly.lstsq(modes, data_nan))
    np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-10)


def test_normalize_and_orthogonalize_modes():
    r, t, _, _ = _polar_grid()
    mask = r <= 1
    modes = np.asarray(ref_poly.zernike_nm_seq(NMS[:5], r, t))
    ours = np.asarray(poly.normalize_modes(jnp.asarray(modes), jnp.asarray(mask)))
    theirs = np.asarray(ref_poly.normalize_modes(modes, mask))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)
    ours_o = np.asarray(poly.orthogonalize_modes(jnp.asarray(modes), jnp.asarray(mask)))
    theirs_o = np.asarray(ref_poly.orthogonalize_modes(modes, mask))
    np.testing.assert_allclose(ours_o, theirs_o, rtol=1e-8, atol=1e-10)


def test_jacobi_sum_clenshaw_der_matches_fd():
    x = np.linspace(-0.9, 0.9, 41)
    s = [0.5, -1.0, 2.0, 0.3, -0.7, 1.1]
    f = lambda xv: np.asarray(poly.jacobi_sum_clenshaw(s, 0.0, 2.0, jnp.asarray(xv)))  # NOQA
    # h chosen per stencil: second differences amplify roundoff by 1/h^2
    for j, h, tol in ((1, 1e-6, 1e-7), (2, 1e-4, 1e-4)):
        d = np.asarray(poly.jacobi_sum_clenshaw_der(s, 0.0, 2.0,
                                                    jnp.asarray(x), j=j))
        if j == 1:
            fd = (f(x + h) - f(x - h)) / (2 * h)
        else:
            fd = (f(x + h) - 2 * f(x) + f(x - h)) / (h * h)
        np.testing.assert_allclose(d, fd, rtol=tol, atol=tol)
    # derivative order above the polynomial degree is identically zero
    d = np.asarray(poly.jacobi_sum_clenshaw_der(s, 0.0, 2.0,
                                                       jnp.asarray(x), j=6))
    np.testing.assert_allclose(d, 0.0, atol=1e-9)


def test_zernike_barplots_render():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    coefs = [0.0, 25.0, -10.0, 8.0]
    fig, ax = poly.barplot(coefs)
    assert len(ax.patches) == 4
    nms = [(2, 0), (2, 2), (2, -2), (4, 0)]
    fig, ax = poly.barplot_magnitudes([10.0, 4.0, -3.0, 0.5], nms)
    labels = [t.get_text() for t in ax.get_xticklabels()]
    assert 'Primary Astigmatism' in labels  # the (2,2)/(2,-2) pair merged
    assert len(ax.patches) == 3
    fig, ax = poly.barplot_magnitudes([10.0, 4.0, -3.0, 0.5], nms,
                                             errorbars=[0.1] * 4, sort=True,
                                             orientation='v')
    assert len(ax.containers) == 2
    plt.close('all')
