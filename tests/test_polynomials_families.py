"""Long-tail polynomial families vs the reference implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from prysm_tpu import polynomials as poly

import prysm.polynomials as ref_poly
from prysm.polynomials import qpoly as ref_qpoly

XS = np.linspace(-1, 1, 48)
XS01 = np.linspace(0.01, 1, 48)
NS = [0, 1, 2, 3, 5, 8]


@pytest.mark.parametrize('fam', ['cheby1', 'cheby2', 'cheby3', 'cheby4',
                                 'legendre'])
def test_family_seq_and_der_match(fam):
    ours_seq = getattr(poly, fam + '_seq')(NS, jnp.asarray(XS))
    theirs_seq = getattr(ref_poly, fam + '_seq')(NS, XS)
    np.testing.assert_allclose(np.asarray(ours_seq), np.asarray(theirs_seq),
                               rtol=1e-12, atol=1e-13)
    ours_der = getattr(poly, fam + '_der_seq')(NS, jnp.asarray(XS))
    theirs_der = getattr(ref_poly, fam + '_der_seq')(NS, XS)
    np.testing.assert_allclose(np.asarray(ours_der), np.asarray(theirs_der),
                               rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize('fam', ['hermite_He', 'hermite_H'])
def test_hermite_match(fam):
    ours = getattr(poly, fam + '_seq')(NS, jnp.asarray(XS))
    theirs = getattr(ref_poly, fam + '_seq')(NS, XS)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=1e-12, atol=1e-12)
    ours_d = getattr(poly, fam + '_der_seq')(NS, jnp.asarray(XS))
    theirs_d = getattr(ref_poly, fam + '_der_seq')(NS, XS)
    np.testing.assert_allclose(np.asarray(ours_d), np.asarray(theirs_d),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('fam,alpha', [('dickson1', 0.5), ('dickson2', -0.3),
                                       ('laguerre', 0.75)])
def test_parametric_families_match(fam, alpha):
    ours = getattr(poly, fam + '_seq')(NS, alpha, jnp.asarray(XS))
    theirs = getattr(ref_poly, fam + '_seq')(NS, alpha, XS)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=1e-12, atol=1e-13)
    ours_d = getattr(poly, fam + '_der_seq')(NS, alpha, jnp.asarray(XS))
    theirs_d = getattr(ref_poly, fam + '_der_seq')(NS, alpha, XS)
    np.testing.assert_allclose(np.asarray(ours_d), np.asarray(theirs_d),
                               rtol=1e-12, atol=1e-13)


MNS = [(0, 0), (1, 0), (0, 1), (2, 1), (1, 2), (3, 3)]


def test_xy_seq_matches():
    x = np.linspace(-1, 1, 16)
    xx, yy = np.meshgrid(x, x)
    ours = poly.xy_seq(MNS, jnp.asarray(xx), jnp.asarray(yy))
    theirs = ref_poly.xy_seq(MNS, xx, yy)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=1e-13)
    for fn in ('xy_der_x_seq', 'xy_der_y_seq', 'xy_der_xy_seq'):
        o = getattr(poly, fn)(MNS, jnp.asarray(xx), jnp.asarray(yy))
        t = getattr(ref_poly, fn)(MNS, xx, yy)
        np.testing.assert_allclose(np.asarray(o), np.asarray(t), rtol=1e-13)


def test_xy_sum_matches():
    from prysm.polynomials.xy import xy_sum as ref_xy_sum, xy_sum_der_xy as ref_xy_sum_der
    x = np.linspace(-1, 1, 16)
    xx, yy = np.meshgrid(x, x)
    coefs = [0.5, -1.0, 2.0, 0.3, -0.7, 0.1]
    ours = poly.xy_sum(coefs, MNS, jnp.asarray(xx), jnp.asarray(yy))
    theirs = ref_xy_sum(coefs, MNS, xx, yy)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), rtol=1e-12, atol=1e-13)
    o = poly.xy_sum_der_xy(coefs, MNS, jnp.asarray(xx), jnp.asarray(yy))
    t = ref_xy_sum_der(coefs, MNS, xx, yy)
    for a, b in zip(o, t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13)


def test_xy_j_to_mn_matches():
    for j in range(1, 30):
        assert poly.xy_j_to_mn(j) == ref_poly.xy_j_to_mn(j)


# ---------------------------------------------------------------------------
# Q polynomials
# ---------------------------------------------------------------------------

def test_qbfs_matches():
    ours = poly.Qbfs_seq(NS, jnp.asarray(XS01))
    theirs = ref_poly.Qbfs_seq(NS, XS01)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=1e-11, atol=1e-12)
    ours_d = poly.Qbfs_der_seq(NS, jnp.asarray(XS01))
    theirs_d = ref_qpoly.Qbfs_der_seq(NS, XS01)
    np.testing.assert_allclose(np.asarray(ours_d), np.asarray(theirs_d),
                               rtol=1e-11, atol=1e-12)


def test_qcon_matches():
    ours = poly.Qcon_seq(NS, jnp.asarray(XS01))
    theirs = ref_poly.Qcon_seq(NS, XS01)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=1e-11, atol=1e-12)
    ours_d = poly.Qcon_der_seq(NS, jnp.asarray(XS01))
    theirs_d = ref_qpoly.Qcon_der_seq(NS, XS01)
    np.testing.assert_allclose(np.asarray(ours_d), np.asarray(theirs_d),
                               rtol=1e-11, atol=1e-12)


Q2D_NMS = [(0, 0), (1, 0), (0, 1), (1, 1), (2, 1), (4, 1), (0, 2), (2, 2),
           (0, -1), (2, -1), (1, -2), (3, 3), (2, -3)]


def _q2d_grid():
    r = np.linspace(0.01, 1, 24)
    t = np.linspace(0, 2 * np.pi, 25)
    rr, tt = np.meshgrid(r, t)
    return rr, tt


def test_q2d_seq_matches():
    rr, tt = _q2d_grid()
    ours = poly.Q2d_seq(Q2D_NMS, jnp.asarray(rr), jnp.asarray(tt))
    theirs = ref_poly.Q2d_seq(Q2D_NMS, rr, tt)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               rtol=1e-10, atol=1e-11)


def test_q2d_der_seq_matches():
    rr, tt = _q2d_grid()
    odr, odt = poly.Q2d_der_seq(Q2D_NMS, jnp.asarray(rr), jnp.asarray(tt))
    tdr, tdt = ref_qpoly.Q2d_der_seq(Q2D_NMS, rr, tt)
    np.testing.assert_allclose(np.asarray(odr), np.asarray(tdr), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(odt), np.asarray(tdt), rtol=1e-10, atol=1e-11)


def test_q2d_der_xy_seq_matches():
    x = np.linspace(-0.7, 0.7, 24)
    xx, yy = np.meshgrid(x, x)
    odx, ody = poly.Q2d_der_xy_seq(Q2D_NMS, jnp.asarray(xx), jnp.asarray(yy))
    tdx, tdy = ref_qpoly.Q2d_der_xy_seq(Q2D_NMS, xx, yy)
    np.testing.assert_allclose(np.asarray(odx), np.asarray(tdx), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ody), np.asarray(tdy), rtol=1e-10, atol=1e-11)


def test_compute_z_zprime_q2d_matches():
    rr, tt = _q2d_grid()
    coefs = np.linspace(-1, 1, len(Q2D_NMS))
    cms, ams, bms = poly.Q2d_nm_c_to_a_b(Q2D_NMS, coefs)
    ref_cms, ref_ams, ref_bms = ref_qpoly.Q2d_nm_c_to_a_b(Q2D_NMS, coefs)
    assert cms == list(ref_cms)
    oz, odr, odt = poly.compute_z_zprime_Q2d(cms, ams, bms, jnp.asarray(rr), jnp.asarray(tt))
    tz, tdr, tdt = ref_qpoly.compute_z_zprime_Q2d(ref_cms, ref_ams, ref_bms, rr, tt)
    np.testing.assert_allclose(np.asarray(oz), np.asarray(tz), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(odr), np.asarray(tdr), rtol=1e-10, atol=1e-11)
    np.testing.assert_allclose(np.asarray(odt), np.asarray(tdt), rtol=1e-10, atol=1e-11)


def test_compute_z_zprime_qbfs_qcon_match():
    coefs = [0.5, -0.3, 0.2, 0.1]
    u = jnp.asarray(XS01)
    usq = u * u
    oS, oSp = poly.compute_z_zprime_Qbfs(coefs, u, usq)
    tS, tSp = ref_qpoly.compute_z_zprime_Qbfs(coefs, XS01, XS01 ** 2)
    np.testing.assert_allclose(np.asarray(oS), np.asarray(tS), rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(oSp), np.asarray(tSp), rtol=1e-11, atol=1e-12)
    oS, oSp = poly.compute_z_zprime_Qcon(coefs, u, usq)
    tS, tSp = ref_qpoly.compute_z_zprime_Qcon(coefs, XS01, XS01 ** 2)
    np.testing.assert_allclose(np.asarray(oS), np.asarray(tS), rtol=1e-11, atol=1e-12)
    np.testing.assert_allclose(np.asarray(oSp), np.asarray(tSp), rtol=1e-11, atol=1e-12)
