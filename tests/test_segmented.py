"""Segmented apertures: hex/keystone composites vs the reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu import segmented as seg
from prysm_tpu.coordinates import make_xy_grid
from prysm_tpu.polynomials import zernike_nm_seq

import prysm.segmented as ref_seg
from prysm.coordinates import make_xy_grid as ref_grid
from prysm.polynomials import zernike_nm_seq as ref_znm


def test_hex_lattice_math_matches_reference():
    for h in [(0, 0, 0), (1, -1, 0), (2, -1, -1)]:
        for i in range(6):
            assert tuple(seg.hex_neighbor(seg.Hex(*h), i)) == \
                tuple(ref_seg.hex_neighbor(ref_seg.Hex(*h), i))
    for radius in (1, 2, 3):
        assert [tuple(t) for t in seg.hex_ring(radius)] == \
            [tuple(t) for t in ref_seg.hex_ring(radius)]
    np.testing.assert_allclose(seg.hex_to_xy(seg.Hex(2, -1, -1), 1.3),
                               ref_seg.hex_to_xy(ref_seg.Hex(2, -1, -1), 1.3))


@pytest.fixture(scope='module')
def grids():
    x, y = make_xy_grid(256, diameter=8.0)
    xr, yr = ref_grid(256, diameter=8.0)
    np.testing.assert_allclose(np.asarray(x), xr)
    return x, y, xr, yr


def test_composite_hex_matches_reference(grids):
    x, y, xr, yr = grids
    cha = seg.CompositeHexagonalAperture(x, y, 2, 1.32, 0.007,
                                         exclude=(0,))
    ref = ref_seg.CompositeHexagonalAperture(xr, yr, 2, 1.32, 0.007,
                                             exclude=(0,))
    assert cha.vtov == pytest.approx(ref.vtov, rel=1e-12)
    assert cha.segment_ids == list(ref.segment_ids) or \
        list(cha.segment_ids) == list(ref.segment_ids)
    np.testing.assert_allclose(np.asarray(cha.amp), np.asarray(ref.amp),
                               atol=1e-12)
    # per-segment windows land on the same slices
    for wm, wr in zip(cha.windows, ref.windows):
        assert (wm[0].start, wm[0].stop) == (wr[0].start, wr[0].stop)
        assert (wm[1].start, wm[1].stop) == (wr[1].start, wr[1].stop)
    for mm, mr in zip(cha.local_masks, ref.local_masks):
        np.testing.assert_allclose(np.asarray(mm), np.asarray(mr),
                                   atol=1e-12)


def test_compose_opd_matches_reference_and_differentiates(grids):
    x, y, xr, yr = grids
    cha = seg.CompositeHexagonalAperture(x, y, 2, 1.32, 0.007)
    ref = ref_seg.CompositeHexagonalAperture(xr, yr, 2, 1.32, 0.007)
    nms = [(1, 1), (1, -1), (2, 0)]
    cha.prepare_opd_bases(zernike_nm_seq, nms)
    ref.prepare_opd_bases(ref_znm, nms)

    rng = np.random.default_rng(7)
    coefs = rng.standard_normal((len(cha.segment_ids), len(nms)))
    opd_m = np.asarray(cha.compose_opd(jnp.asarray(coefs)))
    opd_r = np.asarray(ref.compose_opd(coefs))
    np.testing.assert_allclose(opd_m, opd_r, atol=1e-12)

    # piston/tip/tilt phasing is differentiable straight through
    def rms(c):
        o = cha.compose_opd(c)
        return jnp.sqrt(jnp.mean(o * o))

    g = jax.grad(rms)(jnp.asarray(coefs))
    assert g.shape == coefs.shape
    assert bool(jnp.isfinite(g).all())
    # and the gradient is nonzero for pistons of included segments
    assert float(jnp.abs(g).max()) > 0


def test_composite_keystone_matches_reference(grids):
    x, y, xr, yr = grids
    km = seg.CompositeKeystoneAperture(x, y, 2.0, 2, 1.2, [6, 12], 0.02)
    kr = ref_seg.CompositeKeystoneAperture(xr, yr, 2.0, 2, 1.2, [6, 12],
                                           0.02)
    np.testing.assert_allclose(np.asarray(km.amp), np.asarray(kr.amp),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(km.center_mask),
                               np.asarray(kr.center_mask), atol=1e-12)
    assert len(km.segment_masks) == len(kr.segment_masks)
    for mm, mr in zip(km.segment_masks, kr.segment_masks):
        np.testing.assert_allclose(np.asarray(mm), np.asarray(mr),
                                   atol=1e-12)


def test_segment_counts_and_exclusion(grids):
    """2 rings -> 19 segments; exclude= removes them from mask and ids."""
    x, y, _, _ = grids
    cha = seg.CompositeHexagonalAperture(x, y, 2, 1.0, 0.02)
    assert len(cha.segment_ids) == 19          # 1 + 6 + 12
    area_full = float(np.asarray(cha.amp).sum())
    chx = seg.CompositeHexagonalAperture(x, y, 2, 1.0, 0.02, exclude=(0,))
    assert len(chx.segment_ids) == 18
    assert float(np.asarray(chx.amp).sum()) < area_full


def test_segment_piston_moves_psf_energy(grids):
    """Random per-segment piston lowers the Strehl of the composite PSF."""
    import jax.numpy as jnp
    from prysm_tpu.propagation import Wavefront
    from prysm_tpu.polynomials import zernike_nm_seq

    x, y, _, _ = grids
    dx = float(x[0, 1] - x[0, 0])
    cha = seg.CompositeHexagonalAperture(x, y, 2, 1.0, 0.007)
    cha.prepare_opd_bases(zernike_nm_seq, [(0, 0)])
    nseg = len(cha.segment_ids)
    amp = jnp.asarray(cha.amp)

    def peak(coefs):
        wf = Wavefront.from_amp_and_phase(amp, cha.compose_opd(coefs),
                                          0.55, dx)
        I = wf.focus(10.0, Q=2).intensity.data
        return float(jnp.max(I))

    flat = peak(jnp.zeros((nseg, 1)))
    rng = np.random.default_rng(0)
    aberrated = peak(jnp.asarray(rng.uniform(-80, 80, (nseg, 1))))
    assert aberrated < 0.8 * flat


def test_keystone_ring_counts(grids):
    """Keystone apertures expose per-ring segment identifiers."""
    x, y, _, _ = grids
    cka = seg.CompositeKeystoneAperture(x, y, 1.5, 2, 1.0,
                                        [6, 12], 0.02, 0.02)
    assert len(cka.segment_ids) == 6 + 12
    assert np.asarray(cka.amp).sum() > 0
