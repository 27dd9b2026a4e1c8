"""Whole-system grid analyses + grid plotters: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_grids.py (15 tests): the two-step ergonomics that
mirror Code V / Zemax — analysis functions that trace every field and
wavelength under one pupil sampling into a labelled namedtuple, and
plotters that lay the grid out as subplots, with the data and the
plot kept separate.
"""
import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.raytracing import (
    ApertureSpec, Field, LensData, OpticalSystem, plotting)
from prysm_tpu.x.raytracing.surfaces import Conic, Plane
from prysm_tpu.x.raytracing.analysis import (
    OPDFanGrid, RayFanGrid, Sampling, SpotGrid, opd_fans,
    ray_aberration_fans, spot_diagrams, spot_geometric_radius,
    spot_rms_radius)


def aac(actual, desired, **kw):
    np.testing.assert_allclose(np.asarray(actual, dtype=float), desired,
                               **kw)


def _singlet_system(fields=None, wavelengths=None, ref=1):
    """Sphere/sphere singlet with a stop at the first powered surface."""
    lens = LensData()
    (lens.add(Conic(1 / 50.0, 0.0), typ='refr',
              material=materials.ConstantMaterial(1.5168), thickness=5.0)
         .add(Conic(-1 / 50.0, 0.0), typ='refr', material=materials.air,
              thickness=95.0)
         .add(Plane(), typ='eval'))
    if fields is None:
        fields = [Field(0, 0), Field(0, 3)]
    if wavelengths is None:
        wavelengths = [0.4861, 0.5876, 0.6563]
    return OpticalSystem(lens, aperture=ApertureSpec.epd(10.0),
                         fields=fields, wavelengths=wavelengths,
                         reference=ref, stop_index=0)


# ---------- ray-aberration fans ----------------------------------------------

def test_ray_fans_shape_and_indexing():
    sys_ = _singlet_system()
    grid = ray_aberration_fans(sys_, nrays=21)
    assert isinstance(grid, RayFanGrid)
    shape3 = grid.x.shape
    assert shape3 == (len(grid.fields), len(grid.wavelengths), 21)
    assert shape3[:2] == (2, 3)
    assert grid.pupil_x.shape == grid.pupil_y.shape == (shape3[0], 21)
    assert grid.y.shape == shape3
    assert (grid.unit, grid.reference) == ('mm', 'chief')
    # omitting fields/wavelengths pulls them from the OpticalSystem
    aac(sorted(grid.wavelengths), sorted([0.4861, 0.5876, 0.6563]))


def test_ray_fans_pupil_is_per_field_and_normalized():
    sys_ = _singlet_system()
    grid = ray_aberration_fans(sys_, nrays=21)
    # without vignetting the fans span the normalized pupil rim to rim
    for axis in (grid.pupil_x, grid.pupil_y):
        assert (axis.min(), axis.max()) == (pytest.approx(-1.0),
                                            pytest.approx(1.0))
    # one pupil axis per field (vignetting factors are per-field)
    assert grid.pupil_x.shape == (len(grid.fields), 21)


def test_ray_fans_vignetted_field_spans_less_than_unit_pupil():
    # vignetting factors compress the launched fan onto the transmitted
    # pupil; the abscissa shows the truncation (never stretched to +/-1)
    fields = [Field(0, 0),
              Field(0, 3, vignetting={'vuy': 0.3, 'vly': 0.1})]
    sys_ = _singlet_system(fields=fields)
    grid = ray_aberration_fans(sys_, nrays=21)
    aac(grid.pupil_y[0].max(), 1.0)
    # vuy=0.3 / vly=0.1 compress the launched fan onto [-0.9, 0.7]
    aac([grid.pupil_y[1].min(), grid.pupil_y[1].max()], [-0.9, 0.7])
    aac(grid.pupil_x[1].max(), 1.0)  # x is unvignetted for this field
    # the bundle stays full length: every fan value is finite
    assert np.isfinite(grid.y[1]).all()


def test_ray_fans_chief_reference_is_zero():
    """The pupil-center ray's error is exactly zero under chief reference."""
    sys_ = _singlet_system()
    grid = ray_aberration_fans(sys_, nrays=21, reference='chief')
    center = int(np.argmin(np.abs(grid.pupil_x[0])))
    for panel in (grid.x, grid.y):
        assert np.nanmax(np.abs(panel[:, :, center])) == 0.0


def test_ray_fans_centroid_reference_runs():
    sys_ = _singlet_system()
    grid = ray_aberration_fans(sys_, nrays=15, reference='centroid')
    assert np.isfinite(grid.x).any()


def test_ray_fans_bare_prescription_needs_epd():
    sys_ = _singlet_system()
    with pytest.raises((TypeError, ValueError)):
        ray_aberration_fans(list(sys_.to_surfaces()),
                            fields=[Field(0, 0)], wavelengths=[0.5876],
                            nrays=11)
    grid = ray_aberration_fans(list(sys_.to_surfaces()),
                               fields=[Field(0, 0)], wavelengths=[0.5876],
                               nrays=11, epd=8.0)
    assert grid.x.shape == (1, 1, 11)


# ---------- OPD fans ----------------------------------------------------------

def test_opd_fans_shape_and_chief_zero():
    sys_ = _singlet_system()
    grid = opd_fans(sys_, nrays=21)
    assert isinstance(grid, OPDFanGrid)
    assert grid.x.shape == (2, 3, 21)
    assert (grid.unit, grid.reference) == ('waves', 'chief')
    # OPD is chief-referenced: the central ray is ~0 in every panel
    center = int(np.argmin(np.abs(grid.pupil_x[0])))
    for panel in (grid.x, grid.y):
        assert np.nanmax(np.abs(panel[:, :, center])) < 1e-9


# ---------- spot diagrams -----------------------------------------------------

def test_spot_diagrams_shape_and_validity():
    sys_ = _singlet_system()
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=4))
    assert isinstance(grid, SpotGrid)
    assert grid.x.shape[:2] == (2, 3)
    assert grid.valid.shape == grid.x.shape
    assert grid.anchor_xy.shape == (2, 3, 2)
    assert (grid.unit, grid.reference) == ('mm', 'centroid')
    assert grid.valid.all()


def test_spot_reference_recovers_absolute_landing():
    """x + anchor gives back the absolute image coordinate."""
    sys_ = _singlet_system()
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=3),
                         reference='centroid')
    absolute = grid.x[..., :] + grid.anchor_xy[..., 0:1]
    assert np.isfinite(absolute).all()


def test_spot_rms_matches_manual():
    sys_ = _singlet_system()
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=5))
    rms = spot_rms_radius(grid)
    assert rms.shape == (2, 3)
    # recompute centroid-referenced RMS by hand for one panel
    dx, dy = (np.asarray(v)[0, 0] for v in (grid.x, grid.y))
    dx = dx - np.nanmean(dx)
    dy = dy - np.nanmean(dy)
    assert rms[0, 0] == pytest.approx(
        np.sqrt(np.nanmean(dx * dx + dy * dy)))


def test_spot_geometric_radius_ge_rms():
    sys_ = _singlet_system()
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=5))
    assert np.all(spot_geometric_radius(grid) >= spot_rms_radius(grid))


def test_spot_geometric_radius_matches_manual():
    sys_ = _singlet_system()
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=5))
    dx, dy = (np.asarray(v) for v in (grid.x, grid.y))
    dx = dx - np.nanmean(dx, axis=2, keepdims=True)
    dy = dy - np.nanmean(dy, axis=2, keepdims=True)
    by_hand = np.sqrt(np.nanmax(dx * dx + dy * dy, axis=2))
    assert np.array_equal(np.asarray(spot_geometric_radius(grid)),
                          by_hand)


# ---------- plotters ----------------------------------------------------------

def test_plot_ray_fans_layout():
    sys_ = _singlet_system()
    grid = ray_aberration_fans(sys_, nrays=15)
    fig, axs = plotting.plot_ray_fans(grid)
    assert axs.shape == (2, 2)  # 2 fields x (tangential, sagittal)
    fig2, axs2 = plotting.plot_ray_fans(grid, axes='y')
    assert axs2.shape == (2, 1)


def test_plot_opd_fans_layout():
    sys_ = _singlet_system()
    grid = opd_fans(sys_, nrays=15)
    fig, axs = plotting.plot_opd_fans(grid)
    assert axs.shape == (2, 2)


def test_plot_spot_diagrams_layout():
    sys_ = _singlet_system(fields=[Field(0, 0), Field(0, 2), Field(0, 4)])
    grid = spot_diagrams(sys_, sampling=Sampling.hex(nrings=4))
    fig, axs = plotting.plot_spot_diagrams(grid, ncols=2)
    # 3 fields in 2 columns -> 2 rows, last cell blank
    assert axs.shape == (2, 2)
