"""Convenience plot methods + trace cache: port of the reference intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_convenience.py (17 tests): layout_2d overrides, the
plot namespace, dense field sweeps on curve plots, lateral-color
curves, and the live-fingerprint trace cache (hits, invalidation on
every mutation class, argument keying, explicit reset).
"""
import matplotlib
import numpy as np
import pytest

matplotlib.use('Agg')
from matplotlib import pyplot as plt  # NOQA: E402

import jax  # NOQA: F401,E402

import prysm_tpu.x.materials as materials  # NOQA: E402
from prysm_tpu.x.raytracing import (  # NOQA: E402
    ApertureSpec, Field, LensData, OpticalSystem, Sampling)
from prysm_tpu.x.raytracing.surfaces import Sphere  # NOQA: E402
from prysm_tpu.x.raytracing.analysis import (  # NOQA: E402
    field_curvature, lateral_color, ray_aberration_fans, spot_diagrams)
from prysm_tpu.x.raytracing.paraxial import (  # NOQA: E402
    paraxial_image_distance)
from prysm_tpu.x.raytracing._resolve import compiled_surfaces  # NOQA: E402


def _doublet():
    lens = (LensData()
            .add(Sphere(1 / 60.0), thickness=6.0,
                 material=materials.ConstantMaterial(1.5168), aperture=12.0)
            .add(Sphere(-1 / 45.0), thickness=2.5,
                 material=materials.ConstantMaterial(1.673), aperture=12.0)
            .add(Sphere(-1 / 130.0), thickness=0.0,
                 material=materials.air, aperture=12.0))
    sys_ = OpticalSystem(
        lens, aperture=ApertureSpec.epd(22.0),
        fields=[Field(0, 0), Field(0, 0.7), Field(0, 1.0)],
        wavelengths=[0.486, 0.587, 0.656], reference=1, stop_index=1)
    sys_.solve.image_distance()
    return sys_


# ---------- layout_2d --------------------------------------------------------

def test_layout_2d_returns_fig_ax_with_fans():
    sys_ = _doublet()
    fig, ax = sys_.plot.layout_2d()
    try:
        assert fig is not None and ax is not None
        assert len(ax.lines) > len(sys_.fields)
    finally:
        plt.close(fig)


def test_layout_2d_honors_overrides():
    sys_ = _doublet()
    fig5, ax5 = sys_.plot.layout_2d(fields=[Field(0, 0)], sampling=5,
                                    axis='y')
    fig3, ax3 = sys_.plot.layout_2d(fields=[Field(0, 0)], sampling=3,
                                    axis='y')
    try:
        # the optics outline line count is fixed; the fan adds one line
        # per sampled ray, so the two counts differ by exactly 2
        assert len(ax5.lines) - len(ax3.lines) == 2
    finally:
        plt.close(fig5)
        plt.close(fig3)


def test_layout_2d_accepts_sampling_object():
    sys_ = _doublet()
    fig, ax = sys_.plot.layout_2d(sampling=Sampling.fan(n=3, axis='y'))
    try:
        assert len(ax.lines) > 0
    finally:
        plt.close(fig)


# ---------- convenience plots ------------------------------------------------

def test_plot_spots_axes_per_field():
    sys_ = _doublet()
    fig, axs = sys_.plot.spots()
    try:
        assert np.asarray(axs).size == len(sys_.fields)
    finally:
        plt.close(fig)


def test_plot_fans_axes_shape():
    sys_ = _doublet()
    for method in (sys_.plot.ray_fans, sys_.plot.opd_fans):
        fig, axs = method()
        try:
            assert np.asarray(axs).shape == (len(sys_.fields), 2)
        finally:
            plt.close(fig)


def test_convenience_grid_equals_explicit():
    sys_ = _doublet()
    explicit = spot_diagrams(sys_)
    cached = sys_._cached_grid('spots', spot_diagrams, dict(
        fields=None, wavelengths=None, sampling=None, epd=None,
        reference='centroid'))
    np.testing.assert_allclose(np.asarray(cached.x), np.asarray(explicit.x),
                               equal_nan=True)
    np.testing.assert_allclose(np.asarray(cached.y), np.asarray(explicit.y),
                               equal_nan=True)


# ---------- curve plots ------------------------------------------------------

def test_plot_field_curvature_dense_sweep():
    sys_ = _doublet()
    fig, ax = sys_.plot.field_curvature(samples=33)
    try:
        assert len(ax.lines) == 2
        y = ax.lines[0].get_ydata()
        assert len(y) == 33
        assert y[0] == pytest.approx(0.0)
        assert y[-1] == pytest.approx(1.0)
    finally:
        plt.close(fig)


def test_plot_field_curvature_explicit_fields():
    sys_ = _doublet()
    fig, ax = sys_.plot.field_curvature(fields=list(sys_.fields))
    try:
        assert len(ax.lines[0].get_ydata()) == len(sys_.fields)
    finally:
        plt.close(fig)


def test_plot_distortion_dense_sweep():
    sys_ = _doublet()
    fig, ax = sys_.plot.distortion(samples=33)
    try:
        assert len(ax.lines) == 1
        assert len(ax.lines[0].get_xdata()) == 33
    finally:
        plt.close(fig)


def test_plot_chromatic_focal_shift_span():
    sys_ = _doublet()
    fig, ax = sys_.plot.chromatic_focal_shift(focus='paraxial', samples=7)
    try:
        x = ax.lines[0].get_xdata()
        assert len(x) == 7
        assert x[0] == pytest.approx(min(sys_.wavelengths))
        assert x[-1] == pytest.approx(max(sys_.wavelengths))
    finally:
        plt.close(fig)


def test_plot_chromatic_focal_shift_zero_at_reference():
    sys_ = _doublet()
    fig, ax = sys_.plot.chromatic_focal_shift(focus='paraxial',
                                              wavelengths=sys_.wavelengths)
    try:
        x = ax.lines[0].get_xdata()
        y = ax.lines[0].get_ydata()
        assert len(x) == len(sys_.wavelengths)
        assert y[sys_.reference] == pytest.approx(0.0)
        surfaces = compiled_surfaces(sys_)
        bfd = np.array([paraxial_image_distance(surfaces, wvl=float(w))
                        for w in sys_.wavelengths])
        np.testing.assert_allclose(y, bfd - bfd[sys_.reference])
    finally:
        plt.close(fig)


def test_plot_lateral_color_curves():
    sys_ = _doublet()
    fig, ax = sys_.plot.lateral_color()
    try:
        assert len(ax.lines) == len(sys_.wavelengths) - 1
        landing = np.asarray(lateral_color(sys_))
        assert len(ax.lines[0].get_ydata()) == landing.shape[0]
        expected = landing[:, 0, 1] - landing[:, sys_.reference, 1]
        np.testing.assert_allclose(ax.lines[0].get_xdata(), expected,
                                   atol=1e-12)
        assert ax.lines[0].get_xdata()[0] == pytest.approx(0.0)
    finally:
        plt.close(fig)


def test_curve_convenience_cached():
    sys_ = _doublet()
    explicit = field_curvature(sys_)
    kw = dict(fields=None, wavelength=None, samples=101)
    cached = sys_._cached_grid('field_curvature', field_curvature, kw)
    np.testing.assert_allclose(np.asarray(cached.x_fan_z),
                               np.asarray(explicit.x_fan_z))
    np.testing.assert_allclose(np.asarray(cached.y_fan_z),
                               np.asarray(explicit.y_fan_z))
    assert sys_._cached_grid('field_curvature', field_curvature, kw) is cached


# ---------- trace cache ------------------------------------------------------

def test_reset_raytrace_cache_clears_without_rewinding():
    sys_ = _doublet()
    wvl = sys_.wavelength()
    grid_kw = dict(fields=None, wavelengths=None, nrays=11, epd=None,
                   distribution='uniform', reference='chief')
    P_xp = sys_.exit_pupil(wvl)
    grid = sys_._cached_grid('ray_fans', ray_aberration_fans, grid_kw)
    sys_.lens.to_surfaces()
    assert sys_._derived
    assert sys_._trace_cache
    assert sys_.lens._surfaces_cache is not None

    sys_.lens.rows[1].thickness = 6.5
    generation = sys_.lens._version
    assert generation > 0

    out = sys_.reset_raytrace_cache()
    assert out is sys_
    assert sys_.lens._version == generation
    assert sys_.lens._surfaces_cache is None
    assert sys_._derived == {}
    assert sys_._trace_cache == {}
    assert sys_.exit_pupil(wvl) is not P_xp
    assert sys_._cached_grid('ray_fans', ray_aberration_fans,
                             grid_kw) is not grid


def test_trace_cache_hits_and_invalidates():
    sys_ = _doublet()
    kw = dict(fields=None, wavelengths=None, nrays=11, epd=None,
              distribution='uniform', reference='chief')
    g1 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    g2 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g1 is g2

    sys_.lens.rows[1].thickness = 6.5
    g3 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g3 is not g2

    sys_.stop_index = 0
    g4 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g4 is not g3
    sys_.stop_index = 1

    g5 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    sys_.fields.fields.append(Field(0, 1.4))
    g6 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g6 is not g5

    sys_.wavelengths = np.asarray([0.55])
    g7 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g7 is not g6

    sys_.fields.fields[0].vignetting = {'vux': 0.0, 'vlx': 0.0,
                                        'vuy': 0.1, 'vly': 0.1}
    g8 = sys_._cached_grid('ray_fans', ray_aberration_fans, kw)
    assert g8 is not g7


def test_trace_cache_keys_on_arguments():
    sys_ = _doublet()
    a = sys_._cached_grid('ray_fans', ray_aberration_fans, dict(nrays=11))
    b = sys_._cached_grid('ray_fans', ray_aberration_fans, dict(nrays=21))
    assert a is not b
    assert np.asarray(a.x).shape[-1] == 11
    assert np.asarray(b.x).shape[-1] == 21


def test_plot_full_field_metric_map():
    sys_ = _doublet()
    fig, ax = sys_.plot.full_field(samples=5)
    try:
        assert len(ax.collections) == 1
        data = ax.collections[0].get_array()
        assert np.isfinite(np.asarray(data)).any()
        assert ax.get_xlabel() == 'field x [deg]'
        from prysm_tpu.x.raytracing.analysis import full_field
        kw = dict(metric='rms spot', samples=5, max_field=None,
                  wavelengths=None, sampling=None, epd=None, stop_index=None)
        g1 = sys_._cached_grid('full_field', full_field, kw)
        g2 = sys_._cached_grid('full_field', full_field, kw)
        assert g1 is g2
    finally:
        plt.close(fig)
