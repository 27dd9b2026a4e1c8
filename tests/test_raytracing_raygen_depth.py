"""Raygen + valid-mask depth: port of the reference raygen suite's intent.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_raygen.py (29 tests): fan/grid generators and their
distributions, concat/split plumbing, the Newton and analytic
intersect valid masks, hexapolar/spiral counts, and aperture clipping.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu.conf import config
import prysm_tpu.x.raytracing as rt
from prysm_tpu.x.raytracing.raygen import (
    clip_to_aperture,
    concat_rayfans,
    generate_collimated_hex_ray_grid,
    generate_collimated_radial_spiral_ray_grid,
    generate_collimated_ray_fan,
    generate_collimated_rect_ray_grid,
    generate_finite_ray_fan,
    split_rayfans,
)
from prysm_tpu.x.raytracing.surfaces import CallableShape, Surface
from prysm_tpu.x.raytracing.sags import gradient_to_unit_normal


def _asnp(x):
    return np.asarray(x)


# ---------- fans and grids ---------------------------------------------------

def test_collimated_ray_fan_uniform():
    P, S = generate_collimated_ray_fan(11, maxr=10.0, z=-50.0, azimuth=90)
    P, S = _asnp(P), _asnp(S)
    assert P.shape == (11, 3) and S.shape == (11, 3)
    np.testing.assert_allclose(P[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(P[:, 1], np.linspace(-10, 10, 11))
    np.testing.assert_allclose(P[:, 2], -50.0)
    np.testing.assert_allclose(S, np.tile([0, 0, 1], (11, 1)), atol=1e-15)


def test_collimated_ray_fan_yangle_tilts():
    P, S = generate_collimated_ray_fan(5, maxr=2.0, z=0, yangle=10.0)
    S = _asnp(S)
    np.testing.assert_allclose(np.linalg.norm(S, axis=-1), 1.0, atol=1e-12)
    assert not np.allclose(S, [0, 0, 1])


def test_rect_grid_shape_and_unitnorm():
    P, S = generate_collimated_rect_ray_grid(5, maxx=1.0, z=0)
    P, S = _asnp(P), _asnp(S)
    assert P.shape == (25, 3) and S.shape == (25, 3)
    np.testing.assert_allclose(np.linalg.norm(S, axis=-1), 1.0, atol=1e-12)


def test_rect_grid_independent_y_extent():
    P, _ = generate_collimated_rect_ray_grid(3, maxx=1.0, maxy=2.0, z=0)
    P = _asnp(P)
    np.testing.assert_allclose([P[:, 0].min(), P[:, 0].max()], [-1.0, 1.0],
                               atol=1e-12)
    np.testing.assert_allclose([P[:, 1].min(), P[:, 1].max()], [-2.0, 2.0],
                               atol=1e-12)


@pytest.mark.parametrize('precision, expected', [
    (np.float32, np.float32),
    (np.float64, np.float64),
])
def test_rect_grid_tracks_config_precision(precision, expected):
    old = config.precision
    try:
        config.precision = precision
        P, S = generate_collimated_rect_ray_grid(3, maxx=1.0, maxy=2.0, z=0)
        assert _asnp(P).dtype == expected
        assert _asnp(S).dtype == expected
    finally:
        config.precision = old


def test_finite_ray_fan_shape_and_origin():
    P, S = generate_finite_ray_fan(7, na=0.1, P=[0, 0, -50.0])
    P, S = _asnp(P), _asnp(S)
    assert P.shape == (7, 3) and S.shape == (7, 3)
    np.testing.assert_allclose(np.linalg.norm(S, axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(P, np.tile([0, 0, -50.0], (7, 1)))


def test_finite_ray_fan_single_axis_tilt_applies():
    _, S0 = generate_finite_ray_fan(7, na=0.1, P=[0, 0, -50.0], yangle=0.0)
    _, Sy = generate_finite_ray_fan(7, na=0.1, P=[0, 0, -50.0], yangle=10.0)
    Sy = _asnp(Sy)
    np.testing.assert_allclose(np.linalg.norm(Sy, axis=-1), 1.0, atol=1e-12)
    assert not np.allclose(Sy, _asnp(S0))


def test_finite_ray_fan_single_ray_keeps_batch_axis():
    P, S = generate_finite_ray_fan(1, na=0.1, P=[0, 0, -50.0], yangle=5.0)
    assert _asnp(S).shape == (1, 3)
    assert _asnp(P).shape == (1, 3)


# ---------- concat / split ---------------------------------------------------

def test_concat_rayfans():
    P1, S1 = generate_collimated_ray_fan(3, maxr=1.0, z=0)
    P2, S2 = generate_collimated_ray_fan(5, maxr=1.0, z=0)
    P, S = concat_rayfans((P1, S1), (P2, S2))
    P = _asnp(P)
    assert P.shape == (8, 3) and _asnp(S).shape == (8, 3)
    np.testing.assert_array_equal(P[:3], _asnp(P1))
    np.testing.assert_array_equal(P[3:], _asnp(P2))


def test_split_rayfans_round_trip():
    P1, S1 = generate_collimated_ray_fan(3, maxr=1.0, z=0)
    P2, S2 = generate_collimated_ray_fan(5, maxr=1.0, z=0)
    P, S = concat_rayfans((P1, S1), (P2, S2))
    chunks_P, chunks_S = split_rayfans(P, [3, 5], S=S)
    assert len(chunks_P) == 2 and len(chunks_S) == 2
    np.testing.assert_array_equal(_asnp(chunks_P[0]), _asnp(P1))
    np.testing.assert_array_equal(_asnp(chunks_P[1]), _asnp(P2))
    np.testing.assert_array_equal(_asnp(chunks_S[0]), _asnp(S1))
    np.testing.assert_array_equal(_asnp(chunks_S[1]), _asnp(S2))


def test_split_rayfans_without_S():
    P1, _ = generate_collimated_ray_fan(2, maxr=1.0, z=0)
    P2, _ = generate_collimated_ray_fan(4, maxr=1.0, z=0)
    P, _ = concat_rayfans((P1, np.zeros_like(_asnp(P1))),
                          (P2, np.zeros_like(_asnp(P2))))
    chunks = split_rayfans(P, [2, 4])
    assert len(chunks) == 2
    np.testing.assert_array_equal(_asnp(chunks[0]), _asnp(P1))
    np.testing.assert_array_equal(_asnp(chunks[1]), _asnp(P2))


def test_split_rayfans_length_mismatch_raises():
    with pytest.raises(ValueError, match='sum.*chunksizes'):
        split_rayfans(np.zeros((10, 3)), [3, 4])


# ---------- valid-mask plumbing ----------------------------------------------

def _ray_batch(seed=0, span=4.0, n=11):
    rng = np.random.default_rng(seed)
    xs = np.linspace(-span, span, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    P = np.stack([X.ravel(), Y.ravel(), np.full(X.size, -50.0)], axis=-1)
    Sx = rng.normal(scale=0.02, size=X.size)
    Sy = rng.normal(scale=0.02, size=X.size)
    Sz = np.sqrt(1 - Sx * Sx - Sy * Sy)
    return P, np.stack([Sx, Sy, Sz], axis=-1)


def test_newton_valid_mask_true_for_gentle_sphere():
    import jax.numpy as jnp
    c = 1 / 100.0

    def sag(x, y):
        rsq = x * x + y * y
        return c * rsq / (1 + jnp.sqrt(1 - c * c * rsq))

    def sag_and_normal(x, y):
        rsq = x * x + y * y
        denom = jnp.sqrt(1 - c * c * rsq)
        return sag(x, y), gradient_to_unit_normal(c * x / denom,
                                                  c * y / denom)

    surf = Surface(shape=CallableShape(sag, sag_and_normal),
                   interaction='reflect', P=np.array([0., 0., 0.]))
    P, S = _ray_batch(span=3.0)
    Q, n, valid = surf.intersect(P, S)
    valid = _asnp(valid)
    assert valid.shape == (P.shape[0],)
    assert valid.dtype == bool
    assert valid.all()
    assert np.all(np.isfinite(_asnp(Q)))


def test_newton_valid_mask_flags_nonconvergence():
    steep = Surface(shape=rt.Conic(1 / 5.0, -2.0), interaction='reflect',
                    P=np.array([0., 0., 0.]))
    bare = Surface(shape=CallableShape(steep.sag, steep.sag_and_normal),
                   interaction='reflect', P=np.array([0., 0., 0.]))
    P = np.array([[3.5, 0., -50.], [0., 0., -50.]])
    S = np.array([[0.05, 0., np.sqrt(1 - 0.0025)], [0., 0., 1.]])
    Q, n, valid = bare.intersect(P, S, maxiter=1)
    valid, Q, n = _asnp(valid), _asnp(Q), _asnp(n)
    assert valid[1]
    assert not valid[0]
    assert np.all(np.isnan(Q[0]))
    assert np.all(np.isnan(n[0]))


def test_analytic_intersect_flags_miss():
    surf = Surface(shape=rt.Sphere(1 / 50.0), interaction='reflect',
                   P=np.array([0., 0., 0.]))
    P = np.array([[0., 0., -10.], [60., 0., -10.]])
    S = np.array([[0., 0., 1.], [0., 0., 1.]])
    _, _, valid = surf.intersect(P, S)
    valid = _asnp(valid)
    assert valid[0]
    assert not valid[1]


# ---------- distributions ----------------------------------------------------

def test_cheby_fan_endpoints_and_clustering():
    P, _ = generate_collimated_ray_fan(7, maxr=10.0, distribution='cheby')
    ys = _asnp(P)[:, 1]
    np.testing.assert_allclose(ys[0], -10.0, atol=1e-12)
    np.testing.assert_allclose(ys[-1], 10.0, atol=1e-12)
    gaps = np.diff(ys)
    assert gaps[0] < gaps[len(gaps) // 2]
    assert gaps[-1] < gaps[len(gaps) // 2]


def test_cheby_rect_grid_both_axes():
    P, _ = generate_collimated_rect_ray_grid(5, maxx=2.0,
                                             distribution='cheby')
    P = _asnp(P)
    assert P.shape == (25, 3)
    for col in (0, 1):
        assert np.isclose(P[:, col].min(), -2.0, atol=1e-12)
        assert np.isclose(P[:, col].max(), 2.0, atol=1e-12)


def test_unknown_distribution_raises():
    with pytest.raises(ValueError, match='unknown distribution'):
        generate_collimated_ray_fan(5, maxr=1.0, distribution='nonsense')


# ---------- hex / spiral grids -----------------------------------------------

@pytest.mark.parametrize('nrings', [0, 1, 2, 3, 5])
def test_hex_grid_count_formula(nrings):
    P, S = generate_collimated_hex_ray_grid(nrings, spacing=1.0)
    expected = 1 + 3 * nrings * (nrings + 1)
    assert _asnp(P).shape == (expected, 3)
    np.testing.assert_allclose(np.linalg.norm(_asnp(S), axis=-1), 1.0,
                               atol=1e-12)


def test_hex_grid_ring_radii():
    spacing = 2.5
    P, _ = generate_collimated_hex_ray_grid(3, spacing=spacing)
    radii = np.hypot(_asnp(P)[:, 0], _asnp(P)[:, 1])
    counts = np.bincount(np.round(radii / spacing).astype(int))
    np.testing.assert_array_equal(counts, [1, 6, 12, 18])


def test_hex_grid_negative_nrings_raises():
    with pytest.raises(ValueError, match='nrings'):
        generate_collimated_hex_ray_grid(-1, spacing=1.0)


def test_radial_spiral_default_density_matches_hex():
    P_spiral, _ = generate_collimated_radial_spiral_ray_grid(3, maxr=10.0)
    P_hex, _ = generate_collimated_hex_ray_grid(3, spacing=10.0 / 3)
    assert _asnp(P_spiral).shape == _asnp(P_hex).shape


def test_radial_spiral_cheby_clusters_at_rim():
    P, _ = generate_collimated_radial_spiral_ray_grid(
        4, maxr=10.0, radial_distribution='cheby')
    radii = np.hypot(_asnp(P)[:, 0], _asnp(P)[:, 1])
    rings = np.sort([r for r in np.unique(np.round(radii, 4)) if r > 0])
    assert (10.0 - rings[-1]) < (rings[1] - rings[0])


def test_radial_spiral_no_center_option():
    P, _ = generate_collimated_radial_spiral_ray_grid(2, maxr=5.0,
                                                      include_center=False)
    assert np.hypot(_asnp(P)[:, 0], _asnp(P)[:, 1]).min() > 0


def test_radial_spiral_custom_samples_per_ring():
    P, _ = generate_collimated_radial_spiral_ray_grid(
        3, maxr=5.0, samples_per_ring=lambda k: 4)
    assert _asnp(P).shape == (13, 3)


def test_radial_spiral_nonpositive_nrings_raises():
    with pytest.raises(ValueError, match='nrings'):
        generate_collimated_radial_spiral_ray_grid(0, maxr=1.0)


# ---------- clip_to_aperture -------------------------------------------------

def test_clip_to_aperture_drops_outside():
    rayfan = generate_collimated_rect_ray_grid(11, maxx=1.0)
    P_kept, S_kept = clip_to_aperture(rayfan,
                                      lambda x, y: x * x + y * y <= 0.25)
    P_kept, S_kept = _asnp(P_kept), _asnp(S_kept)
    assert (np.hypot(P_kept[:, 0], P_kept[:, 1]) <= 0.5 + 1e-12).all()
    assert P_kept.shape[0] < _asnp(rayfan[0]).shape[0]
    np.testing.assert_allclose(np.linalg.norm(S_kept, axis=-1), 1.0,
                               atol=1e-12)


def test_clip_to_aperture_identity_when_covering():
    rayfan = generate_collimated_ray_fan(5, maxr=0.5)
    P_kept, S_kept = clip_to_aperture(rayfan,
                                      lambda x, y: x * x + y * y <= 100.0)
    np.testing.assert_array_equal(_asnp(P_kept), _asnp(rayfan[0]))
    np.testing.assert_array_equal(_asnp(S_kept), _asnp(rayfan[1]))


def test_clip_to_aperture_empty_when_excluding_all():
    rayfan = generate_collimated_ray_fan(7, maxr=10.0)
    P_kept, S_kept = clip_to_aperture(
        rayfan, lambda x, y: np.zeros_like(np.asarray(x), dtype=bool))
    assert _asnp(P_kept).shape == (0, 3)
    assert _asnp(S_kept).shape == (0, 3)
