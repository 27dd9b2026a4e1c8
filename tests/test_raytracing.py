"""Raytracing parity vs prysm.x.raytracing + autodiff capability tests."""
import sys
import types

import numpy as onp
import pytest

import jax
import jax.numpy as jnp

# The reference snapshot is missing prysm/x/raytracing/_first_order.py
# (imported by its paraxial.py for slot boilerplate); provide the trivial
# helpers so the package imports.
if 'prysm.x.raytracing._first_order' not in sys.modules:
    _stub = types.ModuleType('prysm.x.raytracing._first_order')

    def _initialize_slots(obj):
        for name in type(obj).__slots__:
            setattr(obj, name, None)

    def _format_first_order(obj, clsname):
        vals = ((n, getattr(obj, n)) for n in type(obj).__slots__)
        inner = ', '.join(f'{n}={v!r}' for n, v in vals if v is not None)
        return f'{clsname}({inner})'

    _stub.initialize_slots = _initialize_slots
    _stub.format_first_order = _format_first_order
    sys.modules['prysm.x.raytracing._first_order'] = _stub

if 'prysm.x.raytracing._surface_map' not in sys.modules:
    # also absent from the snapshot; only listings/io need a real one
    _stub2 = types.ModuleType('prysm.x.raytracing._surface_map')
    _stub2.SurfaceMap = type('SurfaceMap', (), {})
    sys.modules['prysm.x.raytracing._surface_map'] = _stub2

ref_sm = pytest.importorskip('prysm.x.raytracing.spencer_and_murty')
ref_surfaces = pytest.importorskip('prysm.x.raytracing.surfaces')
ref_paraxial = pytest.importorskip('prysm.x.raytracing.paraxial')

from prysm_tpu.x import raytracing as rt  # NOQA: E402


class NK:
    """Constant-index material."""

    def __init__(self, n):
        self._n = float(n)

    def n(self, wvl, temperature=None):
        return self._n

    def nk(self, wvl, temperature=None):
        return complex(self._n, 0.0)


WVL = 0.5876
NBK7 = 1.5168


def _singlet(mod, surf_mod, aperture=None, eval_z=None):
    """Biconvex singlet; built for either framework via its modules."""
    sfs = [
        surf_mod.Surface(shape=surf_mod.Sphere(1 / 50.0),
                         interaction='refract', P=[0, 0, 0.0],
                         material=NK(NBK7), aperture=aperture),
        surf_mod.Surface(shape=surf_mod.Sphere(-1 / 50.0),
                         interaction='refract', P=[0, 0, 4.0],
                         material=NK(1.0)),
    ]
    if eval_z is not None:
        sfs.append(surf_mod.Surface(shape=surf_mod.Plane(),
                                    interaction='eval', P=[0, 0, eval_z]))
    return sfs


def _fan(n=7, maxr=10.0, z=-5.0):
    y = onp.linspace(-maxr, maxr, n)
    P = onp.stack([onp.zeros_like(y), y, onp.full_like(y, z)], axis=1)
    S = onp.broadcast_to(onp.array([0.0, 0.0, 1.0]), (n, 3)).copy()
    return P, S


def test_singlet_trace_matches_reference():
    P, S = _fan()
    mine = rt.raytrace(_singlet(rt, rt, eval_z=50.0), P, S, WVL)
    ref = ref_sm.raytrace(_singlet(ref_surfaces, ref_surfaces, eval_z=50.0),
                          P, S, WVL)
    onp.testing.assert_allclose(onp.asarray(mine.P), ref.P, atol=1e-10)
    onp.testing.assert_allclose(onp.asarray(mine.S), ref.S, atol=1e-12)
    onp.testing.assert_allclose(onp.asarray(mine.OPL), ref.OPL, atol=1e-10)
    onp.testing.assert_array_equal(onp.asarray(mine.status), ref.status)


def test_clip_and_status_match_reference():
    P, S = _fan(n=9, maxr=12.0)
    mine = rt.raytrace(_singlet(rt, rt, aperture=8.0, eval_z=50.0), P, S, WVL)
    ref = ref_sm.raytrace(
        _singlet(ref_surfaces, ref_surfaces, aperture=8.0, eval_z=50.0),
        P, S, WVL)
    onp.testing.assert_array_equal(onp.asarray(mine.status), ref.status)
    # clipped rays must carry CLIP at surface 1; snapshot valid rays agree
    st = mine.status_record
    clipped = onp.abs(P[:, 1]) > 8.0
    assert (st.code[clipped] == rt.STATUS_CLIP).all()
    assert (st.surface[clipped] == 1).all()
    ok = ~clipped
    onp.testing.assert_allclose(onp.asarray(mine.P)[:, ok], ref.P[:, ok],
                                atol=1e-10)


def test_tir_matches_reference():
    # steep rays inside glass onto a glass/air plane -> TIR beyond ~41.2 deg
    def build(surf_mod):
        return [
            surf_mod.Surface(shape=surf_mod.Plane(), interaction='refract',
                             P=[0, 0, 5.0], material=NK(1.0)),
        ]
    angles = onp.radians(onp.linspace(10, 70, 7))
    S = onp.stack([onp.zeros_like(angles), onp.sin(angles),
                   onp.cos(angles)], axis=1)
    P = onp.zeros_like(S)
    # launch medium: object-space index defaults to 1; emulate glass launch
    # by prepending an eval surface with a glass material
    def build_full(mod, surf_mod):
        pre = surf_mod.Surface(shape=surf_mod.Plane(), interaction='eval',
                               P=[0, 0, 0.0], material=NK(NBK7))
        return [pre] + build(surf_mod)
    mine = rt.raytrace(build_full(rt, rt), P, S, WVL)
    ref = ref_sm.raytrace(build_full(ref_sm, ref_surfaces), P, S, WVL)
    onp.testing.assert_array_equal(onp.asarray(mine.status), ref.status)
    crit = onp.degrees(onp.arcsin(1.0 / NBK7))
    tir = onp.degrees(angles) > crit
    st = mine.status_record
    assert (st.code[tir] == rt.STATUS_TIR).all()
    assert (st.code[~tir] == rt.STATUS_OK).all()
    onp.testing.assert_allclose(onp.asarray(mine.S)[-1, ~tir],
                                ref.S[-1, ~tir], atol=1e-12)


def test_fold_mirror_matches_reference():
    # 45-degree fold: collimated +z input exits along -y.  tilt is
    # (Z, Y, X) ordered, so an X tilt is the third element.
    def build(surf_mod):
        return [
            surf_mod.Surface(shape=surf_mod.Plane(), interaction='reflect',
                             P=[0, 0, 20.0], tilt=[0, 0, 45]),
            surf_mod.Surface(shape=surf_mod.Plane(), interaction='eval',
                             P=[0, -30.0, 20.0], tilt=[0, 0, 90]),
        ]
    P, S = _fan(n=5, maxr=3.0, z=0.0)
    mine = rt.raytrace(build(rt), P, S, WVL)
    ref = ref_sm.raytrace(build(ref_surfaces), P, S, WVL)
    onp.testing.assert_allclose(onp.asarray(mine.P), ref.P, atol=1e-9)
    onp.testing.assert_allclose(onp.asarray(mine.S), ref.S, atol=1e-12)
    onp.testing.assert_allclose(onp.asarray(mine.OPL), ref.OPL, atol=1e-9)
    S_out = onp.asarray(mine.S)[1]
    onp.testing.assert_allclose(S_out, onp.broadcast_to([0, -1.0, 0], S_out.shape),
                                atol=1e-12)


def test_even_asphere_newton_matches_reference():
    def build(surf_mod):
        shape = surf_mod.EvenAsphere(1 / 60.0, -0.8, [1e-6, -1e-9])
        return [
            surf_mod.Surface(shape=shape, interaction='refract',
                             P=[0, 0, 0.0], material=NK(NBK7)),
            surf_mod.Surface(shape=surf_mod.Plane(), interaction='refract',
                             P=[0, 0, 6.0], material=NK(1.0)),
            surf_mod.Surface(shape=surf_mod.Plane(), interaction='eval',
                             P=[0, 0, 80.0]),
        ]
    P, S = _fan(n=7, maxr=9.0)
    mine = rt.raytrace(build(rt), P, S, WVL)
    ref = ref_sm.raytrace(build(ref_surfaces), P, S, WVL)
    onp.testing.assert_array_equal(onp.asarray(mine.status), ref.status)
    onp.testing.assert_allclose(onp.asarray(mine.P), ref.P, atol=1e-9)
    onp.testing.assert_allclose(onp.asarray(mine.OPL), ref.OPL, atol=1e-9)


def test_offaxis_parabola_matches_reference():
    def build(surf_mod):
        shape = surf_mod.OffAxisConic(-1 / 200.0, -1.0, dy=50.0)
        return [
            surf_mod.Surface(shape=shape, interaction='reflect',
                             P=[0, 0, 100.0]),
        ]
    P, S = _fan(n=5, maxr=5.0, z=0.0)
    mine = rt.raytrace(build(rt), P, S, WVL)
    ref = ref_sm.raytrace(build(ref_surfaces), P, S, WVL)
    onp.testing.assert_array_equal(onp.asarray(mine.status), ref.status)
    onp.testing.assert_allclose(onp.asarray(mine.P), ref.P, atol=1e-8)
    onp.testing.assert_allclose(onp.asarray(mine.S), ref.S, atol=1e-10)


def test_paraxial_matches_reference():
    mine_sfs = _singlet(rt, rt)
    ref_sfs = _singlet(ref_surfaces, ref_surfaces)
    for fn in ('system_matrix', 'paraxial_image_distance',
               'effective_focal_length', 'back_focal_length',
               'front_focal_length'):
        got = getattr(rt, fn)(mine_sfs, wvl=WVL)
        want = getattr(ref_paraxial, fn)(ref_sfs, wvl=WVL)
        if fn == 'system_matrix':
            onp.testing.assert_allclose(got[0], want[0], atol=1e-12)
            assert got[1] == want[1]
        else:
            onp.testing.assert_allclose(got, want, atol=1e-10)


def test_ynu_first_order_matches_reference():
    mine = rt.ynu_first_order(_singlet(rt, rt), wvl=WVL, epd=20.0,
                              stop_index=0)
    ref = ref_paraxial.ynu_first_order(_singlet(ref_surfaces, ref_surfaces),
                                       wvl=WVL, epd=20.0, stop_index=0)
    for field in ('efl', 'bfl', 'ffl', 'paraxial_image_distance',
                  'paraxial_image_z', 'fno', 'na_image', 'ep_z', 'xp_z',
                  'stop_diameter', 'xp_diameter', 'n_image', 'total_track'):
        got = getattr(mine, field)
        want = getattr(ref, field)
        assert got == pytest.approx(want, abs=1e-10), field


def test_nonaxial_raises():
    sfs = [rt.Surface(shape=rt.Sphere(0.01), interaction='refract',
                      P=[0, 1.0, 0], material=NK(NBK7))]
    with pytest.raises(rt.NonAxialSystemError):
        rt.effective_focal_length(sfs, wvl=WVL)


def test_grad_through_trace():
    # d(marginal ray height at image)/d(curvature) via jax.grad matches
    # central finite differences -- the capability the reference builds a
    # whole hand-rolled tangent/adjoint stack for
    P, S = _fan(n=5, maxr=8.0)
    Pj = jnp.asarray(P)
    Sj = jnp.asarray(S)

    def spot_rms(c):
        sfs = [
            rt.Surface(shape=rt.Sphere(c), interaction='refract',
                       P=[0, 0, 0.0], material=NK(NBK7)),
            rt.Surface(shape=rt.Sphere(-c), interaction='refract',
                       P=[0, 0, 4.0], material=NK(1.0)),
            rt.Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 50.0]),
        ]
        res = rt.raytrace(sfs, Pj, Sj, WVL)
        y = res.P[-1][:, 1]
        return jnp.sqrt(jnp.mean(y * y))

    c0 = 1 / 50.0
    g = jax.grad(spot_rms)(c0)
    h = 1e-7
    fd = (spot_rms(c0 + h) - spot_rms(c0 - h)) / (2 * h)
    assert float(g) == pytest.approx(float(fd), rel=1e-5)


def test_grad_through_newton_intersect():
    # gradient flows through the masked fixed-iteration Newton solve
    Pj = jnp.asarray([[0.0, 6.0, -5.0]])
    Sj = jnp.asarray([[0.0, 0.0, 1.0]])

    def image_y(a4):
        sfs = [
            rt.Surface(shape=rt.EvenAsphere(1 / 60.0, -0.5, [a4]),
                       interaction='refract', P=[0, 0, 0.0],
                       material=NK(NBK7)),
            rt.Surface(shape=rt.Plane(), interaction='refract',
                       P=[0, 0, 6.0], material=NK(1.0)),
            rt.Surface(shape=rt.Plane(), interaction='eval', P=[0, 0, 80.0]),
        ]
        return rt.raytrace(sfs, Pj, Sj, WVL).P[-1][0, 1]

    a0 = 1e-6
    g = jax.grad(image_y)(a0)
    h = 1e-10
    fd = (image_y(a0 + h) - image_y(a0 - h)) / (2 * h)
    assert float(g) == pytest.approx(float(fd), rel=1e-4)


def test_raygen_shapes_and_counts():
    P, S = rt.generate_collimated_ray_fan(9, 10.0)
    assert P.shape == (9, 3) and S.shape == (9, 3)
    onp.testing.assert_allclose(onp.asarray(S[:, 2]), 1.0)
    P, S = rt.generate_collimated_rect_ray_grid(4, 5.0)
    assert P.shape == (16, 3)
    P, S = rt.generate_collimated_hex_ray_grid(3, 1.0)
    assert P.shape == (1 + 3 * 3 * 4, 3)
    P, S = rt.generate_finite_ray_fan(7, 0.2)
    onp.testing.assert_allclose(
        onp.asarray(jnp.sum(S * S, axis=1)), 1.0, atol=1e-12)
    # merge / split roundtrip
    f1 = rt.generate_collimated_ray_fan(5, 1.0)
    f2 = rt.generate_collimated_ray_fan(3, 1.0)
    P, S = rt.concat_rayfans(f1, f2)
    parts = rt.split_rayfans(P, [5, 3])
    assert parts[0].shape == (5, 3) and parts[1].shape == (3, 3)


def test_freeform_shapes_trace():
    # each conic-seeded Newton shape traces and reports OK on-axis-ish rays
    shapes = [
        rt.Q2D(1 / 100.0, 0.0, 20.0, [1e-5], [[0.0]], [[0.0]]),
        rt.Zernike(1 / 100.0, 0.0, 20.0, [(2, 0)], [1e-4]),
        rt.XY(1 / 100.0, 0.0, 20.0, [(2, 0), (0, 2)], [1e-5, 1e-5]),
        rt.Chebyshev(1 / 100.0, 0.0, 20.0, 20.0, [(2, 2)], [1e-5]),
        rt.Jacobi(1 / 100.0, 0.0, 20.0, 0.0, 0.0, [2], [1e-5]),
        rt.Toroid(1 / 90.0, 1 / 100.0, 0.0, []),
        rt.Biconic(1 / 90.0, 1 / 100.0, -0.5, -0.6),
    ]
    P, S = _fan(n=5, maxr=5.0)
    for shape in shapes:
        sfs = [rt.Surface(shape=shape, interaction='reflect', P=[0, 0, 10.0])]
        res = rt.raytrace(sfs, P, S, WVL)
        st = res.status_record
        assert (st.code == rt.STATUS_OK).all(), type(shape).__name__
        assert onp.isfinite(onp.asarray(res.P[-1])).all(), type(shape).__name__
