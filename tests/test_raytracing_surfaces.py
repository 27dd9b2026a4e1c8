"""The shape layer: sag oracles, intersection closed forms, kind table.

Counterpart of the reference's ``test_raytracing_surfaces.py`` /
``..._sag_contract.py`` / ``..._shape_descriptors.py`` suites, adapted to
this repo's kind-table architecture: every kind's sag/normal is checked
against the reference implementation and against autodiff of its own
sag; analytic intersectors are checked against seeded Newton; and the
SagModel/Shape contracts (with_params, pytree, DOF tags, LensData
packing) are locked in.
"""
import numpy as onp
import pytest

import jax
import jax.numpy as jnp

import prysm_tpu.x.raytracing.surfaces as surf
from prysm_tpu.x.raytracing.surfaces import (
    Biconic, CallableShape, Chebyshev, Conic, EvenAsphere, Jacobi,
    OffAxisConic, Plane, Q2D, Shape, Sphere, Surface, Toroid, XY, Zernike,
    SHAPE_MODELS,
)
from prysm_tpu.x.raytracing.spencer_and_murty import (
    intersect as newton_intersect,
)

import _ref_stubs
_ref_stubs.install()
import prysm.x.raytracing.surfaces as ref_surf  # NOQA: E402


def _grid(n=41, R=8.0):
    x = onp.linspace(-R, R, n)
    X, Y = onp.meshgrid(x, x)
    return X, Y


# q2d's Q-polynomials are only defined on the unit normalization disk;
# outside it the Clenshaw and direct summation paths legitimately diverge,
# so its parity grid stays inside (corner radius sqrt(2)*6 < 9)
_PARITY_GRID_R = {'q2d': 6.0}


# (builder kwargs shared with the reference's same-named classes)
_SHAPE_CASES = [
    ('plane', 'Plane', {}),
    ('sphere', 'Sphere', dict(c=1 / 50.0)),
    ('conic', 'Conic', dict(c=1 / 50.0, k=-0.8)),
    ('off_axis_conic', 'OffAxisConic', dict(c=1 / 120.0, k=-1.0, dy=30.0)),
    ('even_asphere', 'EvenAsphere',
     dict(c=1 / 60.0, k=-0.5, coefs=(1e-6, -1e-9))),
    ('zernike', 'Zernike',
     dict(c=1 / 80.0, k=0.0, normalization_radius=9.0,
          nms=[(2, 0), (3, 1)], coefs=[1e-3, -5e-4])),
    ('xy', 'XY', dict(c=1 / 80.0, k=0.0, normalization_radius=9.0,
                      mns=[(2, 0), (1, 1)], coefs=[1e-3, 2e-4])),
    ('chebyshev', 'Chebyshev',
     dict(c=1 / 90.0, k=0.0, x_norm=9.0, y_norm=9.0,
          mns=[(2, 0), (0, 2)], coefs=[1e-3, -2e-4])),
    ('jacobi', 'Jacobi',
     dict(c=1 / 90.0, k=0.0, normalization_radius=9.0, alpha=0.0, beta=0.0,
          ns=[2, 3], coefs=[1e-3, 4e-4])),
    ('q2d', 'Q2D',
     dict(c=1 / 100.0, k=-0.2, normalization_radius=9.0,
          cm0=[1e-3, -2e-4], ams=[[1e-4], []], bms=[[], [2e-4]])),
    ('toroid', 'Toroid',
     dict(c_x=1 / 90.0, c_y=1 / 100.0, k_y=-0.3, coefs_y=(1e-7,))),
    ('biconic', 'Biconic',
     dict(c_x=1 / 90.0, c_y=1 / 100.0, k_x=-0.5, k_y=-0.6)),
]

_BUILDERS = {
    'plane': Plane, 'sphere': Sphere, 'conic': Conic,
    'off_axis_conic': OffAxisConic, 'even_asphere': EvenAsphere,
    'zernike': Zernike, 'xy': XY, 'chebyshev': Chebyshev, 'jacobi': Jacobi,
    'q2d': Q2D, 'toroid': Toroid, 'biconic': Biconic,
}


def _build(kind, kwargs):
    return _BUILDERS[kind](**kwargs)


def _ref_build(clsname, kwargs):
    return getattr(ref_surf, clsname)(**kwargs)


# ---------------------------------------------------------------------------
# sag parity vs the reference implementation, per kind
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_sag_matches_reference(kind, refname, kwargs):
    X, Y = _grid(R=_PARITY_GRID_R.get(kind, 8.0))
    ours = onp.asarray(_build(kind, kwargs).sag(jnp.asarray(X),
                                                jnp.asarray(Y)))
    theirs = onp.asarray(_ref_build(refname, kwargs).sag(X, Y))
    onp.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_normal_matches_reference(kind, refname, kwargs):
    X, Y = _grid(R=_PARITY_GRID_R.get(kind, 8.0))
    _, ours = _build(kind, kwargs).sag_and_normal(jnp.asarray(X),
                                                  jnp.asarray(Y))
    _, theirs = _ref_build(refname, kwargs).sag_and_normal(X, Y)
    onp.testing.assert_allclose(onp.asarray(ours), onp.asarray(theirs),
                                rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_sag_and_normal_first_element_is_sag(kind, refname, kwargs):
    """The fused path and the sag-only fast path agree (sag contract)."""
    X, Y = _grid(n=17)
    shape = _build(kind, kwargs)
    z_fused, _ = shape.sag_and_normal(jnp.asarray(X), jnp.asarray(Y))
    z_only = shape.sag(jnp.asarray(X), jnp.asarray(Y))
    onp.testing.assert_allclose(onp.asarray(z_fused), onp.asarray(z_only),
                                rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_normal_matches_autodiff_of_sag(kind, refname, kwargs):
    """The analytic gradient under every kind equals autodiff of its sag."""
    shape = _build(kind, kwargs)
    x = jnp.asarray([0.7, -2.2, 4.1])
    y = jnp.asarray([1.1, 3.0, -2.5])

    def scalar_sag(xi, yi):
        return shape.sag(xi, yi)

    gx = jax.vmap(jax.grad(scalar_sag, argnums=0))(x, y)
    gy = jax.vmap(jax.grad(scalar_sag, argnums=1))(x, y)
    _, n = shape.sag_and_normal(x, y)
    n = onp.asarray(n)
    # n ~ (-gx, -gy, 1)/norm  ->  gx = -n_x/n_z
    onp.testing.assert_allclose(-n[:, 0] / n[:, 2], onp.asarray(gx),
                                rtol=1e-9, atol=1e-11)
    onp.testing.assert_allclose(-n[:, 1] / n[:, 2], onp.asarray(gy),
                                rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_sag_finite_at_origin(kind, refname, kwargs):
    shape = _build(kind, kwargs)
    z, n = shape.sag_and_normal(jnp.asarray([0.0]), jnp.asarray([0.0]))
    assert onp.isfinite(onp.asarray(z)).all()
    assert onp.isfinite(onp.asarray(n)).all()


# ---------------------------------------------------------------------------
# reductions between kinds
# ---------------------------------------------------------------------------

def test_even_asphere_empty_coefs_equals_conic():
    X, Y = _grid()
    a = EvenAsphere(c=1 / 50.0, k=-0.5, coefs=())
    c = Conic(1 / 50.0, -0.5)
    onp.testing.assert_allclose(
        onp.asarray(a.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(c.sag(jnp.asarray(X), jnp.asarray(Y))), atol=1e-13)


def test_sphere_equals_conic_k0():
    X, Y = _grid()
    onp.testing.assert_allclose(
        onp.asarray(Sphere(1 / 70.0).sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(Conic(1 / 70.0, 0.0).sag(jnp.asarray(X),
                                             jnp.asarray(Y))), atol=1e-13)


def test_conic_kappa_minus_one_is_parabola():
    X, Y = _grid()
    c = 1 / 40.0
    z = onp.asarray(Conic(c, -1.0).sag(jnp.asarray(X), jnp.asarray(Y)))
    onp.testing.assert_allclose(z, c * (X * X + Y * Y) / 2, atol=1e-12)


def test_biconic_equal_axes_equals_conic():
    X, Y = _grid()
    b = Biconic(1 / 60.0, 1 / 60.0, -0.4, -0.4)
    c = Conic(1 / 60.0, -0.4)
    onp.testing.assert_allclose(
        onp.asarray(b.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(c.sag(jnp.asarray(X), jnp.asarray(Y))),
        rtol=1e-11, atol=1e-12)


def test_toroid_zero_y_terms_is_cylinder_x():
    X, Y = _grid()
    t = Toroid(1 / 80.0, 0.0, 0.0, ())
    z = onp.asarray(t.sag(jnp.asarray(X), jnp.asarray(Y)))
    s = onp.asarray(Sphere(1 / 80.0).sag(jnp.asarray(X),
                                         jnp.zeros_like(jnp.asarray(Y))))
    onp.testing.assert_allclose(z, s, atol=1e-12)


def test_q2d_zero_coefficients_matches_conic():
    X, Y = _grid()
    q = Q2D(c=1 / 100.0, k=-0.2, normalization_radius=9.0,
            cm0=[0.0], ams=[[0.0]], bms=[[0.0]])
    c = Conic(1 / 100.0, -0.2)
    onp.testing.assert_allclose(
        onp.asarray(q.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(c.sag(jnp.asarray(X), jnp.asarray(Y))),
        rtol=1e-11, atol=1e-12)


# ---------------------------------------------------------------------------
# intersections: closed forms vs Newton
# ---------------------------------------------------------------------------

def _bundle(n=64, h=10.0, z0=-20.0):
    rng = onp.random.default_rng(7)
    P = onp.zeros((n, 3))
    P[:, 0] = rng.uniform(-h, h, n)
    P[:, 1] = rng.uniform(-h, h, n)
    P[:, 2] = z0
    ang = rng.uniform(-0.08, 0.08, (n, 2))
    S = onp.stack([onp.sin(ang[:, 0]),
                   onp.sin(ang[:, 1]) * onp.cos(ang[:, 0]),
                   onp.cos(ang[:, 1]) * onp.cos(ang[:, 0])], axis=1)
    S = S / onp.linalg.norm(S, axis=1, keepdims=True)
    return jnp.asarray(P), jnp.asarray(S)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES[:4])
def test_analytic_intersect_matches_newton(kind, refname, kwargs):
    shape = _build(kind, kwargs)
    assert shape.analytic_intersect
    P, S = _bundle()
    Qa, na, va = shape.intersect(P, S)
    Qn, nn, vn = newton_intersect(P, S, shape.sag_and_normal)
    ok = onp.asarray(va) & onp.asarray(vn)
    assert ok.sum() > 40
    onp.testing.assert_allclose(onp.asarray(Qa)[ok], onp.asarray(Qn)[ok],
                                rtol=1e-9, atol=1e-9)


def test_paraboloid_axial_ray_returns_vertex():
    shape = Conic(1 / 30.0, -1.0)
    P = jnp.asarray([[0.0, 0.0, -10.0]])
    S = jnp.asarray([[0.0, 0.0, 1.0]])
    Q, n, v = shape.intersect(P, S)
    assert bool(v[0])
    onp.testing.assert_allclose(onp.asarray(Q[0]), [0, 0, 0], atol=1e-12)


def test_seeded_kind_surface_intersect_matches_newton():
    shape = EvenAsphere(c=1 / 60.0, k=-0.5, coefs=(1e-7,))
    s = Surface(shape=shape, interaction='refl', P=[0, 0, 0], aperture=12.0)
    P, S = _bundle(h=8.0)
    Qs, ns, vs = s.intersect(P, S)
    Qn, nn, vn = newton_intersect(P, S, shape.sag_and_normal)
    ok = onp.asarray(vs) & onp.asarray(vn)
    assert ok.sum() > 40
    onp.testing.assert_allclose(onp.asarray(Qs)[ok], onp.asarray(Qn)[ok],
                                rtol=1e-8, atol=1e-8)


def test_callable_shape_falls_back_to_plain_newton():
    user = CallableShape(lambda x, y: 0.01 * (x * x + y * y))
    s = Surface(shape=user, interaction='refl', P=[0, 0, 0])
    P, S = _bundle(h=5.0)
    Q, n, v = s.intersect(P, S)
    assert bool(onp.asarray(v).all())
    # the found points satisfy z = sag(x, y)
    Q = onp.asarray(Q)
    onp.testing.assert_allclose(Q[:, 2], 0.01 * (Q[:, 0] ** 2 + Q[:, 1] ** 2),
                                atol=1e-9)


def test_callable_shape_autodiff_normals():
    user = CallableShape(lambda x, y: 0.02 * x * x)
    z, n = user.sag_and_normal(jnp.asarray([3.0]), jnp.asarray([0.0]))
    gx = 0.04 * 3.0
    expect = onp.array([-gx, 0.0, 1.0]) / onp.hypot(gx, 1.0)
    onp.testing.assert_allclose(onp.asarray(n[0]), expect, atol=1e-10)


# ---------------------------------------------------------------------------
# kind-table / Shape contracts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_with_params_round_trips(kind, refname, kwargs):
    shape = _build(kind, kwargs)
    clone = shape.with_params(shape.params)
    assert clone.kind == shape.kind
    X, Y = _grid(n=9)
    onp.testing.assert_allclose(
        onp.asarray(clone.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(shape.sag(jnp.asarray(X), jnp.asarray(Y))), atol=1e-14)


@pytest.mark.parametrize('kind, refname, kwargs', _SHAPE_CASES)
def test_shape_is_a_pytree(kind, refname, kwargs):
    shape = _build(kind, kwargs)
    leaves, treedef = jax.tree_util.tree_flatten(shape)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt, Shape)
    assert rebuilt.kind == shape.kind
    X, Y = _grid(n=9)
    onp.testing.assert_allclose(
        onp.asarray(rebuilt.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(shape.sag(jnp.asarray(X), jnp.asarray(Y))), atol=1e-14)


def test_every_model_declares_consistent_dofs():
    for name, model in SHAPE_MODELS.items():
        assert model.name == name
        # every tag points at a declared DOF and tagged() resolves it
        for d in model.dofs:
            for tag in d.tags:
                assert d.name in model.tagged(tag)


def test_curvature_tags_resolve_for_all_curved_kinds():
    for kind, refname, kwargs in _SHAPE_CASES:
        model = SHAPE_MODELS[kind]
        if any(k in kwargs for k in ('c', 'c_x')):
            assert model.tagged('curvature'), kind


def test_params_returns_copy():
    s = Sphere(0.01)
    p = s.params
    p['c'] = 999.0
    assert s.params['c'] == 0.01


def test_unknown_kind_raises():
    with pytest.raises(KeyError):
        Shape('not_a_kind', c=0.0)


def test_grad_flows_through_shape_parameters():
    """Curvature is a live design variable through the kind table."""
    def f(c):
        return Sphere(c).sag(jnp.asarray(3.0), jnp.asarray(4.0))

    c0 = 1 / 50.0
    g = float(jax.grad(f)(jnp.asarray(c0)))
    h = 1e-7
    fd = (float(f(c0 + h)) - float(f(c0 - h))) / (2 * h)
    assert g == pytest.approx(fd, rel=1e-5)


def test_lensdata_row_round_trips_shape():
    from prysm_tpu.x.raytracing.lensdata import SurfaceRow
    shape = EvenAsphere(c=1 / 60.0, k=-0.5, coefs=(1e-6, -1e-9))
    row = SurfaceRow(shape, thickness=5.0, typ='refl')
    assert row.shape_kind == 'even_asphere'
    rebuilt = row.build_shape()
    assert rebuilt.kind == 'even_asphere'
    X, Y = _grid(n=9)
    onp.testing.assert_allclose(
        onp.asarray(rebuilt.sag(jnp.asarray(X), jnp.asarray(Y))),
        onp.asarray(shape.sag(jnp.asarray(X), jnp.asarray(Y))), atol=1e-14)


def test_lensdata_category_offsets_hit_real_dofs():
    from prysm_tpu.x.raytracing.lensdata import SurfaceRow
    row = SurfaceRow(Toroid(1 / 90.0, 1 / 100.0, -0.3, (1e-7,)),
                     thickness=5.0, typ='refl')
    cats = row.categories
    for name, offsets in cats.items():
        for off in offsets:
            assert 0 <= off < len(row.params)
    assert len(cats['curvature']) == 2
    assert len(cats['radius_x']) == 1


def test_callable_shape_rejected_by_lensdata_with_clear_error():
    from prysm_tpu.x.raytracing.lensdata import SurfaceRow
    user = CallableShape(lambda x, y: 0.0 * x)
    with pytest.raises(TypeError, match='registration'):
        SurfaceRow(user, thickness=1.0, typ='refl')


def test_surface_requires_shape_and_interaction():
    with pytest.raises(TypeError, match='shape'):
        Surface(interaction='refl', P=0.0)
    with pytest.raises(TypeError, match='interaction'):
        Surface(shape=Plane(), P=0.0)
    with pytest.raises(TypeError, match='pose'):
        Surface(shape=Plane(), interaction='refl')


def test_refractive_surface_requires_material():
    with pytest.raises(ValueError, match='material'):
        Surface(shape=Plane(), interaction='refract', P=0.0)
