"""Surface/lens-data contracts and seams: port of the reference intent.

Combines /root/reference/tests/x/raytracing/
test_raytracing_surfaces_sag_contract.py (sag == sag_and_normal),
test_raytracing_shape_descriptors.py (round-trip identity and the
one-place shape registry, re-expressed for the kind-table design),
test_line_math.py, test_glass_catalog_seam.py, and
test_raytracing_sensitivity.py.
"""
import numpy as np
import pytest

import jax  # NOQA: F401
import jax.numpy as jnp

import prysm_tpu.x.materials as materials
from prysm_tpu.x.materials.agf import AGFCatalog
from prysm_tpu.x.raytracing import LensData, OpticalSystem, _line_math
from prysm_tpu.x.raytracing.io import read_seq, read_zmx
from prysm_tpu.x.raytracing.sensitivity import merit_jacobian_free
from prysm_tpu.x.raytracing.paraxial import (
    effective_focal_length, paraxial_image_distance)
from prysm_tpu.x.raytracing.surfaces import (
    XY, Biconic, CallableShape, Chebyshev, Conic, EvenAsphere, Jacobi,
    OffAxisConic, Plane, Q2D, SHAPE_MODELS, SagModel, Shape, Sphere, Surface,
    Toroid, Zernike)

REF_AGF_DATA = '/root/reference/tests/x/raytracing/data/materials'


def _np(x):
    return np.asarray(x)


SHAPES = {
    'plane': Plane(),
    'sphere': Sphere(1 / 50.0),
    'conic': Conic(1 / 50.0, -0.5),
    'off_axis_conic': OffAxisConic(1 / 50.0, -0.5, dx=10.0, dy=5.0),
    'even_asphere': EvenAsphere(1 / 50.0, -0.5, (1e-4, 1e-6)),
    'q2d': Q2D(1 / 50.0, -0.5, 10.0, (0.0, 1e-3), ((1e-4,),), ((0.0,),),
               dx=0.0, dy=0.0),
    'zernike': Zernike(1 / 50.0, -0.5, 10.0, [(2, 0), (4, 0), (3, 1)],
                       (1e-3, 2e-4, 3e-4), norm=True),
    'xy': XY(1 / 50.0, -0.5, 10.0, [(2, 0), (0, 2)], (1e-4, 2e-4)),
    'chebyshev': Chebyshev(1 / 50.0, -0.5, 10.0, 10.0, [(2, 0), (0, 2)],
                           (1e-4, 2e-4)),
    'jacobi': Jacobi(1 / 50.0, -0.5, 10.0, 0.0, 0.0, [2, 4],
                     (1e-3, 2e-4)),
    'toroid': Toroid(1 / 50.0, 1 / 40.0, -0.3, (1e-4,)),
    'biconic': Biconic(1 / 50.0, 1 / 40.0, -0.2, -0.3),
}


def _params_equal(a, b):
    a, b = a or {}, b or {}
    assert set(a) == set(b)
    for key in a:
        va, vb = a[key], b[key]
        try:
            np.testing.assert_allclose(np.asarray(va, dtype=float),
                                       np.asarray(vb, dtype=float))
        except (TypeError, ValueError):
            assert va == vb


# ---------- sag contract -----------------------------------------------------

@pytest.mark.parametrize('shape', SHAPES.values(), ids=SHAPES.keys())
def test_sag_matches_sag_and_normal(shape):
    surf = Surface(shape=shape, interaction='reflect',
                   P=np.array([0.0, 0.0, 0.0]))
    x = np.linspace(-2.0, 2.0, 11)
    y = np.linspace(-2.0, 2.0, 11)
    z_sag = _np(surf.sag(x, y))
    z_normal = _np(surf.sag_and_normal(x, y)[0])
    np.testing.assert_allclose(z_sag, z_normal, rtol=0, atol=1e-12)


def test_shape_required_by_init():
    with pytest.raises(TypeError):
        Surface(interaction='reflect', P=[0, 0, 0])


# ---------- round-trip identity through LensData -----------------------------

@pytest.mark.parametrize('shape', SHAPES.values(), ids=SHAPES.keys())
def test_lensdata_row_round_trips(shape):
    ld = LensData()
    ld.add(shape, thickness=5.0, material=materials.air)
    rebuilt = ld.rows[1].build_shape()
    assert rebuilt.kind == shape.kind
    _params_equal(shape.params, rebuilt.params)


def test_categories_reference_real_dofs():
    """Every kind-table category resolves to declared DOF names."""
    for model in SHAPE_MODELS.values():
        declared = {d.name for d in model.dofs}
        for dof in model.dofs:
            assert dof.name in declared


# ---------- one-place shape registry -----------------------------------------

def test_adding_a_kind_edits_one_place():
    """A user SagModel registered in the kind table packs into LensData."""
    from prysm_tpu.x.raytracing.surfaces import DOF, _model
    name = '_toy_parabola_test'

    def field(p, x, y):
        c = p['c']
        return 0.5 * c * (x * x + y * y), c * x, c * y

    if name not in SHAPE_MODELS:
        _model(name=name,
               dofs=(DOF('c', False, ('curvature', 'radius')),),
               field=field)
    try:
        shape = Shape(SHAPE_MODELS[name], {'c': 1 / 25.0})
        ld = LensData()
        ld.add(shape, thickness=2.0, material=materials.air)
        row = ld.rows[1]
        assert 'curvature' in row.categories
        rebuilt = row.build_shape()
        assert rebuilt.kind == name
        np.testing.assert_allclose(float(rebuilt.params['c']), 1 / 25.0)
    finally:
        SHAPE_MODELS.pop(name, None)


def test_unregistered_shape_raises_clear_error():
    ld = LensData()
    with pytest.raises(TypeError, match='LensData registration'):
        ld.add(CallableShape(lambda x, y: 0 * x), material=materials.air)


# ---------- line math --------------------------------------------------------

def test_unit_vector_between():
    np.testing.assert_allclose(
        _np(_line_math.unit_vector_between([0., 0., 0.], [0, 0, 3])),
        [0, 0, 1])


def test_closest_point_on_line_to_line():
    pt = _line_math.closest_point_on_line_to_line(
        np.array([0., 1., 0.]), np.array([1., 0., 0.]),
        np.array([0., 0., 0.]), np.array([0., 0., 1.]))
    np.testing.assert_allclose(_np(pt), [0., 0., 0.], atol=1e-12)


# ---------- glass-catalog seam -----------------------------------------------

ZMX_NBK7 = """VERS 100000 0
MODE SEQ
UNIT MM
WAVL 0.5875618
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV 0.02
  DISZ 5.0
  GLAS N-BK7
SURF 2
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
"""

SEQ_NBK7 = """LEN
CUM
DIM M
WL 587.5618
SO 0 1E10
S 0.02 5 N-BK7_SCHOTT
SI
GO
"""

ZMX_MIRROR_AIR = """VERS 100000 0
MODE SEQ
UNIT MM
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV 0.0
  DISZ 5.0
  GLAS MIRROR
SURF 2
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
"""

SEQ_MIRROR_AIR = """LEN
CUM
DIM M
SO 0 1E10
S 0 5 REFL
SI
GO
"""


def agf_catalog():
    return AGFCatalog.from_files([f'{REF_AGF_DATA}/tiny_schott.agf',
                                  f'{REF_AGF_DATA}/tiny_ohara.agf'])


def test_lookup_accepts_catalog_adapter():
    material = materials.lookup('N-BK7', database=agf_catalog())
    assert material.name == 'N-BK7'
    assert float(material(0.5875618)) == pytest.approx(1.5168000345)


def test_readers_accept_catalog_adapter():
    catalog = agf_catalog()
    zmx = read_zmx(ZMX_NBK7, _is_text=True, database=catalog)
    seq = read_seq(SEQ_NBK7, _is_text=True, database=catalog)
    assert float(zmx.to_surfaces()[1].material.n(0.5875618)) == \
        pytest.approx(1.5168000345)
    assert float(seq.to_surfaces()[1].material.n(0.5875618)) == \
        pytest.approx(1.5168000345)


class ExplodingCatalog:
    def material_for_name(self, name):
        raise AssertionError(f'unexpected material lookup for {name}')


def test_air_and_mirror_paths_bypass_catalog():
    read_zmx(ZMX_MIRROR_AIR, _is_text=True, database=ExplodingCatalog())
    read_seq(SEQ_MIRROR_AIR, _is_text=True, database=ExplodingCatalog())


# ---------- sensitivity: merit Jacobian over the free vector -----------------

def test_fd_jacobian_single_sphere_curvature():
    n_glass = 1.5
    c0 = 1.0 / 50.0
    expected = -n_glass / ((n_glass - 1.0) * c0 * c0)
    ld = LensData().add(Conic(c0, 0.0), typ='refr',
                        material=materials.ConstantMaterial(n_glass),
                        thickness=0.0)
    sys_ = OpticalSystem(ld)
    sys_.opt.vary('curvature', surfaces=1)
    J = merit_jacobian_free(
        sys_.opt,
        lambda: float(paraxial_image_distance(ld.to_surfaces(),
                                              wvl=0.55e-3)),
        step=1e-7)
    np.testing.assert_allclose(J[0], expected, rtol=1e-5)


def test_fd_jacobian_efl_doublet_curvatures():
    n_glass = 1.5
    c1, c2 = 1.0 / 100.0, -1.0 / 100.0
    f = 1.0 / ((n_glass - 1.0) * (c1 - c2))
    ld = (LensData()
          .add(Conic(c1, 0.0), typ='refr',
               material=materials.ConstantMaterial(n_glass), thickness=1e-9)
          .add(Conic(c2, 0.0), typ='refr', material=materials.air,
               thickness=0.0))
    sys_ = OpticalSystem(ld)
    sys_.opt.vary('curvature', surfaces=[1, 2])
    J = merit_jacobian_free(
        sys_.opt,
        lambda: float(effective_focal_length(ld.to_surfaces(),
                                             wvl=0.55e-3)),
        step=1e-7)
    np.testing.assert_allclose(J[0], -f * f * (n_glass - 1.0), rtol=1e-5)
    np.testing.assert_allclose(J[1], +f * f * (n_glass - 1.0), rtol=1e-5)


def test_fd_jacobian_restores_free_vector():
    ld = LensData().add(Conic(1 / 50.0, 0.0), typ='refr',
                        material=materials.ConstantMaterial(1.5),
                        thickness=0.0)
    sys_ = OpticalSystem(ld)
    sys_.opt.vary('curvature', surfaces=1)
    x0 = np.asarray(sys_.opt.pack())
    merit_jacobian_free(
        sys_.opt,
        lambda: float(paraxial_image_distance(ld.to_surfaces(),
                                              wvl=0.55e-3)))
    np.testing.assert_allclose(np.asarray(sys_.opt.pack()), x0)


def test_fd_jacobian_unknown_method_raises():
    ld = LensData().add(Conic(1 / 50.0, 0.0), typ='refr',
                        material=materials.ConstantMaterial(1.5),
                        thickness=0.0)
    sys_ = OpticalSystem(ld)
    sys_.opt.vary('curvature', surfaces=1)
    with pytest.raises(ValueError, match='method must be'):
        merit_jacobian_free(
            sys_.opt,
            lambda: float(paraxial_image_distance(ld.to_surfaces(),
                                                  wvl=0.55e-3)),
            method='nope')
