"""Materials depth: port of the reference x/materials suites' intent.

Behavior matrix of the reference tests for core materials (missing-k
policies, range guards, temperature forwarding, derivative edge
cases), tabulated and temperature-grid interpolation, the index-spec
resolver, catalog/registry query semantics, AGF parsing, the
refractiveindex.info database reader (against a tiny on-disk fixture
database), CHARMS models, and material transforms.
"""
import textwrap

import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu.conf import config
import prysm_tpu.x.materials as mat
from prysm_tpu.x.materials import (
    AGFCatalog, AGFMaterial, AmbiguousMaterialError, Catalog, CatalogChain,
    ConstantMaterial, FormulaMaterial, IndexOffsetMaterial,
    IsothermalMaterial, MIRROR, MaterialRangeError, MaterialRegistry,
    MissingKError, RefractiveIndexCatalog, StressOpticMaterial,
    TabulatedMaterial, TemperatureGridMaterial, TemperatureShiftedMaterial,
    air, lookup, model_glass, resolve_index, vacuum,
)

REF_AGF_DATA = '/root/reference/tests/x/raytracing/data/materials'


# ---------- core -------------------------------------------------------------

def test_constant_material_scalar_vector_nk():
    m = ConstantMaterial(1.5, name='absorber', k=0.02)
    assert float(m(0.55)) == pytest.approx(1.5)
    np.testing.assert_allclose(np.asarray(m.n([0.5, 0.6])), [1.5, 1.5])
    assert float(m.k(0.55)) == pytest.approx(0.02)
    assert complex(m.nk(0.55)) == pytest.approx(1.5 + 0.02j)


def test_missing_k_policies():
    assert float(ConstantMaterial(1.5, name='t', missing_k='zero').k(0.55)) \
        == pytest.approx(0)
    with pytest.raises(MissingKError):
        ConstantMaterial(1.5, name='u', missing_k='raise').k(0.55)


def test_range_guards_raise_by_default():
    m = ConstantMaterial(1.5, name='limited', wavelength_range=(0.4, 0.8),
                         temperature_range=(80, 300))
    with pytest.raises(MaterialRangeError, match='wavelength'):
        m.n(0.3)
    with pytest.raises(MaterialRangeError, match='temperature'):
        m.n(0.55, temperature=20)


def test_formula_material_metrics():
    m = FormulaMaterial('linear', lambda w, a, b: a + b * w, (1.4, 0.2),
                        wavelength_range=(0.4, 0.8))
    assert float(m.n(0.5)) == pytest.approx(1.5)
    assert float(m.dispersion(0.6, 0.5)) == pytest.approx(0.02)
    assert float(m.dn_dlambda(0.5)) == pytest.approx(0.2, rel=1e-6)


def test_formula_material_temperature_forwarding():
    def disp(wvl_um, base, slope, temperature=None):
        n = base + slope * wvl_um
        if temperature is not None:
            n = n + 1e-3 * (temperature - 300)
        return n

    m = FormulaMaterial('thermo', disp, (1.4, 0.2))
    assert float(m.n(0.5)) == pytest.approx(1.5)
    assert float(m.n(0.5, temperature=400)) == pytest.approx(1.6)
    # a plain wavelength-only callable ignores the temperature
    plain = FormulaMaterial('plain', lambda w, a, b: a + b * w, (1.4, 0.2))
    assert float(plain.n(0.5, temperature=400)) == pytest.approx(1.5)


def test_dn_dlambda_one_sided_at_band_edges():
    m = FormulaMaterial('linear', lambda w, a, b: a + b * w, (1.4, 0.2),
                        wavelength_range=(0.4, 0.8))
    assert float(m.dn_dlambda(0.8)) == pytest.approx(0.2, rel=1e-6)
    assert float(m.dn_dlambda(0.4)) == pytest.approx(0.2, rel=1e-6)


def test_dn_dlambda_zero_width_range_is_zero():
    m = FormulaMaterial('z', lambda w, a: a + 0 * w, (1.5,),
                        wavelength_range=(0.5, 0.5))
    assert float(m.dn_dlambda(0.5)) == pytest.approx(0.0)


def test_dn_dT_single_temperature_grid_is_zero():
    m = TemperatureGridMaterial('g', [0.5, 1.0], [300], [[1.5, 1.6]],
                                layout=('temperature', 'wavelength'))
    assert float(m.dn_dT(0.75, 300)) == pytest.approx(0.0)


def test_constant_material_uses_config_precision():
    old = config.precision
    try:
        config.precision = np.float32
        m = ConstantMaterial(1.5, name='c', k=0.01)
        assert np.asarray(m.n([0.5, 0.6])).dtype == np.dtype(np.float32)
        assert np.asarray(m.k([0.5, 0.6])).dtype == np.dtype(np.float32)
    finally:
        config.precision = old


def test_model_glass_reproduces_nd_vd():
    nd, vd = 1.658, 32.7
    g = model_glass(nd, vd)
    d, f, c = 0.5875618, 0.4861327, 0.6562725
    assert float(g.n(d)) == pytest.approx(nd, abs=1e-9)
    assert float((g.n(d) - 1) / (g.n(f) - g.n(c))) == pytest.approx(vd,
                                                                    rel=1e-9)
    assert g.metadata['model_glass'] is True


# ---------- tabulated --------------------------------------------------------

def test_tabulated_interpolates_n_and_log_k():
    m = TabulatedMaterial('film', [0.4, 0.6, 0.8], [1.4, 1.5, 1.6],
                          k=[1e-4, 1e-3, 1e-2], k_interpolation='log')
    assert float(m.n(0.5)) == pytest.approx(1.45)
    assert float(m.k(0.5)) == pytest.approx(np.sqrt(1e-7))
    np.testing.assert_allclose(np.asarray(m.nk([0.4, 0.8])),
                               [1.4 + 1e-4j, 1.6 + 1e-2j])


def test_tabulated_nearest_and_range():
    m = TabulatedMaterial('nearest', [0.4, 0.6, 0.8], [1.4, 1.5, 1.6],
                          interpolation='nearest')
    assert float(m.n(0.51)) == pytest.approx(1.5)
    with pytest.raises(MaterialRangeError):
        m.n(0.2)


def test_tabulated_linear_extrapolation():
    m = TabulatedMaterial('linear', [1.0, 2.0], [1.0, 3.0], extrapolate=True)
    assert float(m.n(3.0)) == pytest.approx(5.0)
    assert float(m.n(0.0)) == pytest.approx(-1.0)


def test_temperature_grid_bilinear():
    m = TemperatureGridMaterial('grid', [0.5, 1.0], [100, 300],
                                [[1.6, 2.1], [1.8, 2.3]],
                                layout=('temperature', 'wavelength'))
    assert float(m.n(0.75, temperature=200)) == pytest.approx(1.95)
    np.testing.assert_allclose(np.asarray(m.n([0.5, 1.0], temperature=100)),
                               [1.6, 2.1])
    np.testing.assert_allclose(np.asarray(m.k(0.75, temperature=[100, 300])),
                               [0, 0])


def test_temperature_grid_extrapolation():
    m = TemperatureGridMaterial('grid', [1.0, 2.0], [10.0, 20.0],
                                [[2.0, 3.0], [3.0, 4.0]], extrapolate=True,
                                layout=('temperature', 'wavelength'))
    assert float(m.n(3.0, temperature=30.0)) == pytest.approx(6.0)


def test_temperature_grid_derivative_grids():
    m = TemperatureGridMaterial('grid', [0.5, 1.0], [100, 300],
                                [[1.6, 2.1], [1.8, 2.3]],
                                dn_dT=[[1e-3, 1e-3], [1e-3, 1e-3]],
                                layout=('temperature', 'wavelength'))
    assert float(m.dn_dT(0.75, 200)) == pytest.approx(1e-3)
    assert float(m.dn_dlambda(0.75, temperature=200)) == pytest.approx(
        1.0, rel=1e-6)


def test_temperature_grid_2d_query_matches_elementwise():
    m = TemperatureGridMaterial(
        'grid', [0.5, 1.0, 1.5], [100, 200, 300],
        [[1.50, 1.55, 1.60], [1.52, 1.58, 1.63], [1.54, 1.61, 1.66]],
        layout=('temperature', 'wavelength'))
    wq = np.array([[0.6, 0.9], [1.2, 1.4]])
    tq = np.array([[150.0, 250.0], [120.0, 280.0]])
    out = np.asarray(m.n(wq, temperature=tq))
    assert out.shape == (2, 2)
    for i in range(2):
        for j in range(2):
            assert out[i, j] == pytest.approx(
                float(m.n(float(wq[i, j]), temperature=float(tq[i, j]))))


def test_tabulated_precision_and_query_dtype():
    old = config.precision
    try:
        config.precision = np.float32
        m = TabulatedMaterial('film', [0.4, 0.6, 0.8], [1.4, 1.5, 1.6])
        assert np.asarray(m.wavelengths).dtype == np.dtype(np.float32)
        assert np.asarray(m.n([0.5])).dtype == np.dtype(np.float32)
        assert np.asarray(
            m.n(np.array([0.5], dtype=np.float64))).dtype == np.float64
    finally:
        config.precision = old


def test_temperature_grid_respects_config_precision():
    old = config.precision
    try:
        config.precision = np.float32
        m = TemperatureGridMaterial(
            'grid', [0.5, 1.0], [100, 300], [[1.6, 2.1], [1.8, 2.3]],
            layout=('temperature', 'wavelength'))
        assert np.asarray(m.n_grid).dtype == np.dtype(np.float32)
        assert np.asarray(m.n(0.75, temperature=200)).dtype == \
            np.dtype(np.float32)
    finally:
        config.precision = old


def test_temperature_grid_square_layout_warns():
    grid = [[1.6, 2.1], [1.8, 2.3]]
    with pytest.warns(UserWarning, match='square'):
        TemperatureGridMaterial('g', [0.5, 1.0], [100, 300], grid)
    default = TemperatureGridMaterial(
        'g', [0.5, 1.0], [100, 300], grid,
        layout=('temperature', 'wavelength'))
    transposed = TemperatureGridMaterial(
        'g', [0.5, 1.0], [100, 300], grid,
        layout=('wavelength', 'temperature'))
    assert float(default.n(1.0, temperature=100)) == pytest.approx(2.1)
    assert float(transposed.n(1.0, temperature=100)) == pytest.approx(1.8)


def test_temperature_grid_missing_k_raise():
    m = TemperatureGridMaterial('g', [0.5, 1.0], [100, 300],
                                [[1.5, 1.6], [1.7, 1.8]], missing_k='raise',
                                layout=('temperature', 'wavelength'))
    with pytest.raises(MissingKError):
        m.k(0.75, temperature=200)


def test_temperature_grid_rejects_duplicate_axis():
    with pytest.raises(ValueError, match='strictly increasing'):
        TemperatureGridMaterial('g', [0.5, 0.5], [100, 300],
                                [[1.5, 1.6], [1.7, 1.8]],
                                layout=('temperature', 'wavelength'))


# ---------- resolver / lookup ------------------------------------------------

def test_resolve_index_sentinels():
    assert resolve_index(None) is None
    assert resolve_index(MIRROR) is MIRROR
    assert resolve_index('MIRROR') is MIRROR
    assert resolve_index('mirror') is MIRROR
    assert resolve_index('') is air
    assert resolve_index('   ') is air
    assert resolve_index('AIR') is air
    assert resolve_index('vacuum') is air


def test_air_singleton_protocol():
    for medium in (air, vacuum):
        assert float(medium.n(0.55)) == 1.0
        assert complex(medium.nk(0.55)) == 1.0 + 0j
        assert float(medium(0.55)) == 1.0


def test_resolve_index_numbers_and_callables():
    assert float(resolve_index(1.5)(0.55)) == 1.5
    assert complex(resolve_index(1.2 + 0.3j)(0.55)) == 1.2 + 0.3j
    f = lambda wvl: 2.0  # NOQA
    assert resolve_index(f) is f
    m = ConstantMaterial(1.7, name='glass')
    assert resolve_index(m) is m


def test_resolve_index_name_needs_resolver():
    with pytest.raises(TypeError, match='catalog'):
        resolve_index('N-BK7')
    catalog = Catalog.from_materials([ConstantMaterial(1.5168, name='N-BK7')])
    resolved = resolve_index('N-BK7', name_resolver=catalog.material_for_name)
    assert float(resolved.n(0.55)) == pytest.approx(1.5168)


def test_lookup_projections():
    catalog = Catalog.from_materials([ConstantMaterial(1.5168, name='N-BK7')])
    assert lookup(None) is air
    assert lookup('') is air
    assert lookup('AIR') is air
    assert lookup('MIRROR') is MIRROR
    assert float(lookup('N-BK7', database=catalog).n(0.55)) == \
        pytest.approx(1.5168)


# ---------- catalog / registry ----------------------------------------------

def test_catalog_chain_namespace_and_ambiguity():
    schott = Catalog.from_materials([
        ConstantMaterial(1.5, name='N-BK7', catalog='SCHOTT',
                         metadata={'aliases': ('BK7',)})])
    ohara = Catalog.from_materials([
        ConstantMaterial(1.52, name='S-BSL7', catalog='OHARA',
                         metadata={'aliases': ('BK7',)})])
    chain = CatalogChain([schott, ohara])
    assert float(chain['SCHOTT:N-BK7'].n(0.55)) == pytest.approx(1.5)
    with pytest.raises(AmbiguousMaterialError):
        chain.material_for_name('BK7')


def test_primary_name_beats_alias():
    schott = Catalog.from_materials([
        ConstantMaterial(1.717, name='LAF3', catalog='SCHOTT'),
        ConstantMaterial(1.720, name='N-LAF3', catalog='SCHOTT',
                         metadata={'aliases': ('LAF3',)})])
    assert float(schott.material_for_name('LAF3').n(0.55)) == \
        pytest.approx(1.717)


def test_alias_only_collision_stays_ambiguous():
    schott = Catalog.from_materials([
        ConstantMaterial(1.720, name='N-LAF3', catalog='SCHOTT',
                         metadata={'aliases': ('LAF3',)}),
        ConstantMaterial(1.721, name='P-LAF3', catalog='SCHOTT',
                         metadata={'aliases': ('LAF3',)})])
    with pytest.raises(AmbiguousMaterialError):
        schott.material_for_name('LAF3')


def test_registry_shared_record_query():
    registry = MaterialRegistry.from_catalogs(Catalog.from_materials([
        ConstantMaterial(1.5, name='N-BK7', catalog='SCHOTT'),
        ConstantMaterial(1.52, name='S-BSL7', catalog='OHARA')]))
    assert float(registry.material_for_name('N-BK7').n(0.55)) == \
        pytest.approx(1.5)
    assert float(registry['OHARA:S-BSL7'].n(0.55)) == pytest.approx(1.52)


def test_registry_metadata_and_computed_search():
    low = TabulatedMaterial('low', [0.4, 0.8], [1.45, 1.46], k=[0, 0],
                            catalog='LAB', process='IBS')
    high = TabulatedMaterial('high', [0.4, 0.8], [2.0, 2.1], k=[0.1, 0.1],
                             catalog='LAB', process='ebeam')
    registry = MaterialRegistry.from_catalogs(
        Catalog.from_materials([low, high]))
    records = registry.search(wavelength_range_contains=(0.45, 0.65),
                              process='IBS', n_at=(0.55, 1.44, 1.47),
                              k_max=(0.55, 1e-6))
    assert [r.name for r in records] == ['low']


def test_registry_matching_semantics():
    m = ConstantMaterial(1.5, name='N-BK7', catalog='SCHOTT', process='IBS',
                         metadata={'aliases': ('BK7',)})
    registry = MaterialRegistry.from_catalogs(Catalog.from_materials([m]))
    assert [r.name for r in registry.search(query='N BK7')] == ['N-BK7']
    assert [r.name for r in registry.search(process='ibs')] == ['N-BK7']
    assert [r.name for r in registry.search(catalog='schott')] == ['N-BK7']


def test_registry_criteria_arity_validation():
    registry = MaterialRegistry.from_catalogs(Catalog.from_materials([
        ConstantMaterial(1.5, name='glass')]))
    with pytest.raises(ValueError, match='n_at criterion expects'):
        registry.search(n_at=(0.55,))
    with pytest.raises(ValueError, match='n_at criterion must be a sequence'):
        registry.search(n_at=0.55)
    with pytest.raises(ValueError, match='k_max criterion expects'):
        registry.search(k_max=(0.55, 1e-6, None, 'extra'))


def test_registry_k_max_missing_k_is_transparent():
    opaque_unknown = ConstantMaterial(2.0, name='X', missing_k='raise',
                                      catalog='LAB')
    clear = ConstantMaterial(1.5, name='Y', missing_k='zero', catalog='LAB')
    registry = MaterialRegistry.from_catalogs(
        Catalog.from_materials([opaque_unknown, clear]))
    names = {r.name for r in registry.search(k_max=(0.55, 1e-6))}
    assert names == {'X', 'Y'}


# ---------- AGF --------------------------------------------------------------

def test_agf_parses_materials_and_metadata():
    catalog = AGFCatalog.from_file(f'{REF_AGF_DATA}/tiny_schott.agf')
    m = catalog.material_for_name('N-BK7')
    assert m.name == 'N-BK7'
    assert m.catalog == 'SCHOTT'
    assert m.page_info['page'] == 'N-BK7'
    assert float(m.k(0.55)) == pytest.approx(0)


def test_agf_sellmeier_values_and_range():
    m = AGFCatalog.from_file(
        f'{REF_AGF_DATA}/tiny_schott.agf').material_for_name('N-BK7')
    assert float(m.n(0.5875618)) == pytest.approx(1.5168000345)
    np.testing.assert_allclose(
        np.asarray(m.n(np.array([0.4861327, 0.6562725]))),
        [1.52237629, 1.51432235], rtol=1e-6)
    with pytest.raises(ValueError, match='outside valid range'):
        m.n(0.25)


def test_agf_utf16_and_extended_metadata(tmp_path):
    path = tmp_path / 'utf16.agf'
    text = ('CC UTF-16 test catalog\n'
            'NM TEST 1 0 1.500000 50.0 0\n'
            'GC test glass\n'
            'CD 2.25 0 0 0 0 0\n'
            'MD 82.00 0.21 580 820.000 1.19\n'
            'BD 0.588 2.77 0.80 3.57\n'
            'LD 0.4 0.8\n')
    path.write_bytes(text.encode('utf-16'))
    m = AGFCatalog.from_file(path, namespace='TESTCAT').material_for_name(
        'TEST')
    assert float(m.n(0.55)) == pytest.approx(1.5)
    assert m.metadata['MD'] == ('82.00 0.21 580 820.000 1.19',)
    assert m.metadata['BD'] == ('0.588 2.77 0.80 3.57',)


def test_agf_formula_13():
    m = AGFMaterial(name='SAMPLE', catalog='HIKARI', formula=13,
                    coefficients=(2.45448839, -0.00867148963, -0.00010471524,
                                  0.0176039752, 0.000154610243,
                                  0.0000559918259, -0.00000501297284,
                                  0.00000031755799, 0, 0))
    assert float(m.n(0.5875618)) == pytest.approx(1.582670, abs=1e-6)


def test_agf_ambiguous_lookup_explicit():
    text = 'NM N-BK7 1\nCD 2.25 0 0 0 0 0\nLD 0.4 0.8\n'
    chain = CatalogChain([AGFCatalog.from_text(text, namespace='ONE'),
                          AGFCatalog.from_text(text, namespace='TWO')])
    with pytest.raises(AmbiguousMaterialError):
        chain.material_for_name('N-BK7')
    assert float(chain['ONE:N-BK7'].n(0.55)) == pytest.approx(1.5)


def test_agf_record_material_class():
    cat = AGFCatalog.from_text('NM SCH 1\nCD 2.25 0 0 0 0 0\nLD 0.4 0.8\n',
                               namespace='SCH')
    record = next(iter(cat.records()))
    assert record.material_class == 'AGFMaterial'
    registry = MaterialRegistry.from_catalogs(cat)
    assert [r.name for r in registry.search(material_class='AGFMaterial')] \
        == ['SCH']


# ---------- refractiveindex.info reader --------------------------------------

_RII_CATALOG = """\
- SHELF: vendor
  name: vendor
  content:
    - DIVIDER: "schott"
    - BOOK: SCHOTT-optical
      content:
        - PAGE: N-BK7
          data: vendorpages/N-BK7.yml
- SHELF: generic
  content:
    - BOOK: BK7
      content:
        - PAGE: N-BK7
          data: genericbook/N-BK7.yml
- SHELF: oxides
  content:
    - BOOK: SiO2
      content:
        - PAGE: Malitson
          data: oxides/SiO2/first.yml
        - PAGE: Other
          data: oxides/SiO2/second.yml
- SHELF: composite
  content:
    - BOOK: HYBRID
      content:
        - PAGE: nk
          data: composite/HYBRID/nk.yml
"""

_RII_SELLMEIER = ('0 1.03961212 0.00600069867 0.231792344 0.0200179144 '
                  '1.01046945 103.560653')

_RII_FILES = {
    'vendorpages/N-BK7.yml': f"""\
        DATA:
          - type: formula 2
            wavelength_range: 0.3 2.5
            coefficients: {_RII_SELLMEIER}
    """,
    'genericbook/N-BK7.yml': """\
        DATA:
          - type: tabulated n
            data: |
              0.4 1.61
              0.6 1.60
              0.8 1.59
    """,
    'oxides/SiO2/first.yml': """\
        DATA:
          - type: tabulated nk
            data: |
              0.4 1.44 0.0
              0.5 1.45 0.001
              0.6 1.46 0.002
    """,
    'oxides/SiO2/second.yml': """\
        DATA:
          - type: tabulated nk
            data: |
              0.4 1.55 0.01
              0.6 1.60 0.02
              0.8 1.65 0.03
    """,
    'composite/HYBRID/nk.yml': f"""\
        DATA:
          - type: formula 2
            wavelength_range: 0.3 2.5
            coefficients: {_RII_SELLMEIER}
          - type: tabulated k
            data: |
              0.3 0.15
              1.0 0.25
              2.5 0.35
    """,
}


@pytest.fixture(scope='module')
def rii_db_path(tmp_path_factory):
    root = tmp_path_factory.mktemp('riidb')
    (root / 'catalog-nk.yml').write_text(_RII_CATALOG)
    for rel, body in _RII_FILES.items():
        path = root / 'data' / rel
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(textwrap.dedent(body))
    return root


@pytest.fixture
def rii_catalog(rii_db_path):
    return RefractiveIndexCatalog.from_database(db_path=rii_db_path,
                                                download=False)


def test_rii_default_db_path_name():
    assert mat.default_db_path().name == '.refractiveindex.info-database'


def test_rii_missing_folder_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        RefractiveIndexCatalog.from_database(db_path=tmp_path / 'nope',
                                             download=False)


def test_rii_formula_lookup_and_page_info(rii_catalog):
    m = rii_catalog.material_for_name('N-BK7')
    assert float(m.n(0.5875618)) == pytest.approx(1.5168000345005885,
                                                  rel=1e-12)
    assert float(m.k(0.5)) == pytest.approx(0.0)
    assert m.page_info['book'] == 'SCHOTT-optical'
    assert m.page_info['page'] == 'N-BK7'
    assert set(m.page_info) == {'shelf', 'book', 'page', 'filepath',
                                'rangeMin', 'rangeMax'}


def test_rii_out_of_range_raises(rii_catalog):
    with pytest.raises(MaterialRangeError):
        rii_catalog.material_for_name('N-BK7').n(0.2)


def test_rii_case_insensitive(rii_catalog):
    assert float(rii_catalog.material_for_name('n-bk7').n(0.5875618)) == \
        pytest.approx(1.5168000345005885, rel=1e-12)


def test_rii_tabulated_nk_and_page_qualifier(rii_catalog):
    m = rii_catalog.material_for_name('SiO2', page='Malitson')
    assert float(m.n(0.5)) == pytest.approx(1.45)
    assert float(m.k(0.5)) == pytest.approx(0.001)
    assert complex(m.nk(0.6)) == pytest.approx(1.46 + 0.002j)
    assert m.page_info['page'] == 'Malitson'


def test_rii_ambiguous_resolves_ranked_best(rii_catalog):
    assert rii_catalog.material_for_name('SiO2').page_info['page'] == \
        'Malitson'
    other = rii_catalog.material_for_name('SiO2', page='Other')
    assert float(other.n(0.6)) == pytest.approx(1.60)


def test_rii_unknown_raises(rii_catalog):
    with pytest.raises(KeyError):
        rii_catalog.material_for_name('UNOBTAINIUM')


def test_rii_formula_n_with_tabulated_k_stays_analytic(rii_catalog):
    m = rii_catalog.material_for_name('HYBRID')
    assert isinstance(m, FormulaMaterial)
    assert float(m.n(0.5875618)) == pytest.approx(1.5168000345005885,
                                                  rel=1e-9)
    assert float(m.k(0.65)) == pytest.approx(0.20)


def test_rii_single_sample_page_is_constant():
    m = mat.RefractiveIndexMaterial('X', [0.55], [2.0], k=[0.01])
    assert float(m.n(0.4)) == pytest.approx(2.0)
    assert float(m.n(1.0)) == pytest.approx(2.0)
    assert float(m.k(0.7)) == pytest.approx(0.01)


# ---------- CHARMS / infrared ------------------------------------------------

def test_charms_silicon_measured_index():
    si = mat.charms_silicon()
    assert float(si.n(4.0, temperature=295.0)) == pytest.approx(3.42589,
                                                                abs=2e-4)
    assert float(si.n(4.0, temperature=100.0)) == pytest.approx(3.40110,
                                                                abs=2e-4)


def test_charms_germanium_measured_index_and_dn_dt():
    ge = mat.charms_germanium()
    assert float(ge.n(4.0, temperature=295.0)) == pytest.approx(4.02577,
                                                                abs=2e-4)
    assert float(ge.n(4.0, temperature=100.0)) == pytest.approx(3.95900,
                                                                abs=2e-4)
    dndt = (float(ge.n(4.0, temperature=296.0))
            - float(ge.n(4.0, temperature=294.0))) / 2.0
    assert dndt == pytest.approx(4.0e-4, rel=0.2)


def test_sapphire_ordinary_known_index():
    sap = mat.sapphire_ordinary()
    assert float(sap.n(0.5876)) == pytest.approx(1.7677, abs=2e-3)
    assert float(sap.n(2.0)) == pytest.approx(1.7372, abs=2e-3)


def test_infrared_catalog_codev_tokens():
    ir = mat.infrared_catalog(temperature=295.0)
    assert float(ir.material_for_name('GERMMW').n(4.0)) == \
        pytest.approx(4.02577, abs=2e-4)
    assert float(ir.material_for_name('SILICON').n(4.0)) == \
        pytest.approx(3.42589, abs=2e-4)
    assert float(ir.material_for_name('SAPHIR').n(2.0)) == \
        pytest.approx(1.7372, abs=2e-3)


# ---------- transforms -------------------------------------------------------

def test_correction_scalar_and_wavelength_callable():
    base = ConstantMaterial(1.5, name='base')
    assert float(IndexOffsetMaterial(base, 0.01).n(0.55)) == \
        pytest.approx(1.51)
    sloped = IndexOffsetMaterial(base, lambda wvl: 0.1 * wvl)
    assert float(sloped.n(0.5, temperature=300)) == pytest.approx(1.55)
    stressed = StressOpticMaterial(
        base, lambda wvl, temperature: temperature * 1e-4, stress=2.0)
    assert float(stressed.n(0.5, temperature=300)) == \
        pytest.approx(1.5 + 300 * 1e-4 * 2.0)


def test_temperature_shifted_material():
    flat = [[1.5, 1.5], [1.5, 1.5]]
    parent = TemperatureGridMaterial('base', [0.5, 1.0], [100, 300], flat,
                                     layout=('temperature', 'wavelength'))
    correction = TemperatureGridMaterial(
        'dn_dT', [0.5, 1.0], [100, 300], [[1e-3, 2e-3], [3e-3, 4e-3]],
        layout=('temperature', 'wavelength'))
    shifted = TemperatureShiftedMaterial(parent, correction,
                                         reference_temperature=100)
    assert float(shifted.n(0.75, temperature=200)) == pytest.approx(1.75)


def test_callable_correction_typeerror_not_masked():
    def correction(wvl_um, temperature):
        raise TypeError('internal failure')

    m = IndexOffsetMaterial(ConstantMaterial(1.5, name='base'), correction)
    with pytest.raises(TypeError, match='internal failure'):
        m.n(0.55, temperature=300)


def test_isothermal_material_binds_temperature():
    parent = mat.TemperatureSellmeierMaterial(
        'g', strength_coefficients=[[2.0, 1e-3], [1.0, 0.0], [0.5, 0.0]],
        resonance_coefficients=[[0.1, 0.0], [0.2, 0.0], [5.0, 0.0]])
    with pytest.raises(ValueError):
        parent.n(1.0)
    bound = IsothermalMaterial(parent, 295.0)
    assert float(bound.n(1.0)) == pytest.approx(
        float(parent.n(1.0, temperature=295.0)))
    assert float(bound.n(1.0, temperature=200.0)) == pytest.approx(
        float(parent.n(1.0, temperature=200.0)))
