"""Materials data-source characterization: reference port.

Behavior matrix of /root/reference/tests/x/materials/
test_characterization.py (14 tests): golden n/k values per material
family (constant, tabulated, fitted, AGF Sellmeier/Schott, CHARMS
coefficient/table, RII formula), the exact page_info provenance
dicts, and the public export surface.
"""
import textwrap

import numpy as np
import pytest

import jax  # NOQA: F401

import prysm_tpu.x.materials as materials
from prysm_tpu.x.materials import (
    AGFCatalog, CHARMSCoefficientMaterial, CHARMSTableMaterial,
    ConstantMaterial, FittedMaterial, RefractiveIndexCatalog,
    TabulatedMaterial)

REF_AGF_DATA = '/root/reference/tests/x/raytracing/data/materials'


# ---------- golden n / k values -----------------------------------------------

def test_constant_golden():
    m = ConstantMaterial(1.5, name='constant')
    assert float(m.n(0.55)) == pytest.approx(1.5)
    assert float(m.k(0.55)) == pytest.approx(0.0)


def test_tabulated_golden():
    m = TabulatedMaterial('tab', [0.5, 0.6, 0.7], [1.6, 1.5, 1.4])
    assert float(m.n(0.55)) == pytest.approx(1.55)
    assert float(m.n(0.65)) == pytest.approx(1.45)


def test_fitted_cauchy_golden():
    wls = np.array([0.45, 0.55, 0.65, 0.75])
    n = 1.5 + 0.01 / wls ** 2
    m = FittedMaterial.from_samples('fit', wls, n, model='cauchy')
    assert isinstance(m, FittedMaterial)
    assert float(m.n(0.55)) == pytest.approx(1.5330578512396698, rel=1e-12)


def test_agf_sellmeier_golden():
    m = AGFCatalog.from_file(
        f'{REF_AGF_DATA}/tiny_schott.agf').material_for_name('N-BK7')
    assert float(m.n(0.5875618)) == pytest.approx(1.5168000345005885,
                                                  rel=1e-12)
    assert float(m.n(0.4861327)) == pytest.approx(1.5223762897312285,
                                                  rel=1e-12)
    assert float(m.n(0.6562725)) == pytest.approx(1.5143223472613747,
                                                  rel=1e-12)
    assert float(m.k(0.55)) == pytest.approx(0.0)


def test_agf_schott_formula_golden():
    m = AGFCatalog.from_text(
        'NM SCH 1\nCD 2.25 0 0 0 0 0\nLD 0.4 0.8\n',
        namespace='SCH').material_for_name('SCH')
    assert float(m.n(0.55)) == pytest.approx(1.5)


def test_charms_coefficient_golden():
    m = CHARMSCoefficientMaterial(
        'test',
        coefficients={'S': [[0.6], [0.2], [0.1]],
                      'lambda': [[0.1], [0.2], [10.0]]},
        wavelength_range=(0.5, 2.0),
        temperature_range=(20, 300))
    assert float(m.n(1.0, temperature=77)) == pytest.approx(
        1.3466194111120775, rel=1e-12)


def test_charms_table_golden():
    m = CHARMSTableMaterial(
        'table', [1.0, 2.0], [80, 300], [[1.5, 1.6], [1.7, 1.8]],
        layout=('temperature', 'wavelength'))
    assert float(m.n(1.5, temperature=190)) == pytest.approx(1.65)


_RII_CATALOG = """\
- SHELF: specs
  name: specs
  content:
    - DIVIDER: "schott"
    - BOOK: SCHOTT-optical
      content:
        - PAGE: N-BK7
          data: schott/N-BK7.yml
"""

_RII_NBK7 = """\
DATA:
  - type: formula 2
    wavelength_range: 0.3 2.5
    coefficients: 0 1.03961212 0.00600069867 0.231792344 0.0200179144 \
1.01046945 103.560653
"""


@pytest.fixture
def rii_catalog(tmp_path):
    root = tmp_path / 'riidb'
    root.mkdir()
    (root / 'catalog-nk.yml').write_text(_RII_CATALOG)
    page = root / 'data' / 'schott' / 'N-BK7.yml'
    page.parent.mkdir(parents=True)
    page.write_text(textwrap.dedent(_RII_NBK7))
    return RefractiveIndexCatalog.from_database(db_path=root,
                                                download=False)


def test_rii_formula_golden(rii_catalog):
    m = rii_catalog.material_for_name('N-BK7')
    assert float(m.n(0.5875618)) == pytest.approx(1.5168000345005885,
                                                  rel=1e-12)
    assert set(m.page_info) == {
        'shelf', 'book', 'page', 'filepath', 'rangeMin', 'rangeMax'}
    assert m.page_info['book'] == 'SCHOTT-optical'
    assert m.page_info['page'] == 'N-BK7'


# ---------- page_info dicts ---------------------------------------------------

def test_constant_page_info():
    m = ConstantMaterial(1.5, name='constant')
    assert m.page_info == {
        'shelf': 'user', 'book': 'USER', 'page': 'constant',
        'filepath': '', 'catalog': 'USER', 'rangeMin': None,
        'rangeMax': None, 'model': 'constant'}


def test_tabulated_page_info():
    m = TabulatedMaterial('tab', [0.5, 0.6, 0.7], [1.6, 1.5, 1.4])
    assert m.page_info == {
        'shelf': 'user', 'book': 'USER', 'page': 'tab', 'filepath': '',
        'catalog': 'USER', 'rangeMin': 0.5, 'rangeMax': 0.7,
        'model': 'linear'}


def test_fitted_page_info():
    wls = np.array([0.45, 0.55, 0.65, 0.75])
    m = FittedMaterial.from_samples('fit', wls, 1.5 + 0.01 / wls ** 2,
                                    model='cauchy')
    assert m.page_info == {
        'shelf': 'user', 'book': 'USER', 'page': 'fit', 'filepath': '',
        'catalog': 'USER', 'rangeMin': 0.45, 'rangeMax': 0.75,
        'model': 'cauchy'}


def test_agf_sellmeier_page_info():
    path = f'{REF_AGF_DATA}/tiny_schott.agf'
    m = AGFCatalog.from_file(path).material_for_name('N-BK7')
    assert m.page_info == {
        'shelf': 'agf', 'book': 'SCHOTT-agf', 'page': 'N-BK7',
        'filepath': str(path), 'catalog': 'SCHOTT', 'formula': 2,
        'rangeMin': 0.3, 'rangeMax': 2.5}


def test_agf_schott_page_info():
    m = AGFCatalog.from_text(
        'NM SCH 1\nCD 2.25 0 0 0 0 0\nLD 0.4 0.8\n',
        namespace='SCH').material_for_name('SCH')
    assert m.page_info == {
        'shelf': 'agf', 'book': 'SCH-agf', 'page': 'SCH', 'filepath': '',
        'catalog': 'SCH', 'formula': 1, 'rangeMin': 0.4, 'rangeMax': 0.8}


# ---------- public API --------------------------------------------------------

def test_all_exports_resolve():
    for name in materials.__all__:
        assert hasattr(materials, name), name
