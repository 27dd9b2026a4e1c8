"""Materials package parity vs prysm.x.materials."""
import numpy as onp
import pytest

ref_mat = pytest.importorskip('prysm.x.materials')

import prysm_tpu.x.materials as mat  # NOQA: E402


AGF_TEXT = """! fabricated test catalog
CC test comment
NM TESTBK7 2 0 1.5168 64.17 0 0
CD 1.03961212 0.00600069867 0.231792344 0.0200179144 1.01046945 103.560653
LD 0.3 2.5
TD 1e-6 1e-8 0 0 0 0 20
NM SIMPLE 1 0 1.5 60 0 0
CD 2.25 0.0 0.01 0.0 0.0 0.0
LD 0.4 1.0
"""


def test_constant_and_model_glass_match_reference():
    for nd, vd in ((1.5168, 64.17), (1.7552, 27.53)):
        mine = mat.model_glass(nd, vd)
        ref = ref_mat.model_glass(nd, vd)
        for wvl in (0.45, 0.5876, 0.7):
            assert mine.n(wvl) == pytest.approx(ref.n(wvl), abs=1e-14)
    c = mat.ConstantMaterial(1.33, k=1e-4)
    assert c.n(1.0) == 1.33
    assert c.nk(1.0) == 1.33 + 1e-4j


def test_formula_material_metrics_match_reference():
    mine = mat.sapphire_ordinary()
    ref = ref_mat.sapphire_ordinary()
    w = onp.linspace(0.3, 5.0, 7)
    onp.testing.assert_allclose(mine.n(w), ref.n(w), atol=1e-14)
    assert mine.abbe(0.4861327, 0.5875618, 0.6562725) == pytest.approx(
        ref.abbe(0.4861327, 0.5875618, 0.6562725), abs=1e-10)
    assert mine.dn_dlambda(1.0) == pytest.approx(ref.dn_dlambda(1.0),
                                                 rel=1e-8)
    with pytest.raises(mat.MaterialRangeError):
        mine.n(10.0)


def test_charms_materials_match_reference():
    for factory in ('charms_silicon', 'charms_germanium'):
        mine = getattr(mat, factory)()
        ref = getattr(ref_mat, factory)()
        w = onp.linspace(2.0, 5.0, 5)
        for T in (40.0, 120.0, 295.0):
            onp.testing.assert_allclose(mine.n(w, temperature=T),
                                        ref.n(w, temperature=T), atol=1e-13)
    with pytest.raises(ValueError):
        mat.charms_silicon().n(3.0)  # temperature required
    with pytest.raises(mat.MaterialRangeError):
        mat.charms_silicon().n(3.0, temperature=400.0)


def test_tabulated_interpolation_matches_reference():
    w = onp.array([0.4, 0.5, 0.6, 0.8, 1.0])
    n = onp.array([1.53, 1.52, 1.515, 1.508, 1.505])
    k = onp.array([1e-6, 2e-6, 1e-6, 5e-7, 1e-7])
    q = onp.array([0.45, 0.55, 0.71, 0.97])
    for method in ('linear', 'nearest', 'pchip'):
        mine = mat.TabulatedMaterial('t', w, n, k=k, interpolation=method)
        ref = ref_mat.TabulatedMaterial('t', w, n, k=k, interpolation=method)
        onp.testing.assert_allclose(mine.n(q), ref.n(q), atol=1e-14)
        onp.testing.assert_allclose(mine.k(q), ref.k(q), atol=1e-18)
    mine = mat.TabulatedMaterial('t', w, n, k_interpolation='log', k=k)
    ref = ref_mat.TabulatedMaterial('t', w, n, k_interpolation='log', k=k)
    onp.testing.assert_allclose(mine.k(q), ref.k(q), atol=1e-18)
    # extrapolation beyond the table
    mine = mat.TabulatedMaterial('t', w, n, extrapolate=True)
    ref = ref_mat.TabulatedMaterial('t', w, n, extrapolate=True)
    onp.testing.assert_allclose(mine.n(onp.array([0.3, 1.2])),
                                ref.n(onp.array([0.3, 1.2])), atol=1e-14)
    with pytest.raises(mat.MaterialRangeError):
        mat.TabulatedMaterial('t', w, n).n(1.5)
    with pytest.raises(ValueError):
        mat.TabulatedMaterial('t', w[::-1], n[::-1])


def test_temperature_grid_matches_reference():
    w = onp.array([1.0, 2.0, 3.0])
    T = onp.array([100.0, 200.0, 250.0, 300.0])
    grid = 1.5 + 0.01 * onp.arange(4)[:, None] + 0.001 * onp.arange(3)[None, :]
    mine = mat.TemperatureGridMaterial('g', w, T, grid)
    ref = ref_mat.TemperatureGridMaterial('g', w, T, grid)
    qw = onp.array([1.3, 2.7])
    for qt in (110.0, 225.0, 300.0):
        onp.testing.assert_allclose(mine.n(qw, temperature=qt),
                                    ref.n(qw, temperature=qt), atol=1e-14)
    onp.testing.assert_allclose(mine.dn_dT(2.0, 200.0),
                                ref.dn_dT(2.0, 200.0), rtol=1e-10)


def test_transforms_match_reference():
    base_m = mat.sapphire_ordinary()
    base_r = ref_mat.sapphire_ordinary()
    w = 1.0
    iso_m = mat.IsothermalMaterial(mat.charms_silicon(), 120.0)
    iso_r = ref_mat.IsothermalMaterial(ref_mat.charms_silicon(), 120.0)
    assert float(iso_m.n(3.0)) == pytest.approx(float(iso_r.n(3.0)), abs=1e-13)
    off_m = mat.IndexOffsetMaterial(base_m, 1e-4)
    off_r = ref_mat.IndexOffsetMaterial(base_r, 1e-4)
    assert off_m.n(w) == pytest.approx(off_r.n(w), abs=1e-14)
    ts_m = mat.TemperatureShiftedMaterial(base_m, 1e-5, 293.0)
    ts_r = ref_mat.TemperatureShiftedMaterial(base_r, 1e-5, 293.0)
    assert ts_m.n(w, temperature=350.0) == pytest.approx(
        ts_r.n(w, temperature=350.0), abs=1e-14)
    so_m = mat.StressOpticMaterial(base_m, 2e-6, 10.0)
    so_r = ref_mat.StressOpticMaterial(base_r, 2e-6, 10.0)
    assert so_m.n(w) == pytest.approx(so_r.n(w), abs=1e-14)
    # provenance chain survives wrapping
    assert off_m.metadata['parent_chain'][0]['name'] == 'sapphire'


def test_agf_catalog_matches_reference():
    mine = mat.AGFCatalog.from_text(AGF_TEXT, namespace='SCHOTT')
    ref = ref_mat.AGFCatalog.from_text(AGF_TEXT, namespace='SCHOTT')
    assert len(mine.materials) == len(ref.materials) == 2
    for w in (0.45, 0.5876, 1.2):
        assert mine['TESTBK7'].n(w) == pytest.approx(ref['TESTBK7'].n(w),
                                                     abs=1e-14)
    assert mine['SIMPLE'].n(0.5876) == pytest.approx(ref['SIMPLE'].n(0.5876),
                                                     abs=1e-14)
    # TESTBK7 Sellmeier should be close to N-BK7's d-line index
    assert mine['TESTBK7'].n(0.5876) == pytest.approx(1.5168, abs=1e-3)
    assert mine.comments == ('test comment',)
    with pytest.raises(KeyError):
        mine['NOPE']


def test_catalog_ambiguity_and_namespace():
    a = mat.ConstantMaterial(1.5, name='GLASS-A', catalog='CAT1')
    b = mat.ConstantMaterial(1.6, name='GLASS-A', catalog='CAT2')
    chain = mat.CatalogChain([
        mat.Catalog.from_materials([a]),
        mat.Catalog.from_materials([b]),
    ])
    with pytest.raises(mat.AmbiguousMaterialError):
        chain.material_for_name('GLASS-A')
    assert chain.material_for_name('GLASS-A', catalog='CAT2').n(1.0) == 1.6
    assert chain['CAT1:GLASS-A'].n(1.0) == 1.5


def test_registry_computed_search():
    mats = [mat.ConstantMaterial(1.4, name='LOW'),
            mat.ConstantMaterial(1.8, name='HIGH')]
    reg = mat.MaterialRegistry.from_catalogs(mat.Catalog.from_materials(mats))
    hits = reg.search(n_at=(0.6, 1.6, None))
    assert [r.name for r in hits] == ['HIGH']
    hits = reg.search(n_at=(0.6, None, 1.6))
    assert [r.name for r in hits] == ['LOW']


def test_fitted_material_matches_reference():
    w = onp.linspace(0.4, 1.0, 12)
    truth = ref_mat.model_glass(1.52, 58.0)
    n = onp.asarray(truth.n(w), dtype=float)
    mine = mat.fit_material('fit', w, n, model='cauchy', terms=3)
    ref = ref_mat.fit_material('fit', w, n, model='cauchy', terms=3)
    q = onp.array([0.45, 0.65, 0.95])
    onp.testing.assert_allclose(mine.n(q), ref.n(q), atol=1e-12)
    assert mine.fit_report.rms_error == pytest.approx(
        ref.fit_report.rms_error, abs=1e-12)
    # schott + sellmeier1 fits match the reference's fits of the same data
    for model in ('schott', 'sellmeier1'):
        m2 = mat.fit_material('fit2', w, n, model=model)
        r2 = ref_mat.fit_material('fit2', w, n, model=model)
        onp.testing.assert_allclose(m2.n(q), r2.n(q), atol=1e-7)
    with pytest.raises(ValueError):
        mat.fit_material('bad', w[:2], n[:2], model='cauchy', terms=5)


def test_rii_database_roundtrip(tmp_path):
    (tmp_path / 'data' / 'glass' / 'BK7').mkdir(parents=True)
    page = tmp_path / 'data' / 'glass' / 'BK7' / 'page.yml'
    page.write_text(
        'DATA:\n'
        '  - type: formula 1\n'
        '    coefficients: 0 1.03961212 0.077464167 0.231792344 0.141484724'
        ' 1.01046945 10.176475\n'
        '    range: 0.3 2.5\n')
    tab = tmp_path / 'data' / 'glass' / 'BK7' / 'tab.yml'
    tab.write_text(
        'DATA:\n'
        '  - type: tabulated nk\n'
        '    data: |\n'
        '      0.5 1.52 0.0001\n'
        '      0.6 1.51 0.0002\n'
        '      0.7 1.50 0.0003\n')
    catalog_yml = tmp_path / 'catalog-nk.yml'
    catalog_yml.write_text(
        '- SHELF: glass\n'
        '  content:\n'
        '    - BOOK: N-BK7\n'
        '      content:\n'
        '        - PAGE: formula\n'
        '          data: glass/BK7/page.yml\n'
        '        - PAGE: table\n'
        '          data: glass/BK7/tab.yml\n')
    mine = mat.RefractiveIndexCatalog.from_database(tmp_path, download=False)
    ref = ref_mat.RefractiveIndexCatalog.from_database(tmp_path,
                                                       download=False)
    gm = mine.material_for_name('N-BK7', page='formula')
    gr = ref.material_for_name('N-BK7', page='formula')
    for w in (0.4, 0.5876, 1.5):
        assert gm.n(w) == pytest.approx(gr.n(w), abs=1e-14)
    # Sellmeier with sqrt-resonances: N-BK7 d-line
    assert gm.n(0.5876) == pytest.approx(1.5168, abs=1e-3)
    tm = mine.material_for_name('N-BK7', page='table')
    tr = ref.material_for_name('N-BK7', page='table')
    assert tm.n(0.55) == pytest.approx(tr.n(0.55), abs=1e-14)
    assert tm.k(0.65) == pytest.approx(tr.k(0.65), abs=1e-18)
    # lookup() resolves strings / numbers / MIRROR identically
    assert mat.lookup('air').n(0.5) == 1.0
    assert mat.lookup(1.75)(0.5) == 1.75
    assert mat.resolve_index('MIRROR') is mat.MIRROR
    got = mat.lookup('N-BK7', database=mine)
    assert got.n(0.5876) == pytest.approx(1.5168, abs=1e-3)


def test_materials_drive_raytrace():
    # end to end: AGF glass -> refraction through a singlet
    from prysm_tpu.x import raytracing as rt
    glass = mat.AGFCatalog.from_text(AGF_TEXT, namespace='SCHOTT')['TESTBK7']
    sfs = [
        rt.Surface(shape=rt.Sphere(1 / 50.0), interaction='refract',
                   P=[0, 0, 0.0], material=glass),
        rt.Surface(shape=rt.Plane(), interaction='refract', P=[0, 0, 5.0],
                   material=mat.air),
    ]
    efl = rt.effective_focal_length(sfs, wvl=0.5876)
    nd = float(glass.n(0.5876))
    assert efl == pytest.approx(50.0 / (nd - 1), rel=1e-10)
