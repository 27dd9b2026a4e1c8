"""LensData / OpticalSystem / launch / aiming parity vs the reference."""
import sys
import types

import numpy as onp
import pytest

import jax  # NOQA: F401  (force platform selection through conftest)

from _ref_stubs import install as _install_ref_stubs

_install_ref_stubs()
ref_rt = pytest.importorskip('prysm.x.raytracing')
_install_ref_stubs()  # rebind names imported during package import
ref_mat = pytest.importorskip('prysm.x.materials')

from prysm_tpu.x import raytracing as rt  # NOQA: E402
import prysm_tpu.x.materials as mat  # NOQA: E402

WVL = 0.5876


def _doublet_lens(rt_mod, mat_mod):
    bk7 = mat_mod.model_glass(1.5168, 64.17, name='BK7ish')
    sf5 = mat_mod.model_glass(1.6727, 32.2, name='SF5ish')
    lens = rt_mod.LensData()
    lens.add(rt_mod.Sphere(1 / 62.0), thickness=6.0, material=bk7)
    lens.add(rt_mod.Sphere(-1 / 45.0), thickness=3.0, material=sf5)
    lens.add(rt_mod.Sphere(-1 / 128.0), thickness=95.0, material=mat_mod.air)
    return lens


def _system(rt_mod, mat_mod, **kwargs):
    base = dict(aperture=rt_mod.ApertureSpec.epd(20.0),
                fields=[0.0, 2.0], wavelengths=[0.4861, 0.5876, 0.6563],
                reference=1, stop_index=1)
    base.update(kwargs)
    return rt_mod.OpticalSystem(_doublet_lens(rt_mod, mat_mod), **base)


def test_lensdata_compiles_like_reference():
    mine = _doublet_lens(rt, mat).to_surfaces()
    ref = _doublet_lens(ref_rt, ref_mat).to_surfaces()
    assert len(mine) == len(ref)
    for sm, sr in zip(mine, ref):
        onp.testing.assert_allclose(onp.asarray(sm.P), onp.asarray(sr.P),
                                    atol=1e-12)
        assert sm.typ == sr.typ
    # full trace parity through the compiled systems
    P, S = rt.generate_collimated_hex_ray_grid(4, 2.0)
    P = onp.asarray(P)
    S = onp.asarray(S)
    rm = rt.raytrace(mine, P, S, WVL)
    rr = ref_rt.raytrace(ref, P, S, WVL)
    onp.testing.assert_allclose(onp.asarray(rm.P), onp.asarray(rr.P),
                                atol=1e-10)
    onp.testing.assert_array_equal(onp.asarray(rm.status),
                                   onp.asarray(rr.status))


@pytest.mark.parametrize('kind,kw', [
    ('basic', dict(decenter=(0.5, -0.2, 0.0), tilt=(5.0, 2.0, 1.0))),
    ('dar', dict(decenter=(0.3, 0.0, 0.0), tilt=(0.0, 3.0, 0.0))),
    ('ben', dict(tilt=(0.0, 0.0, 45.0))),
])
def test_coordbreak_layout_matches_reference(kind, kw):
    def build(rt_mod, mat_mod):
        lens = rt_mod.LensData()
        lens.add_coordbreak(kind=kind, thickness=2.0, **kw)
        lens.add(rt_mod.Plane(), typ='refl', thickness=30.0,
                 material=mat_mod.MIRROR)
        lens.add(rt_mod.Sphere(0.01), thickness=5.0, material=mat_mod.air)
        return lens.to_surfaces()

    mine = build(rt, mat)
    ref = build(ref_rt, ref_mat)
    for sm, sr in zip(mine, ref):
        onp.testing.assert_allclose(onp.asarray(sm.P), onp.asarray(sr.P),
                                    atol=1e-12)
        Rm = onp.eye(3) if sm.R is None else onp.asarray(sm.R)
        Rr = onp.eye(3) if sr.R is None else onp.asarray(sr.R)
        onp.testing.assert_allclose(Rm, Rr, atol=1e-12)


def test_rev_and_ret_coordbreaks_match_reference():
    def build(rt_mod, mat_mod):
        lens = rt_mod.LensData()
        lens.add_coordbreak(kind='basic', decenter=(1.0, 0.0, 0.0),
                            tilt=(0.0, 4.0, 0.0))
        lens.add(rt_mod.Plane(), typ='eval', thickness=3.0)
        lens.add_coordbreak(kind='rev', decenter=(1.0, 0.0, 0.0),
                            tilt=(0.0, 4.0, 0.0))
        lens.add(rt_mod.Plane(), typ='eval', thickness=2.0)
        lens.add_coordbreak(kind='ret', ret_target=2, thickness=1.0)
        lens.add(rt_mod.Plane(), typ='eval', thickness=0.0)
        return lens.to_surfaces()

    mine = build(rt, mat)
    ref = build(ref_rt, ref_mat)
    for sm, sr in zip(mine, ref):
        onp.testing.assert_allclose(onp.asarray(sm.P), onp.asarray(sr.P),
                                    atol=1e-12)


def test_design_state_roundtrip_and_solve():
    sys_ = _system(rt, mat)
    sys_.opt.vary('curvature', [1, 2, 3])
    x = sys_.opt.pack()
    assert x.shape == (3,)
    onp.testing.assert_allclose(x, [1 / 62.0, -1 / 45.0, -1 / 128.0],
                                atol=1e-12)
    x2 = onp.array(x)
    x2[0] = 1 / 60.0
    sys_.opt.update(x2)
    assert float(sys_.to_surfaces()[1].shape.params['c']) == pytest.approx(
        1 / 60.0)
    # image-distance solve tracks the paraxial image
    sys_.solve.image_distance()
    surfaces = sys_.to_surfaces()
    want = rt.paraxial_image_distance(surfaces[:-1], wvl=sys_.wavelength())
    assert float(sys_.lens.rows[3].thickness) == pytest.approx(want,
                                                               abs=1e-10)
    # editing a curvature re-solves on the next compile
    sys_.opt.update(onp.asarray([1 / 58.0, -1 / 45.0, -1 / 128.0]))
    surfaces = sys_.to_surfaces()
    want = rt.paraxial_image_distance(surfaces[:-1], wvl=sys_.wavelength())
    assert float(sys_.lens.rows[3].thickness) == pytest.approx(want,
                                                               abs=1e-10)


def test_pickup_drives_dependent_curvature():
    sys_ = _system(rt, mat)
    sys_.opt.pickup('curvature', 3, from_surface=1, scale=-1.0)
    sys_.opt.vary('curvature', [1])
    sys_.opt.update(onp.asarray([1 / 50.0]))
    surfaces = sys_.to_surfaces()
    assert float(surfaces[3].shape.params['c']) == pytest.approx(-1 / 50.0)
    # a pickup target cannot be varied
    free = sys_._design.free_slots()
    assert ('shape', 3, 0) not in free


def test_aperture_spec_modes_match_reference():
    for spec_kwargs in ((5.0, 'FNO_IMAGE'), (0.1, 'NA_IMAGE')):
        mine = _system(rt, mat, aperture=rt.ApertureSpec(*spec_kwargs))
        ref = _system(ref_rt, ref_mat,
                      aperture=ref_rt.ApertureSpec(*spec_kwargs))
        assert mine.epd == pytest.approx(ref.epd, rel=1e-12)
    with pytest.raises(ValueError):
        rt.ApertureSpec(5.0, 'BOGUS')
    # object-space modes demand a finite conjugate
    sys_ = _system(rt, mat, aperture=rt.ApertureSpec.na(0.1,
                                                        object_space=True))
    with pytest.raises(ValueError):
        sys_.epd


def test_launch_matches_reference():
    mine = _system(rt, mat)
    ref = _system(ref_rt, ref_mat)
    for f in (0, 1):
        Pm, Sm = rt.launch(mine, mine.field(f), WVL, rt.Sampling.hex(4))
        Pr, Sr = ref_rt.launch(ref, ref.field(f), WVL,
                               ref_rt.Sampling.hex(4))
        onp.testing.assert_allclose(onp.asarray(Pm), onp.asarray(Pr),
                                    atol=1e-12)
        onp.testing.assert_allclose(onp.asarray(Sm), onp.asarray(Sr),
                                    atol=1e-12)


def test_launch_finite_conjugate_and_vignetting():
    field = rt.Field(0.0, 1.0, kind='height', object_z=-150.0)
    sys_ = _system(rt, mat)
    P, S = rt.launch(sys_, field, WVL, rt.Sampling.cross(n=9))
    assert onp.allclose(P[:, 2], -150.0)
    norms = onp.sqrt((onp.asarray(S) ** 2).sum(axis=1))
    onp.testing.assert_allclose(norms, 1.0, atol=1e-12)
    # vignetting compresses the +y half of the pupil
    vfield = rt.Field(0.0, 0.0, vignetting={'vuy': 0.5})
    Pv, _ = rt.launch(sys_, vfield, WVL, rt.Sampling.fan(n=9))
    P0, _ = rt.launch(sys_, rt.Field(0.0, 0.0), WVL, rt.Sampling.fan(n=9))
    top_v = onp.asarray(Pv)[:, 1].max()
    top_0 = onp.asarray(P0)[:, 1].max()
    assert top_v == pytest.approx(0.5 * top_0, rel=1e-9)


def test_aim_rays_hits_target():
    sys_ = _system(rt, mat)
    surfaces = sys_.to_surfaces()
    P, S = rt.launch(sys_, sys_.field(1), WVL, rt.Sampling.fan(n=5))
    P2, S2, conv = rt.aim_rays(onp.asarray(P), onp.asarray(S), surfaces, 1,
                               (0.0, 0.0), WVL, vary='position')
    assert conv.all()
    res = rt.raytrace(surfaces[:2], P2, S2, WVL)
    land = onp.asarray(res.P[-1])[:, :2]
    onp.testing.assert_allclose(land, 0.0, atol=1e-9)


def test_solve_apertures_and_footprints():
    sys_ = _system(rt, mat)
    sys_.solve.apertures()
    table = sys_.list_apertures()
    drawn = [r['drawn'] for r in table.records]
    assert all(d is not None and d > 0 for d in drawn)
    # first surface footprint: EP semidiameter x oversize, grown slightly
    # by the superset over the off-axis field's oblique bundle
    assert 10.0 * 1.05 <= drawn[1] < 10.8 * 1.05


def test_listings_render():
    lens = _doublet_lens(rt, mat)
    text = repr(lens.list_surfaces())
    assert 'object' in text and 'image' in text and 'BK7ish' in text
    assert '62' in text
    lens.add_coordbreak(tilt=(0, 0, 10))
    assert 'CB:basic' in repr(lens.list_surfaces())
    assert 'rx' in repr(lens.list_decenters())


def test_system_copy_is_independent():
    sys_ = _system(rt, mat)
    sys_.opt.vary('curvature', [1])
    clone = sys_.copy()
    clone.opt.update(onp.asarray([1 / 40.0]))
    assert float(sys_.to_surfaces()[1].shape.params['c']) == pytest.approx(
        1 / 62.0)
    assert float(clone.to_surfaces()[1].shape.params['c']) == pytest.approx(
        1 / 40.0)
    # the original lens cannot be attached to a second system
    with pytest.raises(ValueError):
        rt.OpticalSystem(sys_.lens)


def test_spot_statistics_and_xp():
    sys_ = _system(rt, mat)
    sys_.solve.image_distance()
    P, S = rt.launch(sys_, sys_.field(1), WVL, rt.Sampling.hex(5))
    res = sys_.trace(P, S)
    Pf = onp.asarray(res.P[-1])
    status = onp.asarray(res.status)
    c = rt.spot_centroid(Pf, status)
    assert onp.isfinite(c).all()
    r = rt.rms_spot_radius(Pf, status)
    assert 0 < r < 1.0
    H, xe, ye = rt.geometric_psf_histogram(Pf, status, bins=16)
    assert H.sum() == P.shape[0]
    # chief-based exit pupil: trace the chief alone
    Pc, Sc = rt.launch(sys_, sys_.field(1), WVL, rt.Sampling.chief(),
                       aim_to=1)
    rc = sys_.trace(Pc, Sc)
    P_chief = onp.asarray(rc.P[-1])[0]
    S_chief = onp.asarray(rc.S[-1])[0]
    C, R, P_xp = rt.xp_reference_sphere(P_chief, S_chief)
    assert R > 0
    # XP should be upstream of the image plane
    assert P_xp[2] < P_chief[2]


def test_element_groups():
    lens = _doublet_lens(rt, mat)
    groups = lens.element_groups(wvl=WVL)
    assert groups == [(1, 2, 3)]


def test_sample_rx_match_reference():
    import prysm.x.raytracing.sample_rx as ref_rx
    from prysm_tpu.x.raytracing import sample_rx as my_rx
    # glasses agree at d-line
    for gm, gr in ((my_rx.N_BK7, ref_rx.N_BK7), (my_rx.N_SF5, ref_rx.N_SF5)):
        assert gm.n(0.5876) == pytest.approx(gr.n(0.5876), rel=1e-12)
    # each builder compiles to the same surface spine
    for name in ('doublet', 'doublet_conic', 'fold_mirror',
                 'decentered_singlet', 'fisheye'):
        lm = getattr(my_rx, name)()
        lr = getattr(ref_rx, name)()
        sm = lm.to_surfaces()
        sr = lr.to_surfaces()
        assert len(sm) == len(sr), name
        for a, b in zip(sm, sr):
            onp.testing.assert_allclose(onp.asarray(a.P), onp.asarray(b.P),
                                        atol=1e-12, err_msg=name)
    assert my_rx.FISHEYE_STOP_INDEX == ref_rx.FISHEYE_STOP_INDEX


def test_sample_rx_fisheye_system_first_order():
    import prysm.x.raytracing.sample_rx as ref_rx
    from prysm_tpu.x.raytracing import sample_rx as my_rx
    sm = my_rx.fisheye_system()
    sr = ref_rx.fisheye_system()
    fm = sm._ynu_first_order()
    fr = sr._ynu_first_order()
    assert fm.efl == pytest.approx(fr.efl, rel=1e-10)
    assert fm.bfl == pytest.approx(fr.bfl, rel=1e-10)
    assert sm.epd == pytest.approx(sr.epd, rel=1e-10)
    # the solved image distance was written into the editor identically
    assert (float(sm.lens.rows[-2].thickness)
            == pytest.approx(float(sr.lens.rows[-2].thickness), rel=1e-10))
