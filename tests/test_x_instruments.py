"""x/ subsystems: dm, polarization, fibers, psi, pdi, sri, shack-hartmann."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_xy_grid, cart_to_polar
from prysm_tpu.geometry import circle_sdf, antialias, gaussian
from prysm_tpu.propagation import Wavefront

from prysm_tpu.x import dm as xdm
from prysm_tpu.x import polarization as xpol
from prysm_tpu.x import fibers as xfib
from prysm_tpu.x import psi as xpsi
from prysm_tpu.x import pdi as xpdi
from prysm_tpu.x import sri as xsri
from prysm_tpu.x import shack_hartmann as xsh

import prysm.x.dm as ref_dm
import prysm.x.polarization as ref_pol
import prysm.x.fibers as ref_fib

# the reference's psi module imports scikit-image at module scope; it is not
# installed here, so stub just the symbol it pulls (unused by these tests)
import sys
import types
_sk = types.ModuleType('skimage')
_skr = types.ModuleType('skimage.restoration')
_sku = types.ModuleType('skimage.restoration._unwrap_2d')
_sku.unwrap_2d = None
_skr._unwrap_2d = _sku
_sk.restoration = _skr
sys.modules.setdefault('skimage', _sk)
sys.modules.setdefault('skimage.restoration', _skr)
sys.modules.setdefault('skimage.restoration._unwrap_2d', _sku)

import prysm.x.psi as ref_psi  # noqa: E402
import prysm.x.pdi as ref_pdi  # noqa: E402
import prysm.x.shack_hartmann as ref_sh  # noqa: E402


# ---------------------------------------------------------------------------
# DM
# ---------------------------------------------------------------------------

def _mk_dm(cls_mod, ifn, rot=(0, 0, 10), shift=(0.5, 0)):
    return cls_mod.DM(ifn, Nout=96, Nact=8, sep=8, rot=rot, shift=shift)


def test_dm_render_matches_reference():
    x, y = make_xy_grid(64, diameter=2)
    ifn = np.asarray(gaussian(0.25, x, y))
    rng = np.random.default_rng(0)
    acts = rng.standard_normal((8, 8))

    ours = _mk_dm(xdm, jnp.asarray(ifn))
    ours.update(jnp.asarray(acts))
    o = np.asarray(ours.render(wfe=True))

    theirs = _mk_dm(ref_dm, ifn.copy())
    theirs.update(acts)
    t = np.asarray(theirs.render(wfe=True))
    # warp differs: ours is bilinear, reference cubic spline; ~2% deviations
    # at steep edges are the interpolation-order difference, not an error
    np.testing.assert_allclose(o, t, atol=2.5e-2 * np.abs(t).max())


def test_dm_render_no_rot_matches_tightly():
    x, y = make_xy_grid(64, diameter=2)
    ifn = np.asarray(gaussian(0.25, x, y))
    rng = np.random.default_rng(1)
    acts = rng.standard_normal((8, 8))
    ours = xdm.DM(jnp.asarray(ifn), Nout=96, Nact=8, sep=8)
    ours.update(jnp.asarray(acts))
    o = np.asarray(ours.render(wfe=True))
    theirs = ref_dm.DM(ifn.copy(), Nout=96, Nact=8, sep=8)
    theirs.update(acts)
    t = np.asarray(theirs.render(wfe=True))
    np.testing.assert_allclose(o, t, rtol=1e-9, atol=1e-11)


def test_dm_adjoint_matches_autodiff():
    x, y = make_xy_grid(64, diameter=2)
    ifn = gaussian(0.25, x, y)
    dm = xdm.DM(ifn, Nout=96, Nact=8, sep=8)
    rng = np.random.default_rng(2)
    acts = jnp.asarray(rng.standard_normal((8, 8)))
    target = jnp.asarray(rng.standard_normal((96, 96)))
    render = dm.render_fn(wfe=True)

    def loss(a):
        return jnp.sum((render(a) - target) ** 2)

    g_auto = np.asarray(jax.grad(loss)(acts))
    sfe = render(acts)
    diff = 2 * (sfe - target)
    g_manual = np.asarray(dm.render_adjoint(diff, wfe=True))
    np.testing.assert_allclose(g_auto, g_manual, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# polarization
# ---------------------------------------------------------------------------

def test_jones_primitives_match():
    np.testing.assert_allclose(np.asarray(xpol.linear_pol_vector(30)),
                               np.asarray(ref_pol.linear_pol_vector(30)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xpol.circular_pol_vector()),
                               np.asarray(ref_pol.circular_pol_vector()), atol=1e-12)
    for theta in (0, 0.3):
        np.testing.assert_allclose(np.asarray(xpol.linear_retarder(1.0, theta)),
                                   np.asarray(ref_pol.linear_retarder(1.0, theta)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(xpol.linear_diattenuator(0.4, theta)),
                                   np.asarray(ref_pol.linear_diattenuator(0.4, theta)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xpol.half_wave_plate(0.2)),
                               np.asarray(ref_pol.half_wave_plate(0.2)), atol=1e-12)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(xpol.pauli_spin_matrix(i)),
                                   np.asarray(ref_pol.pauli_spin_matrix(i)), atol=1e-12)


def test_vvr_and_mueller_match():
    x = np.linspace(-1, 1, 8)
    xx, yy = np.meshgrid(x, x)
    t = np.arctan2(yy, xx)
    ours = np.asarray(xpol.vector_vortex_retarder(2, jnp.asarray(t)))
    theirs = np.asarray(ref_pol.vector_vortex_retarder(2, t.copy()))
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    J = ref_pol.linear_retarder(0.7, 0.2)
    np.testing.assert_allclose(np.asarray(xpol.jones_to_mueller(jnp.asarray(J))),
                               np.asarray(ref_pol.jones_to_mueller(J)), atol=1e-12)


def test_jones_adapter_propagation():
    from prysm_tpu.propagation import focus
    x, y = make_xy_grid(32, diameter=2)
    r, _ = cart_to_polar(x, y)
    amp = antialias(circle_sdf(0.9, r), float(x[0, 1] - x[0, 0]))
    # polarized field: amp through a polarizer
    J = xpol.linear_polarizer(0.3) * jnp.ones((32, 32, 1, 1))
    field = xpol.apply_polarization_optic(amp + 0j, J)
    wrapped = xpol.jones_adapter(focus)
    out = wrapped(field, 2)
    assert out.shape == (64, 64, 2, 2)
    # each component equals scalar propagation of that component
    ref_component = focus(field[..., 0, 0], 2)
    np.testing.assert_allclose(np.asarray(out[..., 0, 0]), np.asarray(ref_component),
                               rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# fibers
# ---------------------------------------------------------------------------

def test_find_all_modes_matches():
    V = 10.0
    ours = xfib.find_all_modes(V)
    theirs = ref_fib.find_all_modes(V)
    assert set(ours.keys()) == set(theirs.keys())
    for k in ours:
        np.testing.assert_allclose(np.asarray(ours[k]), np.asarray(theirs[k]),
                                   rtol=1e-9)


def test_lp_modes_match():
    V = 5.0
    a = 2.0
    x, y = make_xy_grid(64, diameter=12)
    r, t = cart_to_polar(x, y)
    md_o = xfib.find_all_modes(V)
    md_r = ref_fib.find_all_modes(V)
    ours = xfib.compute_LP_modes(V, md_o, a, np.asarray(r), np.asarray(t))
    theirs = ref_fib.compute_LP_modes(V, md_r, a, np.asarray(r), np.asarray(t))
    for k in ours:
        for mo, mt in zip(ours[k], theirs[k]):
            np.testing.assert_allclose(np.asarray(mo), np.asarray(mt), rtol=1e-8,
                                       atol=1e-10)


def test_mode_overlap_integral_matches():
    rng = np.random.default_rng(3)
    E1 = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
    E2 = rng.standard_normal((32, 32)) + 1j * rng.standard_normal((32, 32))
    o = float(xfib.mode_overlap_integral(jnp.asarray(E1), jnp.asarray(E2)))
    t = float(ref_fib.mode_overlap_integral(E1, E2))
    np.testing.assert_allclose(o, t, rtol=1e-10)


# ---------------------------------------------------------------------------
# psi
# ---------------------------------------------------------------------------

def test_degroot_psi_matches():
    rng = np.random.default_rng(4)
    phase = rng.standard_normal((16, 16)) * 0.3
    gs = [np.cos(phase + s) for s in np.asarray(ref_psi.SCHWIDER.shifts)]
    ours = np.asarray(xpsi.degroot_formalism_psi([jnp.asarray(g) for g in gs],
                                                 xpsi.SCHWIDER))
    theirs = np.asarray(ref_psi.degroot_formalism_psi(gs, ref_psi.SCHWIDER))
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_design_scheme_matches():
    o = xpsi.design_scheme(7)
    t = ref_psi.design_scheme(7)
    np.testing.assert_allclose(np.asarray(o.s), np.asarray(t.s), atol=1e-12)
    np.testing.assert_allclose(np.asarray(o.c), np.asarray(t.c), atol=1e-12)


def test_unwrap_phase_linear_ramp():
    x = np.linspace(-1, 1, 64)
    xx, yy = np.meshgrid(x, x)
    true = 9 * xx + 4 * yy
    wrapped = (true + np.pi) % (2 * np.pi) - np.pi
    out = np.asarray(xpsi.unwrap_phase(jnp.asarray(wrapped)))
    resid = (out - true) - (out - true).mean()
    assert np.abs(resid).max() < 1e-2


# ---------------------------------------------------------------------------
# pdi / sri / shack-hartmann (forward models run; pdi vs reference)
# ---------------------------------------------------------------------------

def _pupil(N=64, epd=10):
    x, y = make_xy_grid(N, diameter=epd * 1.1)
    r, _ = cart_to_polar(x, y)
    dx = float(x[0, 1] - x[0, 0])
    amp = antialias(circle_sdf(epd / 2, r), dx)
    return x, y, amp


def test_pspdi_matches_reference():
    x, y, amp = _pupil()
    kwargs = dict(efl=100, epd=10, wavelength=0.55, test_arm_samples=64,
                  pinhole_samples=48, grating_rulings=32, test_arm_fov=32,
                  test_arm_offset=32)
    ours = xpdi.PSPDI(x, y, **kwargs)
    theirs = ref_pdi.PSPDI(np.asarray(x), np.asarray(y), **kwargs)
    Io = np.asarray(ours.forward_model(amp + 0j).data)
    It = np.asarray(theirs.forward_model(np.asarray(amp) + 0j).data)
    np.testing.assert_allclose(Io, It, rtol=1e-8, atol=1e-10)


def test_sri_forward_runs():
    x, y, amp = _pupil()
    sri = xsri.SelfReferencedInterferometer(x, y, efl=100, epd=10,
                                            wavelength=0.55, fiber_samples=64)
    I = sri.forward_model(amp + 0j)
    assert np.isfinite(np.asarray(I.data)).all()


def test_shack_hartmann_matches_reference():
    x, y = make_xy_grid(128, diameter=4)
    screen_o = np.asarray(xsh.shack_hartmann(0.5, 4, 10, 0.55, x, y))
    screen_t = np.asarray(ref_sh.shack_hartmann(0.5, 4, 10, 0.55,
                                                np.asarray(x), np.asarray(y)))
    np.testing.assert_allclose(screen_o, screen_t, rtol=1e-8, atol=1e-9)


# ---------------------------------------------------------------------------
# polarization physics invariants (round 3 depth)
# ---------------------------------------------------------------------------

def test_malus_law():
    """Crossed polarizers: transmitted intensity follows cos^2(theta)."""
    for theta in (0.0, 30.0, 60.0, 90.0):
        pol0 = xpol.linear_polarizer(0.0)
        polt = xpol.jones_rotation_matrix(np.radians(-theta)) \
            @ xpol.linear_polarizer(0.0) \
            @ xpol.jones_rotation_matrix(np.radians(theta))
        E = polt @ (pol0 @ xpol.linear_pol_vector(0.0)[..., None])
        I = float(np.sum(np.abs(np.asarray(E)) ** 2))
        assert I == pytest.approx(np.cos(np.radians(theta)) ** 2,
                                  abs=1e-6)


def test_quarter_wave_plate_makes_circular():
    """Linear at 45 deg through a QWP at 0 becomes circular light."""
    E_in = xpol.linear_pol_vector(45.0)[..., None]
    E_out = np.asarray(xpol.quarter_wave_plate(0.0) @ E_in).ravel()
    # equal magnitudes, +/- 90 deg relative phase
    assert abs(abs(E_out[0]) - abs(E_out[1])) < 1e-6
    rel = np.angle(E_out[1] / E_out[0])
    assert abs(abs(rel) - np.pi / 2) < 1e-6


def test_half_wave_plate_rotates_polarization():
    """An HWP at angle t maps linear 0 deg to linear 2t."""
    E_out = np.asarray(
        xpol.half_wave_plate(np.radians(20.0))
        @ xpol.linear_pol_vector(0.0)[..., None]).ravel()
    want = np.asarray(xpol.linear_pol_vector(40.0)).ravel()
    # same state up to a global phase
    phase = E_out[np.argmax(np.abs(E_out))] / \
        want[np.argmax(np.abs(E_out))]
    np.testing.assert_allclose(E_out, want * phase, atol=1e-6)


def test_jones_to_mueller_physical():
    """Mueller matrices of common Jones elements are physical: M00 >= 0,
    first row/col bounded by M00, rotations preserve intensity."""
    for jones in (xpol.linear_polarizer(0.3),
                  xpol.quarter_wave_plate(0.7),
                  xpol.half_wave_plate(0.2),
                  xpol.jones_rotation_matrix(0.5)):
        M = np.asarray(xpol.jones_to_mueller(jones))
        assert M[0, 0] >= 0
        assert np.all(np.abs(M) <= M[0, 0] + 1e-9)
    M_rot = np.asarray(xpol.jones_to_mueller(
        xpol.jones_rotation_matrix(0.5)))
    assert M_rot[0, 0] == pytest.approx(1.0, abs=1e-7)


def test_pauli_coefficients_roundtrip():
    """jones == sum_i c_i sigma_i for the Pauli expansion."""
    J = np.asarray(xpol.linear_retarder(0.9, theta=0.3))
    cs = xpol.pauli_coefficients(jnp.asarray(J))
    rebuilt = sum(
        np.asarray(c) * np.asarray(xpol.pauli_spin_matrix(i))
        for i, c in enumerate(cs))
    np.testing.assert_allclose(rebuilt, J, atol=1e-7)


def test_single_mode_cutoff_at_2405():
    """Below V = 2.405 (the first J0 zero) only LP01 propagates."""
    below = xfib.find_all_modes(2.3)
    above = xfib.find_all_modes(2.5)
    assert set(below.keys()) == {0}
    assert len(np.atleast_1d(np.asarray(below[0]))) == 1
    total_above = sum(len(np.atleast_1d(np.asarray(v)))
                      for v in above.values())
    assert total_above > 1                    # LP11 joins above cutoff


def test_lp_mode_count_grows_with_V():
    """The guided-mode count is monotone in V (~V^2/2 asymptotically)."""
    counts = []
    for V in (2.0, 5.0, 10.0, 20.0):
        md = xfib.find_all_modes(V)
        counts.append(sum(len(np.atleast_1d(np.asarray(v)))
                          for v in md.values()))
    assert counts == sorted(counts) and counts[-1] > counts[0]


def test_distinct_lp_modes_are_orthogonal():
    """Different LP radial orders of the same family are orthogonal over
    the cross-section (overlap integral ~0); self-overlap is 1."""
    V, a = 8.0, 2.0
    x, y = make_xy_grid(128, diameter=16)
    r, t = cart_to_polar(x, y)
    md = xfib.find_all_modes(V)
    modes0 = xfib.compute_LP_modes(V, md, a, np.asarray(r), np.asarray(t))[0]
    E1 = jnp.asarray(np.asarray(modes0[0]))
    E2 = jnp.asarray(np.asarray(modes0[1]))
    self_o = float(xfib.mode_overlap_integral(E1, E1))
    cross_o = float(xfib.mode_overlap_integral(E1, E2))
    assert self_o == pytest.approx(1.0, abs=1e-6)
    assert cross_o < 1e-3
