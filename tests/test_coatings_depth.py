"""Coatings depth: port of the reference x/coatings suites' intent.

Behavior matrix of the reference tests for the stack field engine
(thinfilm crosscheck, unimodularity, energy budgets, internal fields,
standing waves, vectorization), the differentiable engine (thickness
and index gradients vs central differences), monitoring simulation,
needle synthesis, analytic-gradient refinement, field-constrained
design, rugate synthesis, merit validation, and the material protocol.
"""
import numpy as np
import pytest

import jax  # NOQA: F401

from prysm_tpu import thinfilm
from prysm_tpu.x.coatings import (
    RTA, Stack, backward_products, field_at_depth, forward_products,
    internal_fields, refine, stack_characteristic_matrices, stack_rt,
)
from prysm_tpu.x.coatings import diff, monitoring as mon, rugate as ru
from prysm_tpu.x.coatings.diff import forward_eval
from prysm_tpu.x.coatings.merit import (
    FieldInLayer, FieldIntensityAtBoundary, LayerAbsorptance, MeritFunction,
    PeakFieldAtInterfaces, Reflectance, Transmittance,
)
from prysm_tpu.x.coatings.needle import (
    cleanup, insert_needle, needle_function, synthesize)
from prysm_tpu.x.coatings.stack import _char_matrix
from prysm_tpu.x.materials import ConstantMaterial

WVL = 0.587725
N_SUB = 1.458461
N_MGF2 = 1.3698
N_CEF3 = 1.6290 + 1j * 0.0034836
N_ZRO2 = 2.1588

MONO = ([N_MGF2], [0.150])
MULTI = ([N_MGF2, N_ZRO2, N_CEF3], [WVL / 4, WVL / 2, WVL / 4])


def _np(x):
    return np.asarray(x)


# ---------- stack engine -----------------------------------------------------

@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0, 15, 45])
@pytest.mark.parametrize('layers', [MONO, MULTI])
def test_stack_r_matches_thinfilm(pol, aoi, layers):
    indices, thicknesses = layers
    s = Stack(indices, thicknesses, N_SUB)
    r, _ = stack_rt(s, WVL, np.radians(aoi), pol)
    r_ref, _ = thinfilm.multilayer_stack_rt(indices, thicknesses, WVL, pol,
                                            N_SUB, aoi=aoi)
    assert np.allclose(_np(r), _np(r_ref))


@pytest.mark.parametrize('aoi', [0, 15, 45])
@pytest.mark.parametrize('layers', [MONO, MULTI])
def test_stack_t_s_pol_matches_thinfilm(aoi, layers):
    indices, thicknesses = layers
    s = Stack(indices, thicknesses, N_SUB)
    _, t = stack_rt(s, WVL, np.radians(aoi), 's')
    _, t_ref = thinfilm.multilayer_stack_rt(indices, thicknesses, WVL, 's',
                                            N_SUB, aoi=aoi)
    assert np.allclose(_np(t), _np(t_ref))


@pytest.mark.parametrize('pol', ['s', 'p'])
def test_products_consistent_and_unimodular(pol):
    indices, thicknesses = MULTI
    s = Stack(indices, thicknesses, N_SUB)
    mats = stack_characteristic_matrices(s, WVL, np.radians(20), pol)
    L = forward_products(mats)
    R = backward_products(mats)
    assert np.allclose(_np(L[-1]), _np(R[0]))
    M = _np(L[-1])
    det = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    assert np.allclose(det, 1.0)


@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0, 30])
def test_energy_conservation_lossless(pol, aoi):
    s = Stack([N_MGF2, N_ZRO2, N_SUB], [WVL / 4, WVL / 2, WVL / 4], N_SUB)
    R, T, A = RTA(s, WVL, np.radians(aoi), pol)
    assert float(R + T) == pytest.approx(1.0, abs=1e-12)
    assert float(np.sum(_np(A))) == pytest.approx(0.0, abs=1e-12)


@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0, 30])
def test_energy_conservation_lossy(pol, aoi):
    s = Stack([N_MGF2, 1.5 + 0.5j, N_ZRO2], [WVL / 4, 0.080, WVL / 4], N_SUB)
    R, T, A = RTA(s, WVL, np.radians(aoi), pol)
    A = _np(A)
    assert float(R + np.sum(A) + T) == pytest.approx(1.0, abs=1e-12)
    assert np.all(A >= -1e-12)
    assert np.sum(A) > 0.05
    assert A[1] == pytest.approx(np.sum(A), abs=1e-3)


@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0, 40])
def test_bare_substrate_is_fresnel(pol, aoi):
    s = Stack([], [], N_SUB)
    theta0 = np.radians(aoi)
    r, _ = stack_rt(s, WVL, theta0, pol)
    theta1 = thinfilm.snell_aor(1.0, N_SUB, aoi, deg=True)
    fresnel = thinfilm.fresnel_rs if pol == 's' else thinfilm.fresnel_rp
    assert np.allclose(_np(r), _np(fresnel(1.0, N_SUB, theta0, theta1)))
    R, T, A = RTA(s, WVL, theta0, pol)
    assert _np(A).shape == (0,)
    assert float(R + T) == pytest.approx(1.0, abs=1e-12)


@pytest.mark.parametrize('pol', ['s', 'p'])
def test_field_at_depth_matches_boundaries(pol):
    indices, thicknesses = MULTI
    s = Stack(indices, thicknesses, N_SUB)
    theta0 = np.radians(25)
    E, H = internal_fields(s, WVL, theta0, pol)
    Z = np.concatenate([np.zeros(1), np.cumsum(np.asarray(thicknesses))])
    Ez, Hz = field_at_depth(s, Z, WVL, theta0, pol)
    assert np.allclose(_np(Ez), _np(E))
    assert np.allclose(_np(Hz), _np(H))


def test_qwot_field_swap():
    n1 = 1.38
    s = Stack([n1], [WVL / (4 * n1)], 1.52)
    E, H = internal_fields(s, WVL, 0.0, 's')
    E, H = _np(E), _np(H)
    assert abs(E[0]) * n1 == pytest.approx(abs(H[1]), rel=1e-9)
    assert abs(H[0]) == pytest.approx(n1 * abs(E[1]), rel=1e-9)


@pytest.mark.parametrize('aoi', [0, 35])
@pytest.mark.parametrize('pol', ['s', 'p'])
def test_standing_wave_node_spacing(aoi, pol):
    n1, d = 2.0, 3.0
    s = Stack([n1], [d], 1.5)
    theta0 = np.radians(aoi)
    z = np.linspace(0, d, 12001)
    Ez, _ = field_at_depth(s, z, WVL, theta0, pol)
    intensity = np.abs(_np(Ez)) ** 2
    peaks = np.where((intensity[1:-1] > intensity[:-2])
                     & (intensity[1:-1] > intensity[2:]))[0] + 1
    spacing = np.diff(z[peaks])
    cost1 = np.cos(float(np.real(np.asarray(
        thinfilm.snell_aor(1.0, n1, aoi, deg=True)))))
    expected = WVL / (2 * n1 * cost1)
    assert np.allclose(spacing, expected, atol=2 * (z[1] - z[0]))


@pytest.mark.parametrize('pol', ['s', 'p'])
def test_vectorized_over_wavelength_matches_loop(pol):
    indices, thicknesses = MULTI
    s = Stack(indices, thicknesses, N_SUB)
    wvls = np.array([0.45, 0.55, 0.65])
    theta0 = np.radians(20)
    R, T, A = RTA(s, wvls, theta0, pol)
    R, T, A = _np(R), _np(T), _np(A)
    for i, w in enumerate(wvls):
        Ri, Ti, Ai = RTA(s, float(w), theta0, pol)
        assert float(Ri) == pytest.approx(R[i])
        assert float(Ti) == pytest.approx(T[i])
        assert np.allclose(_np(Ai), A[:, i])


def test_coating_stack_prefers_material_nk_protocol():
    lossy = ConstantMaterial(1.5, name='lossy', k=0.2)
    stack = Stack([lossy], [0.1], substrate_index=1.5)
    R, T, A = RTA(stack, 0.55, 0.0, 's')
    assert float(R + T + _np(A)[0]) == pytest.approx(1.0, abs=1e-12)
    assert float(_np(A)[0]) > 1e-2


# ---------- differentiable engine -------------------------------------------

DIFF_INDICES = [1.38, 2.05, 1.5 + 0.3j, 2.05]
DIFF_TH = np.array([0.12, 0.08, 0.05, 0.10])
SUB = 1.52


def _stack(th=DIFF_TH):
    return Stack(DIFF_INDICES, th, SUB)


def test_char_matrix_vjp_transpose_identity():
    rng = np.random.default_rng(0xBEEF)
    shape = (6,)
    beta = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    eta = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    dbeta = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    deta = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    M_bar = (rng.standard_normal(shape + (2, 2))
             + 1j * rng.standard_normal(shape + (2, 2)))

    # dM from central differences of the characteristic matrix itself
    h = 1e-7
    dM = (_np(_char_matrix(beta + h * dbeta, eta + h * deta))
          - _np(_char_matrix(beta - h * dbeta, eta - h * deta))) / (2 * h)

    c_beta, c_eta = diff.char_matrix_vjp(beta, eta, M_bar)
    lhs = np.real(np.sum(np.conj(M_bar) * dM))
    rhs = np.real(np.sum(np.conj(_np(c_beta)) * dbeta
                         + np.conj(_np(c_eta)) * deta))
    assert np.isclose(lhs, rhs, rtol=1e-6)


def _merit_terms():
    return {
        'R': Reflectance(np.array([0.45, 0.55, 0.65]), target=0.0),
        'T': Transmittance(np.array([0.45, 0.55, 0.65]), target=0.9),
        'A': LayerAbsorptance(2, np.array([0.5, 0.6]), target=0.0),
        'E': FieldIntensityAtBoundary(2, np.array([0.5, 0.6]), target=0.0),
    }


def _fd_grad(term, th, h=1e-7):
    g = np.zeros_like(th)
    for i in range(th.size):
        tp = th.copy()
        tp[i] += h
        tm = th.copy()
        tm[i] -= h
        g[i] = (float(term.value(_stack(tp)))
                - float(term.value(_stack(tm)))) / (2 * h)
    return g


@pytest.mark.parametrize('pol', ['s', 'p', 'avg'])
@pytest.mark.parametrize('key', ['R', 'T', 'A', 'E'])
def test_thickness_gradient_matches_fd(pol, key):
    term = _merit_terms()[key]
    term.theta = np.radians(20.0)
    term.pol = pol
    _, g_analytic = term.value_and_grad(_stack())
    g_fd = _fd_grad(term, DIFF_TH)
    assert np.allclose(_np(g_analytic), g_fd, rtol=2e-5, atol=1e-8)


@pytest.mark.parametrize('pol', ['s', 'p'])
@pytest.mark.parametrize('aoi', [0.0, 30.0])
@pytest.mark.parametrize('key', ['R', 'T', 'A', 'E'])
def test_index_gradient_matches_fd(pol, aoi, key):
    indices = [1.38, 2.05, 1.5 + 0.2j, 2.2]
    th = np.array([0.10, 0.07, 0.05, 0.06])
    theta = np.radians(aoi)
    wv = np.array([0.5, 0.55, 0.6])

    def fwd(idx):
        return forward_eval(Stack(idx, th, SUB), wv, theta, pol)

    def value(idx):
        f = fwd(idx)
        q = {'R': f.R_value, 'T': f.T_value, 'A': f.A_value,
             'E': f.Esq_value}[key]
        return float(np.sum(_np(q) ** 2))

    f0 = fwd(indices)
    seeds = {'R': dict(dR=2 * f0.R_value), 'T': dict(dT=2 * f0.T_value),
             'A': dict(dA=2 * f0.A_value), 'E': dict(dEsq=2 * f0.Esq_value)}
    g = _np(diff.index_gradient(f0, **seeds[key]))

    g_fd = np.zeros(len(indices))
    h = 1e-7
    for i in range(len(indices)):
        ip = list(indices)
        ip[i] = ip[i] + h
        im = list(indices)
        im[i] = im[i] - h
        g_fd[i] = (value(ip) - value(im)) / (2 * h)
    assert np.allclose(g, g_fd, rtol=3e-5, atol=1e-8)


def test_merit_function_sums_terms():
    terms = list(_merit_terms().values())
    mf = MeritFunction(terms)
    val, grad = mf.value_and_grad(_stack())
    assert float(val) == pytest.approx(
        sum(float(t.value(_stack())) for t in terms))
    g_fd = np.zeros_like(DIFF_TH)
    for i in range(DIFF_TH.size):
        tp = DIFF_TH.copy()
        tp[i] += 1e-7
        tm = DIFF_TH.copy()
        tm[i] -= 1e-7
        g_fd[i] = (float(mf.value(_stack(tp)))
                   - float(mf.value(_stack(tm)))) / 2e-7
    assert np.allclose(_np(grad), g_fd, rtol=2e-5, atol=1e-8)


def test_forward_eval_matches_rta():
    s = _stack()
    R, T, A = RTA(s, np.array([0.45, 0.55]), np.radians(10.0), 's')
    f = forward_eval(s, np.array([0.45, 0.55]), np.radians(10.0), 's')
    assert np.allclose(_np(f.R_value), _np(R))
    assert np.allclose(_np(f.T_value), _np(T))
    assert np.allclose(_np(f.A_value), _np(A))


def test_merit_rejects_ambiguous_1d_grid():
    wvl = np.linspace(0.45, 0.65, 4)
    theta = np.linspace(0.0, 0.2, 3)
    with pytest.raises(ValueError, match='both 1-D'):
        Reflectance(wvl, theta=theta, target=0.0)


def test_merit_rejects_nonbroadcast_target():
    wvl = np.linspace(0.45, 0.65, 4)[:, None]
    theta = np.linspace(0.0, 0.2, 3)[None, :]
    with pytest.raises(ValueError, match='broadcast-compatible'):
        Reflectance(wvl, theta=theta, target=np.zeros(4))


# ---------- monitoring -------------------------------------------------------

W = 0.55
MSUB = 1.52


@pytest.mark.parametrize('n1', [1.46, 2.05])
def test_qwot_layer_turns_at_quarter_wave(n1):
    qw = W / (4 * n1)
    s = Stack([n1], [qw], MSUB)
    d, sig = mon.monitoring_trace(s, 0, W, mode='R', n_points=2000,
                                  max_factor=2.5)
    tps = mon.turning_points(d, sig)
    assert tps[0] == pytest.approx(qw, rel=2e-3)


def test_level_cut_interpolates_crossing():
    d = np.linspace(0, 1, 101)
    sig = 0.2 + 0.5 * d
    assert mon.level_cut(d, sig, 0.45) == pytest.approx(0.5, abs=1e-6)


def test_level_cut_picks_crossing_nearest_target():
    d = np.linspace(0, 1, 201)
    sig = np.sin(2 * np.pi * d)
    assert mon.level_cut(d, sig, 0.0, target=0.48) == pytest.approx(0.5,
                                                                    abs=1e-2)


def test_zero_error_level_run_reproduces_nominal():
    indices = [1.46, 2.05, 1.46, 2.05]
    th = np.array([0.09, 0.067, 0.10, 0.067])
    des = Stack(indices, th, MSUB)
    ab = mon.simulate_run(des, W, strategy='level', n_points=1200)
    assert np.allclose(np.asarray(ab.thicknesses), th, atol=2e-4)


def test_zero_error_turning_run_reproduces_qwot():
    indices = [1.46, 2.05, 1.46, 2.05]
    th = np.array([W / (4 * n) for n in indices])
    des = Stack(indices, th, MSUB)
    ab = mon.simulate_run(des, W, strategy='turning', n_points=2000)
    assert np.allclose(np.asarray(ab.thicknesses), th, atol=3e-4)


def test_thickness_error_thickens_layer():
    indices = [1.46, 2.05, 1.46, 2.05]
    th = np.array([W / (4 * n) for n in indices])
    des = Stack(indices, th, MSUB)
    err = np.zeros(4)
    err[2] = 0.01
    ab = mon.simulate_run(des, W, strategy='turning', thickness_errors=err,
                          n_points=2000)
    out = np.asarray(ab.thicknesses)
    assert out[2] == pytest.approx(th[2] + 0.01, abs=5e-4)
    assert out[0] == pytest.approx(th[0], abs=5e-4)


def test_self_quarter_wave_monitor_is_worst():
    indices = [1.46, 2.05, 1.46, 2.05]
    th = np.array([0.09, 0.067, 0.10, 0.067])
    des = Stack(indices, th, MSUB)
    candidates = [0.45, 0.50, 0.55, 0.60, 0.65]
    best, scores = mon.choose_monitor_wavelength(
        des, candidates, np.array([W]), strategy='level', design_pol='s')
    worst = candidates[int(np.argmax(scores))]
    assert worst == pytest.approx(0.55)
    assert best != pytest.approx(0.55)
    assert np.max(scores) > 3 * np.min(scores)


# ---------- needle -----------------------------------------------------------

def _broadband_merit(npts=9):
    return MeritFunction([Reflectance(np.linspace(0.45, 0.65, npts),
                                      pol='s', target=0.0)])


@pytest.mark.parametrize('material', [2.05, 1.9])
@pytest.mark.parametrize('z', [0.05, 0.10, 0.22, 0.28])
def test_needle_function_matches_fd(material, z):
    stack = Stack([1.46, 2.2, 1.46], [0.10, 0.07, 0.12], MSUB)
    merit = _broadband_merit()
    P = float(_np(needle_function(stack, merit, material, z))[0])
    dn = 1e-7
    base = float(merit.value(stack))
    inserted = insert_needle(stack, z, material, thickness=dn)
    fd = (float(merit.value(inserted)) - base) / dn
    assert np.isclose(P, fd, rtol=3e-3, atol=1e-6)


def test_needle_host_material_equals_thickness_gradient():
    stack = Stack([1.46, 2.2, 1.46], [0.10, 0.07, 0.12], MSUB)
    merit = _broadband_merit()
    _, grad = merit.value_and_grad(stack)
    for k, (z_mid, m) in enumerate([(0.05, 1.46), (0.135, 2.2),
                                    (0.23, 1.46)]):
        P = float(_np(needle_function(stack, merit, m, z_mid))[0])
        assert P == pytest.approx(float(_np(grad)[k]), rel=1e-9)


@pytest.mark.parametrize('material', [1.38, 2.05])
def test_needle_stationarity_at_optimum(material):
    n_ar = np.sqrt(MSUB)
    ar = Stack([n_ar], [W / (4 * n_ar)], MSUB)
    merit = MeritFunction([Reflectance(W, pol='s', target=0.0)])
    z = np.linspace(0, float(np.sum(np.asarray(ar.thicknesses))), 200)
    P = _np(needle_function(ar, merit, material, z))
    assert P.min() >= -1e-9


def test_synthesize_grows_broadband_ar():
    merit = _broadband_merit(npts=7)
    start = Stack([1.38, 2.05], [0.10, 0.10], MSUB)
    start_merit = float(merit.value(start))
    result = synthesize(start, merit, [1.38, 2.05], z_samples=120,
                        max_iters=8, max_layers=16)
    assert result.n_layers > len(start)
    assert result.merit < start_merit / 100
    R, _, _ = RTA(result.stack, np.linspace(0.45, 0.65, 7), 0.0, 's')
    assert float(np.max(_np(R))) < 5e-3


def test_cleanup_prunes_and_merges():
    stack = Stack([1.4, 2.0, 1.4], [0.10, 5e-4, 0.15], MSUB)
    cleaned = cleanup(stack, prune_tol=2e-3)
    assert len(cleaned) == 1
    assert float(cleaned.thicknesses[0]) == pytest.approx(0.25)
    assert float(np.real(cleaned.indices[0])) == pytest.approx(1.4)

    stack2 = Stack([1.4, 1.4, 2.0], [0.10, 0.20, 0.05], MSUB)
    cleaned2 = cleanup(stack2)
    assert len(cleaned2) == 2
    assert float(cleaned2.thicknesses[0]) == pytest.approx(0.30)

    stack3 = Stack([1.4, 2.0, 1.4], [0.10, 0.08, 0.12], MSUB)
    assert len(cleanup(stack3)) == 3


def test_insert_needle_splits_host():
    stack = Stack([1.46, 2.2], [0.10, 0.20], MSUB)
    inserted = insert_needle(stack, 0.04, 1.9, thickness=0.001)
    assert len(inserted) == 4
    assert [float(np.real(n)) for n in inserted.indices] == \
        [1.46, 1.9, 1.46, 2.2]
    th = np.asarray(inserted.thicknesses)
    np.testing.assert_allclose(th, [0.04, 0.001, 0.06, 0.20], atol=1e-12)


# ---------- refine -----------------------------------------------------------

N_AR = np.sqrt(MSUB)
QWOT = W / (4 * N_AR)


def test_refine_recovers_single_layer_qwot_ar():
    s0 = Stack([N_AR], [0.07], MSUB)
    target = Reflectance(W, target=0.0)
    result = refine(s0, target)
    assert result.success
    assert float(result.stack.thicknesses[0]) == pytest.approx(QWOT,
                                                               rel=1e-2)
    R, _, _ = RTA(result.stack, W, 0.0, 's')
    assert float(R) < 1e-6


def test_refine_multilayer_target_from_perturbed_start():
    indices = [1.38, 2.05, 1.38, 2.05]
    truth = np.array([0.10, 0.065, 0.115, 0.07])
    wvls = np.linspace(0.45, 0.65, 11)
    R_target = _np(RTA(Stack(indices, truth, MSUB), wvls, 0.0, 's')[0])
    start = truth + np.array([0.02, -0.015, 0.01, -0.02])
    result = refine(Stack(indices, start, MSUB),
                    Reflectance(wvls, pol='s', target=R_target), maxiter=300)
    R_fit = _np(RTA(result.stack, wvls, 0.0, 's')[0])
    assert np.allclose(R_fit, R_target, atol=1e-4)
    assert result.merit < 1e-8


def test_refine_lbfgsb_and_lm_agree():
    indices = [1.38, 2.05, 1.38]
    truth = np.array([0.10, 0.065, 0.115])
    wvls = np.linspace(0.5, 0.6, 6)
    R_target = _np(RTA(Stack(indices, truth, MSUB), wvls, 0.0, 's')[0])
    start = truth + 0.01
    target = Reflectance(wvls, pol='s', target=R_target)
    r_bfgs = refine(Stack(indices, start, MSUB), target, method='lbfgsb')
    r_lm = refine(Stack(indices, start, MSUB), target, method='lm')
    assert np.allclose(_np(RTA(r_bfgs.stack, wvls, 0.0, 's')[0]), R_target,
                       atol=1e-4)
    assert np.allclose(_np(RTA(r_lm.stack, wvls, 0.0, 's')[0]), R_target,
                       atol=1e-4)


def test_refine_index_variable_recovers_single_index():
    th = [0.10, 0.08, 0.10]
    wvls = np.linspace(0.5, 0.6, 7)
    R_target = _np(RTA(Stack([1.40, 2.20, 1.45], th, MSUB), wvls, 0.0,
                       's')[0])
    start = Stack([1.40, 1.90, 1.45], th, MSUB)
    result = refine(start, Reflectance(wvls, pol='s', target=R_target),
                    variables='index', variable_layers=[1],
                    bounds=(1.3, 2.4), maxiter=400)
    R_fit = _np(RTA(result.stack, wvls, 0.0, 's')[0])
    assert np.allclose(R_fit, R_target, atol=1e-5)
    assert float(np.real(result.stack.indices[1])) == pytest.approx(2.20,
                                                                    rel=1e-3)
    assert float(np.real(result.stack.indices[0])) == pytest.approx(1.40)


def test_refine_variable_layers_subset_frozen():
    indices = [1.38, 2.05, 1.38]
    s0 = Stack(indices, [0.10, 0.05, 0.115], MSUB)
    result = refine(s0, Reflectance(W, target=0.0), variable_layers=[1])
    assert float(result.stack.thicknesses[0]) == pytest.approx(0.10)
    assert float(result.stack.thicknesses[2]) == pytest.approx(0.115)
    assert float(result.stack.thicknesses[1]) != pytest.approx(0.05)


# ---------- field-constrained design ----------------------------------------

def _peak_field(stack, pol='s', wvl=W):
    return float(np.max(_np(forward_eval(stack, wvl, 0.0, pol).Esq_value)))


@pytest.mark.parametrize('pol', ['s', 'p', 'avg'])
@pytest.mark.parametrize('term_factory', [
    lambda: PeakFieldAtInterfaces(np.array([0.5, 0.6]), target=0.0),
    lambda: PeakFieldAtInterfaces(np.array([0.5, 0.6]), boundaries=[1, 2, 3],
                                  target=0.0),
    lambda: FieldInLayer(1, np.array([0.5, 0.6]), target=0.0),
    lambda: LayerAbsorptance(2, np.array([0.5, 0.6]), target=0.0),
])
def test_field_head_gradient_matches_fd(pol, term_factory):
    indices = [1.46, 2.2, 1.5 + 0.2j, 2.05]
    th = np.array([0.10, 0.07, 0.05, 0.09])

    def build(t):
        return Stack(indices, t, MSUB)

    term = term_factory()
    term.theta = np.radians(15.0)
    term.pol = pol
    _, g = term.value_and_grad(build(th))
    g_fd = np.zeros_like(th)
    h = 1e-7
    for i in range(th.size):
        tp = th.copy()
        tp[i] += h
        tm = th.copy()
        tm[i] -= h
        g_fd[i] = (float(term.value(build(tp)))
                   - float(term.value(build(tm)))) / (2 * h)
    assert np.allclose(_np(g), g_fd, rtol=2e-5, atol=1e-8)


def test_peak_field_only_optimization_lowers_field():
    rng = np.random.default_rng(5)
    indices = [1.46 if i % 2 else 2.25 for i in range(8)]
    s0 = Stack(indices, 0.05 + 0.08 * rng.random(8), MSUB)
    before = _peak_field(s0)
    result = refine(s0, PeakFieldAtInterfaces(W, pol='s', target=0.0),
                    maxiter=300)
    assert _peak_field(result.stack) < 0.6 * before


def test_layer_absorptance_target_met():
    s0 = Stack([1.46, 1.5 + 0.4j, 1.46], [0.10, 0.06, 0.10], MSUB)
    target = 0.15
    result = refine(s0, LayerAbsorptance(1, W, pol='s', target=target),
                    maxiter=300)
    _, _, A = RTA(result.stack, W, 0.0, 's')
    assert float(_np(A)[1]) == pytest.approx(target, abs=1e-4)


# ---------- rugate -----------------------------------------------------------

def _spectrum(stack, lams, pol='s'):
    return _np(RTA(stack, lams, 0.0, pol)[0])


def test_sinusoid_notch_center_and_width():
    n_avg, n_amp, lam0 = 1.8, 0.10, 0.55
    s = ru.sinusoidal_rugate(n_avg, n_amp, lam0, n_periods=30,
                             sublayers_per_period=30)
    lams = np.linspace(0.45, 0.70, 800)
    R = _spectrum(s, lams)
    ipk = int(np.argmax(R))
    assert lams[ipk] == pytest.approx(lam0, abs=2e-3)
    assert R[ipk] > 0.9
    half = R[ipk] / 2
    band = lams[R >= half]
    fwhm = band.max() - band.min()
    predicted = n_amp / n_avg * lam0
    assert 0.5 * predicted < fwhm < 2.0 * predicted


def test_notch_wavelength_round_trips_period():
    Lam = ru.rugate_period(1.8, 0.55)
    assert ru.notch_wavelength(1.8, Lam) == pytest.approx(0.55)


def test_apodize_preserves_mean_and_tapers():
    n_avg = 1.8

    def base(z):
        return n_avg + 0.1 * np.sin(2 * np.pi * z / 0.1)

    win = ru.quintic_taper(0.5)
    tapered = ru.apodize(base, n_avg, 1.0, win)
    assert tapered(0.0) == pytest.approx(n_avg, abs=1e-9)
    assert tapered(0.5) == pytest.approx(base(0.5), rel=1e-9)


def test_discretized_two_level_matches_homogeneous_stack():
    def two_level(z):
        return 1.46 if (z % 0.2) < 0.1 else 2.2

    s = ru.discretize_profile(two_level, 0.4, 4, 1.52)
    assert [round(float(np.real(n)), 3) for n in s.indices] == \
        [1.46, 2.2, 1.46, 2.2]
    manual = Stack([1.46, 2.2, 1.46, 2.2], [0.1, 0.1, 0.1, 0.1], 1.52)
    lams = np.linspace(0.45, 0.70, 50)
    assert np.allclose(_spectrum(s, lams), _spectrum(manual, lams))


def test_discretize_profile_thickness_and_count():
    s = ru.discretize_profile(lambda z: 1.5, 1.0, 25, 1.52)
    assert len(s) == 25
    assert np.allclose(np.asarray(s.thicknesses), 0.04)


def test_rugate_from_target_places_notch():
    n_avg, lam0 = 1.8, 0.55
    k0 = 2 * np.pi / lam0
    k = np.linspace(0.5 * k0, 1.5 * k0, 2000)
    target = 0.3 * np.exp(-((k - k0) / (0.03 * k0)) ** 2)
    s = ru.rugate_from_target(k, target, n_avg, total_optical_thickness=40.0,
                              n_sublayers=1500)
    lams = np.linspace(0.45, 0.70, 600)
    R = _spectrum(s, lams)
    assert lams[int(np.argmax(R))] == pytest.approx(lam0, abs=4e-3)
