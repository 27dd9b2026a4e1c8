"""Backend shim + math helper tests (reference prysm/mathops.py parity)."""
import numpy as truenp

import jax.numpy as jnp

import pytest

from prysm_tpu import mathops


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    mathops.set_backend_to_defaults()


def test_shim_defaults_to_jax():
    assert mathops.np._srcmodule is jnp
    assert mathops.fft._srcmodule is jnp.fft
    # attribute forwarding (reference BackendShim contract)
    out = mathops.np.cos(jnp.zeros(3))
    assert float(out.sum()) == 3.0


def test_set_backend_to_numpy_and_back():
    mathops.set_backend_to_numpy()
    assert mathops.np._srcmodule is truenp
    arr = mathops.np.ones(4)
    assert type(arr) is truenp.ndarray
    import scipy.fft
    assert mathops.fft._srcmodule is scipy.fft
    mathops.set_backend_to_defaults()
    assert mathops.np._srcmodule is jnp


def test_set_backend_to_cupy_raises_where_absent():
    # faithful reference behavior on hosts without cupy (mathops.py:48-75)
    with pytest.raises(ImportError):
        mathops.set_backend_to_cupy()
    with pytest.raises(ImportError):
        mathops.set_fft_backend_to_mkl_fft()


def test_array_to_true_numpy():
    single = mathops.array_to_true_numpy(jnp.ones(3))
    assert type(single) is truenp.ndarray
    a, b, c = mathops.array_to_true_numpy(jnp.ones(2), truenp.zeros(2), 3.5)
    assert type(a) is truenp.ndarray
    assert type(b) is truenp.ndarray
    assert c == 3.5
    assert mathops.array_to_true_numpy() is None


def test_cis_keeps_numpy_on_host():
    # plan builders rely on this: no eager device complex arrays
    h = mathops.cis(truenp.linspace(0, 1, 5))
    assert type(h) is truenp.ndarray
    d = mathops.cis(jnp.linspace(0, 1, 5))
    assert not isinstance(d, truenp.ndarray)
    truenp.testing.assert_allclose(
        truenp.asarray(d), truenp.exp(1j * truenp.linspace(0, 1, 5)),
        atol=1e-6)


def test_jinc_matches_scipy():
    from scipy.special import j1
    r = truenp.linspace(0, 50, 2001)
    got = truenp.asarray(mathops.jinc(jnp.asarray(r)))
    expected = truenp.where(r == 0, 0.5, j1(truenp.where(r == 0, 1, r)) /
                            truenp.where(r == 0, 1, r))
    truenp.testing.assert_allclose(got, expected, atol=2e-7)


def test_row_dot_matches():
    rng = truenp.random.default_rng(1234)
    a = rng.standard_normal((100, 3))
    b = rng.standard_normal((100, 3))
    got = truenp.asarray(mathops.row_dot(jnp.asarray(a), jnp.asarray(b)))
    truenp.testing.assert_allclose(got, (a * b).sum(axis=1), rtol=2e-5)


def test_pytorch_backend_swap_end_to_end():
    """The user-facing shim really computes on torch after the swap.

    r1 review called these swaps untested pass-throughs; this pins the
    advertised contract: mathops.np/fft dispatch to the selected backend
    for user code (the library's own compute path is JAX by design).
    """
    torch = pytest.importorskip('torch')
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter('ignore')
        mathops.set_backend_to_pytorch()
    try:
        a = mathops.np.linspace(0.0, 1.0, 64)
        assert isinstance(a, torch.Tensor)
        b = mathops.np.sin(a) + mathops.np.cos(a) * 2
        assert isinstance(b, torch.Tensor)
        spec = mathops.fft.fft(b)
        assert isinstance(spec, torch.Tensor)
        want = truenp.fft.fft(truenp.sin(truenp.linspace(0, 1, 64))
                           + truenp.cos(truenp.linspace(0, 1, 64)) * 2)
        truenp.testing.assert_allclose(spec.numpy(), want, rtol=1e-4,
                                       atol=1e-4 * abs(want[0]))
    finally:
        mathops.set_backend_to_defaults()


def test_numpy_backend_swap_computes():
    """Same contract through the numpy swap: results are numpy arrays."""
    mathops.set_backend_to_numpy()
    try:
        a = mathops.np.arange(16, dtype='float64')
        out = mathops.fft.ifft(mathops.fft.fft(a))
        assert isinstance(out, truenp.ndarray)
        truenp.testing.assert_allclose(out.real, a, atol=1e-12)
    finally:
        mathops.set_backend_to_defaults()


@pytest.mark.parametrize('num,want', [(1, True), (3, True),
                                      (100000000000001, True),
                                      (0, False), (2, False),
                                      (100000000000000, False)])
def test_is_odd(num, want):
    assert bool(mathops.is_odd(num)) is want


@pytest.mark.parametrize('num,want', [(2, True), (64, True), (8192, True),
                                      (1, False), (3, False), (1000, False),
                                      (-2, False)])
def test_is_power_of_2(num, want):
    assert bool(mathops.is_power_of_2(num)) is want
