"""Backend-pure rotation builder and tensor-clean shapes: reference port.

Behavior matrix of /root/reference/tests/x/raytracing/
test_raytracing_lensdata_backend.py (8 tests): R_rh matches
make_rotation_matrix, identity/radians/orthonormality, and shape
constructors that never float()-coerce numeric DOFs.  The reference
gates its autograd checks on torch; the TPU-native re-expression
drives jax.grad through the same constructors.
"""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prysm_tpu.coordinates import make_rotation_matrix
from prysm_tpu.x.raytracing.lensdata import R_rh
from prysm_tpu.x.raytracing.surfaces import Conic, EvenAsphere, Zernike


# ---------- R_rh --------------------------------------------------------------

def test_R_rh_matches_make_rotation_matrix():
    for rz, ry, rx in itertools.product([0, 5, -12, 30, 90], repeat=3):
        got = np.asarray(R_rh(rz, ry, rx))
        ref = np.asarray(make_rotation_matrix((rz, ry, rx)))
        np.testing.assert_array_equal(got, ref)


def test_R_rh_identity_at_zero():
    np.testing.assert_allclose(np.asarray(R_rh(0, 0, 0)), np.eye(3))


def test_R_rh_radians_path():
    np.testing.assert_allclose(
        np.asarray(R_rh(np.pi / 4, 0, 0, radians=True)),
        np.asarray(make_rotation_matrix((45, 0, 0))))


def test_R_rh_is_orthonormal():
    R = np.asarray(R_rh(11.0, -23.0, 47.0))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) == pytest.approx(1.0)


# ---------- tensor-clean shapes (no host coercion of numeric DOFs) ------------

def test_shape_ctors_do_not_float_coerce_coefs():
    # the constructors must store coef DOFs verbatim, never calling
    # float() on them -- coercion would detach them from an autodiff tape
    class _NoFloat:
        def __init__(self, v):
            self.v = v

        def __float__(self):
            raise AssertionError('coef was float()-coerced by the ctor')

    markers = [_NoFloat(1.0), _NoFloat(2.0)]
    z = Zernike(0.0, 0.0, 10.0, [(2, 0), (4, 0)], markers)
    assert z.params['coefs'][0] is markers[0]
    assert z.params['coefs'][1] is markers[1]


def test_conic_sag_differentiable_through_ctor():
    def f(c, k):
        shape = Conic(c, k)
        x = jnp.array([1.0, 2.0, 3.0])
        y = jnp.array([0.5, 1.0, 1.5])
        return jnp.sum(shape.sag(x, y))

    gc, gk = jax.grad(f, argnums=(0, 1))(jnp.asarray(1 / 50.0),
                                         jnp.asarray(-0.5))
    assert np.isfinite(float(gc)) and float(gc) != 0.0
    assert np.isfinite(float(gk))


def test_even_asphere_coefs_differentiable_through_ctor():
    def f(coefs):
        shape = EvenAsphere(1 / 80.0, jnp.asarray(0.0), coefs)
        return jnp.sum(shape.sag(jnp.array([1.0, 2.0]),
                                 jnp.array([0.5, 1.0])))

    g = jax.grad(f)(jnp.array([1e-4, -2e-6]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g) != 0.0)


def test_R_rh_differentiable():
    def f(rz):
        return jnp.sum(R_rh(rz, jnp.asarray(0.0), jnp.asarray(0.0)))

    g = jax.grad(f)(jnp.asarray(15.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_R_rh_differentiable_with_mixed_host_angles():
    """Traced and host angles mix: only the traced axis needs jnp."""
    def f(rz):
        return jnp.sum(R_rh(rz, 5.0, -3.0))

    g = jax.grad(f)(jnp.asarray(15.0))
    assert np.isfinite(float(g)) and float(g) != 0.0
