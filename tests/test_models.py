"""NQS model variants: shapes, bounds, phases, helper functions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flow_guided_krylov_tpu.models import (ComplexNQS, DenseNQS,
                                           RBMQuantumState, SignedDenseNQS,
                                           normalized_probability,
                                           probability, psi)


@pytest.fixture
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 2, (16, 8)).astype(np.float32))


def test_dense_nqs_bounded(x):
    m = DenseNQS(num_sites=8, hidden_dims=(32, 32))
    params = m.init(jax.random.PRNGKey(0), x)
    la = m.apply(params, x)
    assert la.shape == (16,)
    scale = float(params["params"]["log_amp_scale"])
    assert np.all(np.abs(np.asarray(la)) <= abs(scale) + 1e-6)
    assert np.allclose(np.asarray(m.apply(params, x, method=m.phase)), 0.0)


def test_signed_dense_nqs_phase(x):
    m = SignedDenseNQS(num_sites=8, hidden_dims=(32, 32))
    params = m.init(jax.random.PRNGKey(1), x, method=m.phase)
    ph = np.asarray(m.apply(params, x, method=m.phase))
    assert set(np.unique(ph)) <= {0.0, np.float32(np.pi)}


def test_complex_nqs(x):
    m = ComplexNQS(num_sites=8, hidden_dims=(32, 32))
    params = m.init(jax.random.PRNGKey(2), x)
    la = m.apply(params, x)
    ph = m.apply(params, x, method=m.phase)
    assert la.shape == ph.shape == (16,)
    z = psi(la, ph)
    assert np.allclose(np.abs(np.asarray(z)), np.exp(np.asarray(la)),
                       rtol=1e-5)


@pytest.mark.parametrize("complex_weights", [False, True])
def test_rbm(x, complex_weights):
    m = RBMQuantumState(num_sites=8, n_hidden=12,
                        complex_weights=complex_weights)
    params = m.init(jax.random.PRNGKey(3), x)
    la = np.asarray(m.apply(params, x))
    assert la.shape == (16,) and np.isfinite(la).all()
    ph = np.asarray(m.apply(params, x, method=m.phase))
    if not complex_weights:
        assert np.allclose(ph, 0.0)


def test_probability_helpers():
    la = jnp.asarray([0.0, -1.0, 0.5])
    p = np.asarray(probability(la))
    np.testing.assert_allclose(p, np.exp(2 * np.asarray(la)), rtol=1e-6)
    pn = np.asarray(normalized_probability(la))
    assert pn.sum() == pytest.approx(1.0, abs=1e-6)
    mask = jnp.asarray([True, True, False])
    pn2 = np.asarray(normalized_probability(la, mask))
    assert pn2[2] == 0.0 and pn2.sum() == pytest.approx(1.0, abs=1e-6)
