"""ELL SpMV + ELL Lanczos propagator tests (CPU reference path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
from flow_guided_krylov_tpu.krylov import (SKQDConfig,
                                           SampleBasedKrylovDiagonalization)
from flow_guided_krylov_tpu.ops.pallas_spmv import ell_spmv_reference


def test_ell_reference_matches_dense():
    h = create_lih_hamiltonian()
    skqd = SampleBasedKrylovDiagonalization(h, SKQDConfig())
    diag, elems, tgt = skqd._ell_structure()
    H = skqd.subspace_hamiltonian.toarray()
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.normal(size=skqd.dim).astype(np.float32))
    out = ell_spmv_reference(diag, elems, tgt, psi)
    ref = H @ np.asarray(psi)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_evolution_modes_agree():
    h = create_lih_hamiltonian()
    outs = {}
    for mode in ("scipy", "dense", "ell"):
        skqd = SampleBasedKrylovDiagonalization(
            h, SKQDConfig(evolution=mode, seed=2))
        psi0 = np.zeros(skqd.dim, complex)
        psi0[skqd._index_of(h.get_hf_state())[0]] = 1.0
        outs[mode] = skqd.evolve(psi0)
    assert np.abs(outs["dense"] - outs["scipy"]).max() < 1e-5
    assert np.abs(outs["ell"] - outs["scipy"]).max() < 1e-5
