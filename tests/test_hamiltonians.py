"""Molecular Hamiltonian integration tests vs physics oracles."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import (PauliString,
                                                 create_h2_hamiltonian,
                                                 create_lih_hamiltonian)


@pytest.fixture(scope="module")
def h2():
    return create_h2_hamiltonian()


@pytest.fixture(scope="module")
def lih():
    return create_lih_hamiltonian()


def test_h2_fci_vs_literature(h2):
    # H2/STO-3G FCI at 0.74 A
    assert h2.fci_energy() == pytest.approx(-1.137284, abs=2e-5)


def test_lih_fci_vs_literature(lih):
    # LiH/STO-3G FCI at 1.6 A (well-known value)
    assert lih.fci_energy() == pytest.approx(-7.882324, abs=5e-5)
    assert lih.n_valid_configs == 225


def test_fci_below_hf(h2, lih):
    for h in (h2, lih):
        assert h.fci_energy() < h.integrals.hf_energy


def test_hf_state_diagonal_is_hf_energy(lih):
    hf = lih.get_hf_state()[None, :]
    e_hf_det = lih.diagonal_np(hf)[0]
    assert e_hf_det == pytest.approx(lih.integrals.hf_energy, abs=1e-8)


def test_matrix_elements_hermitian(lih):
    basis = lih.enumerate_basis()[:50]
    H = lih.matrix_elements(basis, basis)
    np.testing.assert_allclose(H, H.T, atol=1e-10)


def test_sparse_matches_dense(lih):
    basis = lih.enumerate_basis()[:80]
    Hd = lih.matrix_elements(basis, basis)
    Hs = lih.to_sparse(basis).toarray()
    np.testing.assert_allclose(Hs, Hd, atol=1e-12)


def test_exact_ground_state_variational(lih):
    # projected-subspace energy must be >= FCI and decrease with basis size
    full = lih.enumerate_basis()
    e_small = lih.exact_ground_state(full[:50])[0][0]
    e_mid = lih.exact_ground_state(full[:150])[0][0]
    e_fci = lih.fci_energy()
    assert e_small >= e_mid - 1e-10 >= e_fci - 1e-10


def test_pauli_string_apply():
    p = PauliString("XZ")  # X on qubit 0, Z on qubit 1
    s, ph = p.apply(0b10)
    assert s == 0b11 and ph == -1.0
    y = PauliString("Y")
    s, ph = y.apply(0b0)
    assert s == 1 and ph == 1j
    s, ph = y.apply(0b1)
    assert s == 0 and ph == -1j


def test_pauli_decomposition_one_body_diag(h2):
    """Pauli words reproduce diagonal elements for every determinant."""
    basis = h2.enumerate_basis()
    paulis = h2.to_pauli_strings()
    diag_ref = h2.diagonal_np(basis)
    for i, (a, b) in enumerate(basis):
        state = int(a) | (int(b) << h2.n_orbitals)
        val = 0.0
        for p in paulis:
            ns, ph = p.apply(state)
            if ns == state:
                val += ph.real
        assert val == pytest.approx(diag_ref[i], abs=1e-8)
