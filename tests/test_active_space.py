"""Active-space (frozen-core) integral folding tests."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.chem import compute_molecular_integrals
from flow_guided_krylov_tpu.chem.active_space import \
    compute_active_space_integrals
from flow_guided_krylov_tpu.hamiltonians.molecular import MolecularHamiltonian


@pytest.fixture(scope="module")
def lih_ints():
    return compute_molecular_integrals([("Li", (0, 0, 0)),
                                        ("H", (0, 0, 1.6))])


def test_noop_folding(lih_ints):
    act = compute_active_space_integrals(lih_ints, n_frozen=0)
    np.testing.assert_allclose(act.h1e, lih_ints.h1e)
    assert act.nuclear_repulsion == lih_ints.nuclear_repulsion
    assert act.n_alpha == lih_ints.n_alpha


def test_hf_determinant_invariant(lih_ints):
    """Folding the core must leave the HF determinant energy exactly fixed."""
    h_full = MolecularHamiltonian(lih_ints)
    act = compute_active_space_integrals(lih_ints, n_frozen=1)
    h_act = MolecularHamiltonian(act)
    e_full = h_full.diagonal_np(h_full.get_hf_state()[None, :])[0]
    e_act = h_act.diagonal_np(h_act.get_hf_state()[None, :])[0]
    assert e_act == pytest.approx(e_full, abs=1e-10)


def test_frozen_core_fci_close(lih_ints):
    """Frozen-core FCI should differ from full FCI only by core correlation
    (sub-mHa for LiH)."""
    h_full = MolecularHamiltonian(lih_ints)
    act = compute_active_space_integrals(lih_ints, n_frozen=1)
    h_act = MolecularHamiltonian(act)
    diff_mha = 1000 * abs(h_act.fci_energy() - h_full.fci_energy())
    assert diff_mha < 1.0
    assert h_act.fci_energy() > h_full.fci_energy() - 1e-9  # variational


def test_over_freezing_raises(lih_ints):
    with pytest.raises(ValueError):
        compute_active_space_integrals(lih_ints, n_frozen=4)
