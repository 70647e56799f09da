"""Chemistry front-end tests: RHF energies vs literature STO-3G values."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.chem import compute_molecular_integrals


def test_h2_rhf():
    ints = compute_molecular_integrals([("H", (0, 0, 0)), ("H", (0, 0, 0.74))])
    assert ints.hf_energy == pytest.approx(-1.1167592, abs=1e-6)
    assert ints.n_orbitals == 2
    assert ints.n_alpha == 1


def test_he_atom_rhf():
    ints = compute_molecular_integrals([("He", (0, 0, 0))])
    assert ints.hf_energy == pytest.approx(-2.8077840, abs=1e-6)


def test_be_atom_rhf():
    ints = compute_molecular_integrals([("Be", (0, 0, 0))])
    assert ints.hf_energy == pytest.approx(-14.3518800, abs=1e-6)


def test_h2o_rhf():
    ang = np.radians(104.5)
    geom = [("O", (0.0, 0.0, 0.0)), ("H", (0.96, 0.0, 0.0)),
            ("H", (0.96 * np.cos(ang), 0.96 * np.sin(ang), 0.0))]
    ints = compute_molecular_integrals(geom)
    assert ints.hf_energy == pytest.approx(-74.963319, abs=1e-5)
    assert ints.n_orbitals == 7
    assert ints.n_electrons == 10


def test_eri_symmetries():
    ints = compute_molecular_integrals([("Li", (0, 0, 0)), ("H", (0, 0, 1.6))])
    h2 = ints.h2e
    assert np.allclose(h2, h2.transpose(1, 0, 2, 3))
    assert np.allclose(h2, h2.transpose(0, 1, 3, 2))
    assert np.allclose(h2, h2.transpose(2, 3, 0, 1))
    assert np.allclose(ints.h1e, ints.h1e.T)


def test_h2_631g_rhf():
    ints = compute_molecular_integrals(
        [("H", (0, 0, 0)), ("H", (0, 0, 0.74))], basis="6-31g")
    # literature: ~-1.126828 Ha at 0.74 A
    assert ints.hf_energy == pytest.approx(-1.12683, abs=2e-4)
    assert ints.n_orbitals == 4


def test_h2s_second_row_basis():
    """Second-row STO-3G (Slater-rule refit): H2S lands within ~0.05 Ha of
    the published-basis HF value (-394.31); exact regression pin below."""
    geom = [("S", (0.0, 0.0, 0.0)), ("H", (0.9617, 0.0, 0.9268)),
            ("H", (-0.9617, 0.0, 0.9268))]
    ints = compute_molecular_integrals(geom)
    assert ints.n_orbitals == 11
    assert ints.hf_energy == pytest.approx(-394.2623270, abs=1e-5)


def test_rohf_li_atom():
    """Open-shell ROHF: Li doublet (literature ~ -7.31553); the aufbau
    determinant energy must equal E_ROHF exactly (single-determinant
    invariant), and FCI must fall below it."""
    from flow_guided_krylov_tpu.hamiltonians import MolecularHamiltonian
    ints = compute_molecular_integrals([("Li", (0, 0, 0))], spin=1)
    assert ints.n_alpha == 2 and ints.n_beta == 1
    assert ints.hf_energy == pytest.approx(-7.315526, abs=1e-5)
    h = MolecularHamiltonian(ints)
    e_det = h.diagonal_np(h.get_hf_state()[None, :])[0]
    assert e_det == pytest.approx(ints.hf_energy, abs=1e-8)
    assert h.fci_energy() < ints.hf_energy + 1e-12


def test_rohf_oh_radical():
    ints = compute_molecular_integrals([("O", (0, 0, 0)),
                                        ("H", (0, 0, 0.97))], spin=1)
    assert ints.hf_energy == pytest.approx(-74.3616, abs=2e-3)
    from flow_guided_krylov_tpu.hamiltonians import MolecularHamiltonian
    h = MolecularHamiltonian(ints)
    assert h.fci_energy() < ints.hf_energy


def test_spin_charge_consistency():
    with pytest.raises(ValueError):
        compute_molecular_integrals([("Li", (0, 0, 0))], spin=0)


def test_h2o_631gstar_with_d_shells():
    """6-31G* (Cartesian-d polarization): literature H2O RHF ~ -76.0107."""
    ang = np.radians(104.5)
    geom = [("O", (0.0, 0.0, 0.0)), ("H", (0.96, 0.0, 0.0)),
            ("H", (0.96 * np.cos(ang), 0.96 * np.sin(ang), 0.0))]
    ints = compute_molecular_integrals(geom, basis="6-31g*")
    assert ints.n_orbitals == 19          # 13 (6-31G) + 6 Cartesian d
    assert ints.hf_energy == pytest.approx(-76.0107, abs=2e-3)
