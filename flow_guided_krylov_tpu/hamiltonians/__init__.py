"""Hamiltonian layer: molecular + spin systems over packed bitstrings."""

from .base import Hamiltonian, PauliString
from .spin import (HeisenbergHamiltonian, TransverseFieldIsing,
                   create_heisenberg_hamiltonian, create_tfim_hamiltonian,
                   extract_coeffs_and_paulis)
from .molecular import (MOLECULE_FACTORIES, MolecularHamiltonian,
                        create_beh2_hamiltonian, create_ch4_hamiltonian,
                        create_h2_hamiltonian, create_h2o_hamiltonian,
                        create_lih_hamiltonian, create_n2_hamiltonian,
                        create_nh3_hamiltonian)

__all__ = [
    "Hamiltonian", "PauliString", "MolecularHamiltonian",
    "MOLECULE_FACTORIES",
    "create_h2_hamiltonian", "create_lih_hamiltonian",
    "create_h2o_hamiltonian", "create_beh2_hamiltonian",
    "create_nh3_hamiltonian", "create_n2_hamiltonian",
    "create_ch4_hamiltonian",
    "HeisenbergHamiltonian", "TransverseFieldIsing",
    "create_heisenberg_hamiltonian", "create_tfim_hamiltonian",
    "extract_coeffs_and_paulis",
]
