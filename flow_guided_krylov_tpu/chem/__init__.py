"""Host-side quantum-chemistry front end (integrals + RHF).

Self-contained replacement for the reference's PySCF dependency.
"""

from .basis import build_shells, nuclear_repulsion
from .scf import MolecularIntegrals, compute_molecular_integrals, run_rhf
from .active_space import (active_space_from_molecule,
                           compute_active_space_integrals)
from .ccsd import CCSDResult, run_ccsd

__all__ = [
    "build_shells", "nuclear_repulsion",
    "MolecularIntegrals", "compute_molecular_integrals", "run_rhf",
    "compute_active_space_integrals", "active_space_from_molecule",
    "CCSDResult", "run_ccsd",
]
