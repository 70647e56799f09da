#!/usr/bin/env python
"""Lattice-model SKQD validation (TFIM / Heisenberg).

Counterpart of ``/root/reference/examples/skqd_lattice_validation.py``:
pure SKQD from |0...0> on spin chains, validated against an exact-
diagonalization oracle built independently from Pauli words
(``skqd_lattice_validation.py:63-103``), including the Krylov-convergence
scan over the transverse field h.

Usage:
  python examples/skqd_lattice_validation.py --model tfim --spins 10 --h 0.5
  python examples/skqd_lattice_validation.py --scan
"""

import argparse
import json

import numpy as np


def exact_oracle(ham) -> float:
    """Independent dense H from Pauli words (not the kernel path)."""
    from flow_guided_krylov_tpu.hamiltonians import extract_coeffs_and_paulis
    from flow_guided_krylov_tpu.postprocessing import \
        ProjectedHamiltonianBuilder
    coeffs, words = extract_coeffs_and_paulis(ham)
    builder = ProjectedHamiltonianBuilder.from_coeffs_and_words(coeffs, words)
    states = np.arange(1 << ham.n_sites, dtype=np.uint64)
    H = builder.build_dense(states)
    return float(np.linalg.eigvalsh(H)[0])


def validate(model: str, n_spins: int, h_field: float, krylov_dim: int = 12,
             shots: int = 50_000, verbose: bool = True) -> dict:
    from flow_guided_krylov_tpu.hamiltonians import (HeisenbergHamiltonian,
                                                     TransverseFieldIsing)
    from flow_guided_krylov_tpu.krylov import (
        SKQDConfig, SampleBasedKrylovDiagonalization)

    if model == "tfim":
        ham = TransverseFieldIsing(n_spins, V=1.0, h=h_field)
        init = np.array([0], np.uint32)                  # |0...0>
    else:
        ham = HeisenbergHamiltonian(n_spins, 1.0, 1.0, 1.0,
                                    h_x=h_field * np.ones(n_spins))
        neel = sum(1 << i for i in range(0, n_spins, 2))
        init = np.array([neel], np.uint32)

    e_exact = exact_oracle(ham)
    skqd = SampleBasedKrylovDiagonalization(
        ham, SKQDConfig(max_krylov_dim=krylov_dim, shots_per_krylov=shots,
                        time_step=0.1),
        initial_state=init)
    out = skqd.run()
    res = {
        "model": model, "n_spins": n_spins, "h": h_field,
        "exact_energy": e_exact,
        "skqd_energy": out["final_energy"],
        "error_mha": 1000 * (out["final_energy"] - e_exact),
        "basis_size": out["basis_sizes"][-1],
        "energies_vs_k": [round(1000 * (e - e_exact), 4)
                          for e in out["energies"]],
    }
    if verbose:
        print(json.dumps(res))
    return res


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="tfim", choices=["tfim", "heisenberg"])
    p.add_argument("--spins", type=int, default=10)
    p.add_argument("--h", type=float, default=0.5)
    p.add_argument("--krylov-dim", type=int, default=12)
    p.add_argument("--scan", action="store_true",
                   help="TFIM Krylov convergence vs h in {0.1,0.3,0.5,1.0}")
    args = p.parse_args()
    if args.scan:
        rows = [validate("tfim", args.spins, hh, args.krylov_dim,
                         verbose=False) for hh in (0.1, 0.3, 0.5, 1.0)]
        print(f"{'h':>5}{'err (mHa)':>12}{'basis':>8}")
        for r in rows:
            print(f"{r['h']:>5}{r['error_mha']:>12.4f}{r['basis_size']:>8}")
    else:
        validate(args.model, args.spins, args.h, args.krylov_dim)


if __name__ == "__main__":
    main()
