#!/usr/bin/env python
"""Near-HF-limit atomic energies from an in-repo even-tempered basis.

Published STO-3G tables for Ar and the 3d metals are not available
in-repo, so the fitted/extrapolated zetas in ``chem/basis.py`` cannot be
checked against a published *minimal-basis* energy.  What CAN be checked
against literature is the HF limit itself: a large even-tempered Gaussian
basis run through the same integral engine + ROHF must land on the
published Hartree-Fock-limit energies (Clementi & Roetti 1974; e.g.
Ar -526.8175, Cr(7S) -1043.356, Fe(5D) -1262.444 Ha).  That validates the
engine end-to-end for these elements, and positions the minimal-basis
fits a documented distance above the limit.

Usage: python tools/hf_limit_check.py ar|cr|fe
"""

import sys
import time

import numpy as np

# published HF-limit energies (Clementi & Roetti, ADNDT 14, 177 (1974))
HF_LIMIT = {"Ar": -526.8175, "Cr": -1043.356, "Fe": -1262.4437}


def even_tempered_energy(element: str, spin: int, n_s: int, n_p: int,
                         n_d: int = 0, alpha0_s: float = 0.05,
                         beta: float = 2.9, level_shift: float = 1.0):
    """Atomic ROHF energy in an even-tempered (n_s)s (n_p)p (n_d)d basis:
    exponents alpha0 * beta^k per angular momentum."""
    from flow_guided_krylov_tpu.chem.basis import ATOMIC_NUMBER, Shell
    from flow_guided_krylov_tpu.chem.integrals import (
        expand_shells, overlap_matrix, kinetic_matrix,
        nuclear_attraction_matrix, eri_tensor)
    from flow_guided_krylov_tpu.chem.scf import run_rhf, run_rohf

    center = np.zeros(3)
    shells = []
    for l, n_fn, a0 in ((0, n_s, alpha0_s), (1, n_p, alpha0_s * 0.8),
                        (2, n_d, alpha0_s * 2.0)):
        for k in range(n_fn):
            shells.append(Shell(l=l, exps=np.array([a0 * beta ** k]),
                                coefs=np.array([1.0]), center=center))
    funcs = expand_shells(shells)
    S = overlap_matrix(funcs)
    T = kinetic_matrix(funcs)
    Z = ATOMIC_NUMBER[element]
    V = nuclear_attraction_matrix(funcs, np.array([float(Z)]),
                                  np.zeros((1, 3)))
    eri = eri_tensor(funcs)
    n_alpha = (Z + spin) // 2
    n_beta = (Z - spin) // 2
    if spin == 0:
        e, _, _ = run_rhf(S, T + V, eri, n_alpha, 0.0)
    else:
        e, _, _ = run_rohf(S, T + V, eri, n_alpha, n_beta, 0.0,
                           level_shift=level_shift)
    return float(e), len(funcs)


TARGETS = {
    "ar": ("Ar", 0, dict(n_s=16, n_p=11)),
    "cr": ("Cr", 6, dict(n_s=18, n_p=12, n_d=8)),
    "fe": ("Fe", 4, dict(n_s=18, n_p=12, n_d=8)),
}

if __name__ == "__main__":
    which = (sys.argv[1] if len(sys.argv) > 1 else "ar").lower()
    el, spin, kw = TARGETS[which]
    t0 = time.time()
    e, nf = even_tempered_energy(el, spin, **kw)
    lim = HF_LIMIT[el]
    print(f"{el}: E = {e:.4f} Ha ({nf} functions, "
          f"{time.time() - t0:.1f} s)")
    print(f"published HF limit {lim}; delta = {1000 * (e - lim):+.1f} mHa")
