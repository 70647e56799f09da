#!/usr/bin/env python
"""Variationally optimize STO-3G Slater exponents for heavy atoms.

The procedure behind the transition-metal rows of
``chem/basis.py::_STO3G_ZETA_TM``: for a free atom (or the relevant ion),
minimize the in-repo ROHF energy over the shell zetas, using the
universal STO-3G primitive fits (1s/2sp/3sp/3d/4sp) whose exponents scale
as alpha * zeta^2.  No published STO-3G tables for 3d metals are
available in-repo, so the variational optimum IS the basis definition —
documented and validated against an in-repo even-tempered near-HF-limit
reference (tests/test_chem.py).

Usage:
  python tools/fit_tm_zeta.py cr       # neutral Cr, 7S (3d^5 4s^1)
  python tools/fit_tm_zeta.py fe2+     # Fe2+, 5D (3d^6) — the Fe row
"""

import sys

import numpy as np
from scipy.optimize import minimize


def atomic_hf_energy(element: str, zetas, spin: int, charge: int = 0,
                     level_shift: float = 1.0) -> float:
    """ROHF energy of a free atom with explicit TM-shell zetas
    (z1s, z2sp, z3sp, z3d, z4sp) — bypasses the integral cache."""
    from flow_guided_krylov_tpu.chem.basis import (
        _STO3G_1S, _STO3G_2SP_EXP, _STO3G_2S_COEF, _STO3G_2P_COEF,
        _STO3G_3SP_EXP, _STO3G_3S_COEF, _STO3G_3P_COEF,
        _STO3G_3D_EXP, _STO3G_3D_COEF,
        _STO3G_4SP_EXP, _STO3G_4S_COEF, _STO3G_4P_COEF,
        ATOMIC_NUMBER, Shell)
    from flow_guided_krylov_tpu.chem.integrals import (
        expand_shells, overlap_matrix, kinetic_matrix,
        nuclear_attraction_matrix, eri_tensor)
    from flow_guided_krylov_tpu.chem.scf import run_rohf, run_rhf

    z1, z2, z3, zd, z4 = [float(z) for z in zetas]
    e1s, c1s = _STO3G_1S
    center = np.zeros(3)
    raw = [
        (0, e1s * z1 ** 2, c1s),
        (0, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2S_COEF),
        (1, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2P_COEF),
        (0, _STO3G_3SP_EXP * z3 ** 2, _STO3G_3S_COEF),
        (1, _STO3G_3SP_EXP * z3 ** 2, _STO3G_3P_COEF),
        (2, _STO3G_3D_EXP * zd ** 2, _STO3G_3D_COEF),
        (0, _STO3G_4SP_EXP * z4 ** 2, _STO3G_4S_COEF),
        (1, _STO3G_4SP_EXP * z4 ** 2, _STO3G_4P_COEF),
    ]
    shells = [Shell(l=l, exps=np.asarray(e, float),
                    coefs=np.asarray(c, float), center=center)
              for l, e, c in raw]
    funcs = expand_shells(shells)
    S = overlap_matrix(funcs)
    T = kinetic_matrix(funcs)
    Z = ATOMIC_NUMBER[element]
    V = nuclear_attraction_matrix(funcs, np.array([float(Z)]),
                                  np.zeros((1, 3)))
    eri = eri_tensor(funcs)
    n_elec = Z - charge
    n_alpha = (n_elec + spin) // 2
    n_beta = (n_elec - spin) // 2
    if spin == 0:
        e, _, _ = run_rhf(S, T + V, eri, n_alpha, 0.0)
    else:
        e, _, _ = run_rohf(S, T + V, eri, n_alpha, n_beta, 0.0,
                           level_shift=level_shift)
    return float(e)


def optimize(element: str, spin: int, charge: int, x0):
    best = {"e": np.inf}

    def obj(logz):
        z = np.exp(logz)
        try:
            e = atomic_hf_energy(element, z, spin, charge)
        except Exception:
            return 1e6
        if e < best["e"]:
            best["e"] = e
            best["z"] = z
            print(f"  E = {e:.6f}  zetas = {np.round(z, 4)}")
        return e

    out = minimize(obj, np.log(np.asarray(x0, float)),
                   method="Nelder-Mead",
                   options={"xatol": 1e-6, "fatol": 1e-8,
                            "maxiter": 4000, "maxfev": 4000})
    z = np.exp(out.x)
    e = atomic_hf_energy(element, z, spin, charge)
    print(f"\n{element} (charge {charge}, 2S={spin}): "
          f"E_ROHF = {e:.6f} Ha")
    print("zetas (z1s, z2sp, z3sp, z3d, z4sp):",
          tuple(round(float(v), 4) for v in z))
    return z, e


if __name__ == "__main__":
    which = (sys.argv[1] if len(sys.argv) > 1 else "cr").lower()
    if which == "cr":
        # neutral Cr, 7S (3d^5 4s^1): 2S = 6
        optimize("Cr", spin=6, charge=0,
                 x0=(23.5, 9.8, 3.95, 3.2, 1.25))
    elif which in ("fe2+", "fe"):
        # Fe2+, 5D (3d^6): 2S = 4 — reproduces the Fe row
        optimize("Fe", spin=4, charge=2,
                 x0=(25.5, 10.66, 4.32, 3.71, 1.36))
    else:
        raise SystemExit(f"unknown target {which!r}")
