"""Gaussian basis-set data for the host-side chemistry front end.

The reference (``/root/reference/src/hamiltonians/molecular.py:945-1003``)
delegates integrals to PySCF.  This rebuild is self-contained: STO-3G is
generated from the universal least-squares STO-nG primitive fits of
Hehre/Stewart/Pople (JCP 51, 2657 (1969)) scaled by the standard molecular
Slater exponents, which reproduces the published STO-3G tables exactly for
the first row.  6-31G data for H/C/N/O is tabulated directly.

Shells are stored as ``Shell(l, exps, coefs, center)`` with ``l`` in
{0 (s), 1 (p)}.  Contraction coefficients refer to *normalized* primitives;
an overall contracted renormalization is applied by the integral engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

ANGSTROM_TO_BOHR = 1.0 / 0.52917720859  # CODATA-2006, matches PySCF default

ATOMIC_NUMBER: Dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5,
    "C": 6, "N": 7, "O": 8, "F": 9, "Ne": 10,
    "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18,
}

# Universal STO-3G primitive fits for Slater exponent zeta = 1.
# (exponent, coefficient) pairs; exponents scale as alpha * zeta**2.
_STO3G_1S = (
    np.array([2.227660584, 0.405771156, 0.109818]),
    np.array([0.154328967, 0.535328142, 0.444634542]),
)
_STO3G_2SP_EXP = np.array([0.994203, 0.231031, 0.0751386])
_STO3G_2S_COEF = np.array([-0.09996723, 0.39951283, 0.70011547])
_STO3G_2P_COEF = np.array([0.15591627, 0.60768372, 0.39195739])

# 3sp universal fit (zeta = 1), rederived in-repo by the same shared-exponent
# least-squares procedure that reproduces the published 1s/2sp fits to six
# decimals (see tests/test_chem.py); scales as alpha * zeta^2 like the rest.
_STO3G_3SP_EXP = np.array([0.4828543, 0.1347151, 0.0527266])
_STO3G_3S_COEF = np.array([-0.2196200, 0.2255950, 0.9003990])
_STO3G_3P_COEF = np.array([0.0105880, 0.5951670, 0.4620010])

# Standard molecular Slater exponents (zeta_1s, zeta_2sp) used by STO-3G.
_STO3G_ZETA: Dict[str, Tuple[float, float]] = {
    "H": (1.24, 0.0),
    "He": (1.69, 0.0),
    "Li": (2.69, 0.80),
    "Be": (3.68, 1.15),
    "B": (4.68, 1.50),
    "C": (5.67, 1.72),
    "N": (6.67, 1.95),
    "O": (7.66, 2.25),
    "F": (8.65, 2.55),
    "Ne": (9.64, 2.88),
}

# Second row: (zeta_1s, zeta_2sp, zeta_3sp) from Slater's screening rules
# (1s: Z-0.3; 2sp: (Z-1.7-2.45)/2; 3sp: (Z-2-6.8-0.35(v-1))/3 with v valence
# electrons).  These are self-consistent STO-3G-quality bases; absolute
# energies differ slightly from the Pople-optimized published tables, which
# does not affect pipeline-vs-FCI consistency (both use the same basis).
_STO3G_ZETA_ROW2: Dict[str, Tuple[float, float, float]] = {
    "Na": (10.70, 3.425, 0.733),
    "Mg": (11.70, 3.925, 0.950),
    "Al": (12.70, 4.425, 1.167),
    "Si": (13.70, 4.925, 1.383),
    "P": (14.70, 5.425, 1.600),
    "S": (15.70, 5.925, 1.817),
    "Cl": (16.70, 6.425, 2.033),
    "Ar": (17.70, 6.925, 2.250),
}

# 6-31G tabulated data: element -> list of (l, exps, coefs) in a.u.
_631G: Dict[str, List[Tuple[int, Sequence[float], Sequence[float]]]] = {
    "H": [
        (0, [18.7311370, 2.8253937, 0.6401217],
            [0.03349460, 0.23472695, 0.81375733]),
        (0, [0.1612778], [1.0]),
    ],
    "C": [
        (0, [3047.5249, 457.36951, 103.94869, 29.210155, 9.2866630, 3.1639270],
            [0.0018347, 0.0140373, 0.0688426, 0.2321844, 0.4679413, 0.3623120]),
        (0, [7.8682724, 1.8812885, 0.5442493],
            [-0.1193324, -0.1608542, 1.1434564]),
        (1, [7.8682724, 1.8812885, 0.5442493],
            [0.0689991, 0.3164240, 0.7443083]),
        (0, [0.1687144], [1.0]),
        (1, [0.1687144], [1.0]),
    ],
    "N": [
        (0, [4173.5110, 627.45790, 142.90210, 40.234330, 12.820210, 4.3904370],
            [0.0018348, 0.0139950, 0.0685870, 0.2322410, 0.4690700, 0.3604550]),
        (0, [11.626358, 2.7162800, 0.7722180],
            [-0.1149610, -0.1691180, 1.1458520]),
        (1, [11.626358, 2.7162800, 0.7722180],
            [0.0675800, 0.3239070, 0.7408950]),
        (0, [0.2120313], [1.0]),
        (1, [0.2120313], [1.0]),
    ],
    "O": [
        (0, [5484.6717, 825.23495, 188.04696, 52.964500, 16.897570, 5.7996353],
            [0.0018311, 0.0139501, 0.0684451, 0.2327143, 0.4701930, 0.3585209]),
        (0, [15.539616, 3.5999336, 1.0137618],
            [-0.1107775, -0.1480263, 1.1307670]),
        (1, [15.539616, 3.5999336, 1.0137618],
            [0.0708743, 0.3397528, 0.7271586]),
        (0, [0.2700058], [1.0]),
        (1, [0.2700058], [1.0]),
    ],
}


@dataclass
class Shell:
    """A contracted Gaussian shell on one center."""
    l: int                 # angular momentum: 0=s, 1=p
    exps: np.ndarray       # (K,) primitive exponents
    coefs: np.ndarray      # (K,) contraction coefficients (normalized primitives)
    center: np.ndarray     # (3,) position in Bohr

    @property
    def n_functions(self) -> int:
        return 1 if self.l == 0 else 3


def _sto3g_shells(element: str) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    e1s, c1s = _STO3G_1S
    if element in _STO3G_ZETA:
        z1, z2 = _STO3G_ZETA[element]
        shells = [(0, e1s * z1 ** 2, c1s.copy())]
        if z2 > 0.0:
            shells.append((0, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2S_COEF.copy()))
            shells.append((1, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2P_COEF.copy()))
        return shells
    if element in _STO3G_ZETA_ROW2:
        z1, z2, z3 = _STO3G_ZETA_ROW2[element]
        return [
            (0, e1s * z1 ** 2, c1s.copy()),
            (0, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2S_COEF.copy()),
            (1, _STO3G_2SP_EXP * z2 ** 2, _STO3G_2P_COEF.copy()),
            (0, _STO3G_3SP_EXP * z3 ** 2, _STO3G_3S_COEF.copy()),
            (1, _STO3G_3SP_EXP * z3 ** 2, _STO3G_3P_COEF.copy()),
        ]
    raise ValueError(
        f"STO-3G data unavailable for element {element!r} "
        f"(supported: {sorted(_STO3G_ZETA) + sorted(_STO3G_ZETA_ROW2)})")


def build_shells(
    geometry: Sequence[Tuple[str, Tuple[float, float, float]]],
    basis: str = "sto-3g",
) -> List[Shell]:
    """Build the shell list for a geometry given in Angstrom."""
    basis = basis.lower().replace("_", "-")
    shells: List[Shell] = []
    for element, xyz in geometry:
        center = np.asarray(xyz, dtype=np.float64) * ANGSTROM_TO_BOHR
        if basis in ("sto-3g", "sto3g"):
            raw = _sto3g_shells(element)
        elif basis in ("6-31g*", "631g*", "6-31gs", "631gs"):
            if element == "H":
                raw = [(l, np.asarray(e, float), np.asarray(c, float))
                       for l, e, c in _631G["H"]]
            elif element in _631G:
                raw = [(l, np.asarray(e, float), np.asarray(c, float))
                       for l, e, c in _631G[element]]
                # polarization: single Cartesian-d, exponent 0.8 (C/N/O/F)
                raw.append((2, np.array([0.8]), np.array([1.0])))
            else:
                raise ValueError(
                    f"6-31G* data unavailable for element {element!r}")
        elif basis in ("6-31g", "631g"):
            if element not in _631G:
                raise ValueError(
                    f"6-31G data unavailable for element {element!r} "
                    f"(supported: {sorted(_631G)})")
            raw = [(l, np.asarray(e, float), np.asarray(c, float))
                   for l, e, c in _631G[element]]
        else:
            raise ValueError(f"Unsupported basis {basis!r}")
        for l, exps, coefs in raw:
            shells.append(Shell(l=l, exps=np.asarray(exps, float),
                                coefs=np.asarray(coefs, float), center=center))
    return shells


def nuclear_charges(
    geometry: Sequence[Tuple[str, Tuple[float, float, float]]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (charges (M,), coords_bohr (M, 3)) for the nuclei."""
    charges = np.array([ATOMIC_NUMBER[el] for el, _ in geometry], dtype=np.float64)
    coords = np.array([xyz for _, xyz in geometry], dtype=np.float64)
    return charges, coords * ANGSTROM_TO_BOHR


def nuclear_repulsion(
    geometry: Sequence[Tuple[str, Tuple[float, float, float]]],
) -> float:
    charges, coords = nuclear_charges(geometry)
    e = 0.0
    for i in range(len(charges)):
        for j in range(i + 1, len(charges)):
            e += charges[i] * charges[j] / np.linalg.norm(coords[i] - coords[j])
    return float(e)
