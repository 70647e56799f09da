#!/usr/bin/env python
"""Derive universal STO-3G primitive fits (shared-exponent least squares).

Reproduces the Hehre-Stewart-Pople (JCP 51, 2657 (1969)) procedure: for a
Slater orbital with zeta = 1, maximize the overlap of a 3-Gaussian
expansion, with s/p (or s/p/d) functions of one shell sharing exponents.
Validates against the published 1s and 2sp fits (reproduced to ~1e-5),
then emits the 3d and 4sp fits used for transition-metal shells
(``chem/basis.py``).

Exponents scale as alpha * zeta^2 exactly like the published shells.
"""

import numpy as np
from scipy.integrate import quad
from scipy.optimize import minimize


def sto_radial(n):
    """Normalized R(r) = N r^(n-1) e^(-r)."""
    from math import factorial
    N = (2.0) ** (n + 0.5) / np.sqrt(float(factorial(2 * n)))
    return lambda r: N * r ** (n - 1) * np.exp(-r)


def gauss_radial(l, a):
    """Normalized primitive Gaussian radial N r^l e^(-a r^2)."""
    # ∫ N^2 r^(2l) e^(-2 a r^2) r^2 dr = 1
    from math import gamma
    norm2 = 0.5 * gamma(l + 1.5) / (2.0 * a) ** (l + 1.5)
    N = 1.0 / np.sqrt(norm2)
    return lambda r: N * r ** l * np.exp(-a * r * r)


def overlap_sto_gauss(n, l, a):
    f = sto_radial(n)
    g = gauss_radial(l, a)
    val, _ = quad(lambda r: f(r) * g(r) * r * r, 0.0, 60.0, limit=200)
    return val


def gauss_overlap(l, a, b):
    from math import gamma
    num = 0.5 * gamma(l + 1.5) / (a + b) ** (l + 1.5)
    na = np.sqrt(0.5 * gamma(l + 1.5) / (2 * a) ** (l + 1.5))
    nb = np.sqrt(0.5 * gamma(l + 1.5) / (2 * b) ** (l + 1.5))
    return num / (na * nb)


def best_coefs(n, l, exps):
    """Optimal contraction for given exponents: c ∝ S^-1 v."""
    v = np.array([overlap_sto_gauss(n, l, a) for a in exps])
    S = np.array([[gauss_overlap(l, a, b) for b in exps] for a in exps])
    c = np.linalg.solve(S, v)
    norm = np.sqrt(c @ S @ c)
    c = c / norm
    return c, float(c @ v)


def fit_shell(shells, x0):
    """shells: list of (n, l) sharing exponents; maximize sum of overlaps^2."""

    def neg(logx):
        exps = np.exp(logx)
        tot = 0.0
        for n, l in shells:
            _, s = best_coefs(n, l, exps)
            tot += s * s
        return -tot

    out = minimize(neg, np.log(np.asarray(x0)), method="Nelder-Mead",
                   options={"xatol": 1e-12, "fatol": 1e-14,
                            "maxiter": 20000, "maxfev": 20000})
    exps = np.exp(out.x)
    order = np.argsort(-exps)
    exps = exps[order]
    res = {"exps": exps}
    for n, l in shells:
        c, s = best_coefs(n, l, exps)
        res[(n, l)] = (c, s)
    return res


if __name__ == "__main__":
    r = fit_shell([(1, 0)], [2.2, 0.4, 0.1])
    print("1s exps :", r["exps"], "(published 2.227660585 0.405771156 0.109818)")
    print("1s coefs:", r[(1, 0)][0])

    r = fit_shell([(2, 0), (2, 1)], [1.0, 0.23, 0.075])
    print("2sp exps:", r["exps"], "(published 0.994203 0.231031 0.0751386)")
    print("2s coefs:", r[(2, 0)][0])
    print("2p coefs:", r[(2, 1)][0])

    r = fit_shell([(3, 0), (3, 1)], [0.48, 0.13, 0.05])
    print("3sp exps:", r["exps"])
    print("3s coefs:", r[(3, 0)][0])
    print("3p coefs:", r[(3, 1)][0])

    r = fit_shell([(3, 2)], [0.55, 0.16, 0.06])
    print("3d exps :", r["exps"])
    print("3d coefs:", r[(3, 2)][0])

    r = fit_shell([(4, 0), (4, 1)], [0.25, 0.09, 0.04])
    print("4sp exps:", r["exps"])
    print("4s coefs:", r[(4, 0)][0])
    print("4p coefs:", r[(4, 1)][0])
