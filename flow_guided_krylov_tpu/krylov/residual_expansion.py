"""Selected-CI style basis expansion with PT2 importance (Stage 3).

Counterpart of ``/root/reference/src/krylov/residual_expansion.py``:

* :class:`SelectedCIExpander` — one round: diagonalize the current basis
  (host float64), accumulate *signed* couplings <i|H|Phi> = sum_j c_j <i|H|j>
  over all external connected determinants, score epsilon_i =
  |<i|H|Phi>|^2 / |E - E_i|, add the top-k, rediagonalize, and reject the
  round if the energy rose (variational check)
  (``residual_expansion.py:305-554``).
* :class:`ResidualBasedExpander` — raw-residual variant r_i = max_j |c_j
  H_ij| with keep-max dedup (``residual_expansion.py:60-257``).
* :func:`iterative_residual_expansion` — convenience loop
  (``residual_expansion.py:260-302``).

The reference's per-state Python loop + dict accumulation
(``:492-522``) becomes one vectorized batch: connections for the whole
basis come from the static-shape kernel, then a key-grouped bincount —
O(B*C) with no Python-level loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from ..hamiltonians.base import Hamiltonian

__all__ = ["ResidualExpansionConfig", "SelectedCIExpander",
           "ResidualBasedExpander", "iterative_residual_expansion"]


@dataclass
class ResidualExpansionConfig:
    """Expansion knobs (reference ``residual_expansion.py:27-57``)."""
    configs_per_iteration: int = 100
    residual_threshold: float = 1e-4
    max_iterations: int = 10
    energy_convergence: float = 1e-6
    stagnation_threshold: float = 5e-5    # 0.05 mHa
    stagnation_patience: int = 2
    max_basis_size: int = 4096
    coefficient_threshold: float = 1e-6   # |c_j| cutoff for source states


class SelectedCIExpander:
    """PT2-scored Selected-CI expansion over packed determinants."""

    def __init__(self, hamiltonian: Hamiltonian,
                 config: Optional[ResidualExpansionConfig] = None):
        self.h = hamiltonian
        self.config = config or ResidualExpansionConfig()
        self._last_coeffs: Optional[np.ndarray] = None

    # ------------------------------------------------------------------

    def _diagonalize(self, basis: np.ndarray) -> Tuple[float, np.ndarray]:
        """Ground state of H projected on basis (host f64; reference
        ``residual_expansion.py:408-443``).  Warm-started with the previous
        round's eigenvector (zero-padded for the added determinants)."""
        v0 = None
        prev = self._last_coeffs
        if prev is not None and len(prev) <= len(basis):
            v0 = np.zeros(len(basis))
            v0[:len(prev)] = prev
        try:
            vals, vecs = self.h.exact_ground_state(basis, k=1, v0=v0)
        except TypeError:
            vals, vecs = self.h.exact_ground_state(basis, k=1)
        self._last_coeffs = vecs[:, 0]
        return float(vals[0]), vecs[:, 0]

    def _pt2_candidates(self, basis: np.ndarray, coeffs: np.ndarray,
                        energy: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Return (candidate dets (M, W), PT2 scores (M,))."""
        c = self.config
        sig = np.abs(coeffs) > c.coefficient_threshold
        if not sig.any():
            sig = np.abs(coeffs) >= np.abs(coeffs).max()
        src = basis[sig]
        src_c = coeffs[sig]

        conn, elems = self.h.connections_np(src)          # (S, C, W), (S, C)
        flat = conn.reshape(-1, conn.shape[-1])
        contrib = (elems * src_c[:, None]).reshape(-1)    # c_j * <i|H|j>

        keys = self.h.keys(flat)
        basis_keys = np.sort(self.h.keys(basis))
        pos = np.searchsorted(basis_keys, keys)
        pos = np.clip(pos, 0, len(basis_keys) - 1)
        external = basis_keys[pos] != keys

        keys_ext = keys[external]
        contrib_ext = contrib[external]
        flat_ext = flat[external]
        if len(keys_ext) == 0:
            return np.empty((0, basis.shape[1]), np.uint32), np.empty(0)

        uniq_keys, first_idx, inverse = np.unique(
            keys_ext, return_index=True, return_inverse=True)
        coupling = np.bincount(inverse, weights=contrib_ext,
                               minlength=len(uniq_keys))
        cand = flat_ext[first_idx]

        diag = self.h.diagonal_np(cand)
        denom = np.abs(energy - diag) + 1e-12
        scores = coupling ** 2 / denom
        return cand, scores

    def expand_basis(self, basis: np.ndarray,
                     n_add: Optional[int] = None) -> Dict:
        """One expansion round with variational rejection
        (``residual_expansion.py:334-406``)."""
        c = self.config
        basis = np.atleast_2d(np.asarray(basis, np.uint32))
        e0, coeffs = self._diagonalize(basis)

        n_add = n_add or c.configs_per_iteration
        room = c.max_basis_size - len(basis)
        n_add = max(0, min(n_add, room))
        if n_add == 0:
            return {"basis": basis, "energy": e0, "n_added": 0,
                    "accepted": False, "reason": "basis at capacity"}

        cand, scores = self._pt2_candidates(basis, coeffs, e0)
        keep = scores > c.residual_threshold ** 2
        cand, scores = cand[keep], scores[keep]
        if len(cand) == 0:
            return {"basis": basis, "energy": e0, "n_added": 0,
                    "accepted": False, "reason": "no candidates above threshold"}

        top = np.argsort(-scores)[:n_add]
        new_basis = np.concatenate([basis, cand[top]], axis=0)
        e1, _ = self._diagonalize(new_basis)

        if e1 > e0 + 1e-10:
            # variational violation: adding states must not raise the energy
            return {"basis": basis, "energy": e0, "n_added": 0,
                    "accepted": False, "reason": "variational violation",
                    "rejected_energy": e1}
        return {"basis": new_basis, "energy": e1, "n_added": int(len(top)),
                "accepted": True, "pt2_correction": float(scores[top].sum())}


class ResidualBasedExpander:
    """Raw-residual selection: r_i = max_j |c_j <i|H|j>| keep-max dedup
    (reference ``residual_expansion.py:60-257``)."""

    def __init__(self, hamiltonian: Hamiltonian,
                 config: Optional[ResidualExpansionConfig] = None):
        self.h = hamiltonian
        self.config = config or ResidualExpansionConfig()

    def find_residual_configs(self, basis: np.ndarray, coeffs: np.ndarray,
                              n_add: int) -> np.ndarray:
        c = self.config
        basis = np.atleast_2d(basis)
        sig = np.abs(coeffs) > c.coefficient_threshold
        if not sig.any():
            return np.empty((0, basis.shape[1]), np.uint32)
        conn, elems = self.h.connections_np(basis[sig])
        flat = conn.reshape(-1, conn.shape[-1])
        resid = np.abs(elems * coeffs[sig][:, None]).reshape(-1)

        keys = self.h.keys(flat)
        basis_keys = np.sort(self.h.keys(basis))
        pos = np.clip(np.searchsorted(basis_keys, keys), 0,
                      len(basis_keys) - 1)
        ext = basis_keys[pos] != keys
        keys, flat, resid = keys[ext], flat[ext], resid[ext]
        if len(keys) == 0:
            return np.empty((0, basis.shape[1]), np.uint32)

        # keep-max dedup
        order = np.lexsort((-resid, keys))
        keys_s, flat_s, resid_s = keys[order], flat[order], resid[order]
        first = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        cand, r = flat_s[first], resid_s[first]
        keep = r > c.residual_threshold
        cand, r = cand[keep], r[keep]
        top = np.argsort(-r)[:n_add]
        return cand[top]

    def expand_basis(self, basis: np.ndarray,
                     n_add: Optional[int] = None) -> Dict:
        basis = np.atleast_2d(np.asarray(basis, np.uint32))
        vals, vecs = self.h.exact_ground_state(basis, k=1)
        e0, coeffs = float(vals[0]), vecs[:, 0]
        n_add = n_add or self.config.configs_per_iteration
        cand = self.find_residual_configs(basis, coeffs, n_add)
        if len(cand) == 0:
            return {"basis": basis, "energy": e0, "n_added": 0,
                    "accepted": False}
        new_basis = np.concatenate([basis, cand], axis=0)
        e1 = float(self.h.exact_ground_state(new_basis, k=1)[0][0])
        if e1 > e0 + 1e-10:
            return {"basis": basis, "energy": e0, "n_added": 0,
                    "accepted": False, "rejected_energy": e1}
        return {"basis": new_basis, "energy": e1, "n_added": int(len(cand)),
                "accepted": True}


def iterative_residual_expansion(hamiltonian: Hamiltonian,
                                 initial_basis: np.ndarray,
                                 config: Optional[ResidualExpansionConfig] = None,
                                 use_pt2: bool = True,
                                 verbose: bool = False) -> Dict:
    """Loop expansion rounds with stagnation-based early stopping
    (reference ``residual_expansion.py:260-302`` + pipeline loop
    ``pipeline.py:527-596``)."""
    import dataclasses
    cfg = config or ResidualExpansionConfig()
    basis = np.atleast_2d(np.asarray(initial_basis, np.uint32))
    # never let a large seed basis turn expansion into a no-op: the cap
    # must leave room for the requested rounds
    needed = len(basis) + cfg.max_iterations * cfg.configs_per_iteration
    if cfg.max_basis_size < needed:
        cfg = dataclasses.replace(cfg, max_basis_size=needed)
    expander = (SelectedCIExpander(hamiltonian, cfg) if use_pt2
                else ResidualBasedExpander(hamiltonian, cfg))
    energies = []
    best_energy = np.inf
    best_basis = basis
    stall = 0
    for it in range(cfg.max_iterations):
        out = expander.expand_basis(basis)
        e = out["energy"]
        energies.append(e)
        if e < best_energy - 1e-12:
            improvement = best_energy - e
            best_energy, best_basis = e, out["basis"]
        else:
            improvement = 0.0
        basis = out["basis"]
        if verbose:
            print(f"  residual iter {it}: E={e:.8f} "
                  f"basis={len(basis)} added={out['n_added']} "
                  f"accepted={out['accepted']}")
        if not out["accepted"]:
            break
        if improvement < cfg.stagnation_threshold:
            stall += 1
            if stall >= cfg.stagnation_patience:
                break
        else:
            stall = 0
    return {"basis": best_basis, "energy": best_energy,
            "energies": energies, "n_iterations": len(energies)}
