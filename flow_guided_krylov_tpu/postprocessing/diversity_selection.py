"""Excitation-rank-stratified diverse basis selection (Stage 2).

Counterpart of ``/root/reference/src/postprocessing/diversity_selection.py``:
bucket candidate determinants by excitation rank relative to the HF
reference, weight by NQS probability and Boltzmann-like energy importance,
then pick a per-rank budget with a greedy DPP-style rule maximizing
``weight * min_hamming_distance^scale`` (``diversity_selection.py:138-397``).

Rebuilt on packed uint32 determinants: ranks and Hamming distances are
popcounts of XORs, and the greedy loop is vectorized (the reference's
O(n_select * n) Python loop over a ``set``, ``:337-397``, becomes
incremental min-distance updates).  Note: the reference's DPP branch
returns bucket-local indices where global ones are expected; this rebuild
returns global indices (intentional behavioral fix).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "DiversityConfig", "DiversitySelector", "ExcitationBucketer",
    "compute_excitation_rank", "compute_hamming_distance_matrix",
    "select_diverse_basis", "analyze_basis_diversity",
]


def _popcount(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.uint64)
    if hasattr(np, "bitwise_count"):        # numpy >= 2.0: single ufunc
        return np.bitwise_count(x).astype(np.int64)
    count = np.zeros(x.shape, dtype=np.int64)
    one = np.uint64(1)
    while np.any(x):
        count += (x & one).astype(np.int64)
        x = x >> one
    return count


@dataclass
class DiversityConfig:
    """Selection knobs (reference ``diversity_selection.py:26-47``)."""
    max_configs: int = 2048
    rank_0_fraction: float = 0.05
    rank_1_fraction: float = 0.25
    rank_2_fraction: float = 0.50
    rank_3_fraction: float = 0.15
    min_hamming_distance: int = 2
    dpp_kernel_scale: float = 0.5
    use_dpp_selection: bool = True
    use_nqs_importance: bool = True
    use_energy_importance: bool = True


def compute_excitation_rank(packed: np.ndarray, hf: np.ndarray) -> np.ndarray:
    """(#spin-orbital bits differing from HF)/2 (``:50-62``)."""
    packed = np.atleast_2d(packed)
    diff = (_popcount(packed[:, 0] ^ np.uint64(hf[0]))
            + _popcount(packed[:, 1] ^ np.uint64(hf[1])))
    return diff // 2


def compute_hamming_distance_matrix(packed: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distance over spin-orbital occupations (``:73-93``)."""
    packed = np.atleast_2d(packed)
    a = packed[:, 0].astype(np.uint64)
    b = packed[:, 1].astype(np.uint64)
    return (_popcount(a[:, None] ^ a[None, :])
            + _popcount(b[:, None] ^ b[None, :]))


class ExcitationBucketer:
    """rank -> config-index buckets (``:96-135``)."""

    def __init__(self, hf: np.ndarray):
        self.hf = np.asarray(hf, np.uint32)
        self.buckets: Dict[int, np.ndarray] = {}

    def add_configs(self, packed: np.ndarray) -> np.ndarray:
        ranks = compute_excitation_rank(packed, self.hf)
        self.buckets = {int(r): np.where(ranks == r)[0]
                        for r in np.unique(ranks)}
        return ranks


class DiversitySelector:
    """Stratified + diversity-aware determinant selection."""

    def __init__(self, hf_state: np.ndarray,
                 config: Optional[DiversityConfig] = None):
        self.hf = np.asarray(hf_state, np.uint32)
        self.config = config or DiversityConfig()

    def _bucket_budgets(self) -> Dict[int, int]:
        c = self.config
        budgets = {
            0: int(c.max_configs * c.rank_0_fraction),
            1: int(c.max_configs * c.rank_1_fraction),
            2: int(c.max_configs * c.rank_2_fraction),
            3: int(c.max_configs * c.rank_3_fraction),
        }
        budgets[4] = c.max_configs - sum(budgets.values())
        return budgets

    def _importance_weights(self, n: int,
                            nqs_probs: Optional[np.ndarray],
                            energies: Optional[np.ndarray]) -> np.ndarray:
        c = self.config
        w = np.ones(n)
        if c.use_nqs_importance and nqs_probs is not None:
            w = w * (np.asarray(nqs_probs, float) + 1e-10)
        if c.use_energy_importance and energies is not None:
            e = np.asarray(energies, float)
            w = w / (e - e.min() + 1.0)
        return w

    def _dpp_select(self, configs: np.ndarray, weights: np.ndarray,
                    n_select: int) -> np.ndarray:
        """Vectorized greedy DPP: maximize weight * min_dist^scale.

        Distances are computed lazily — one Hamming row per pick — so
        selection is O(n_select * n) time and O(n) memory instead of
        materializing the O(n^2) distance matrix (which spikes to GBs for
        the reference's 8k+ buckets)."""
        c = self.config
        n = len(weights)
        if n <= n_select:
            return np.arange(n)
        a = configs[:, 0].astype(np.uint64)
        b = configs[:, 1].astype(np.uint64)

        def dist_row(i: int) -> np.ndarray:
            return (_popcount(a ^ a[i]) + _popcount(b ^ b[i])).astype(float)

        chosen = np.empty(n_select, dtype=np.int64)
        chosen[0] = int(np.argmax(weights))
        min_dist = dist_row(chosen[0])
        alive = np.ones(n, bool)
        alive[chosen[0]] = False
        for i in range(1, n_select):
            score = np.where(
                alive & (min_dist >= c.min_hamming_distance),
                weights * np.power(np.maximum(min_dist, 1e-12),
                                   c.dpp_kernel_scale),
                -np.inf)
            if np.isneginf(score).all():
                # everything too close: fall back to weight argmax
                score = np.where(alive, weights, -np.inf)
            pick = int(np.argmax(score))
            chosen[i] = pick
            alive[pick] = False
            min_dist = np.minimum(min_dist, dist_row(pick))
        return chosen

    def select(self, packed: np.ndarray,
               nqs_probs: Optional[np.ndarray] = None,
               local_energies: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, Dict]:
        """Select a diverse subset; returns (selected (M,2) uint32, stats)."""
        packed = np.atleast_2d(np.asarray(packed, np.uint32))
        keys = (packed[:, 0].astype(np.uint64) << np.uint64(32)) \
            | packed[:, 1].astype(np.uint64)
        _, uniq_idx = np.unique(keys, return_index=True)
        uniq = packed[uniq_idx]
        probs_u = nqs_probs[uniq_idx] if nqs_probs is not None else None
        en_u = local_energies[uniq_idx] if local_energies is not None else None
        n_unique = len(uniq)

        bucketer = ExcitationBucketer(self.hf)
        bucketer.add_configs(uniq)
        weights = self._importance_weights(n_unique, probs_u, en_u)
        budgets = self._bucket_budgets()

        selected: list = []
        bucket_stats = {}
        for rank in sorted(bucketer.buckets):
            idx = bucketer.buckets[rank]
            n_select = budgets.get(min(rank, 4), 0)
            if n_select <= 0 or len(idx) == 0:
                continue
            if self.config.use_dpp_selection and len(idx) > n_select:
                local = self._dpp_select(uniq[idx], weights[idx], n_select)
                picked = idx[local]
            else:
                order = np.argsort(-weights[idx])[:n_select]
                picked = idx[order]
            selected.extend(picked.tolist())
            bucket_stats[f"rank_{rank}"] = {
                "available": int(len(idx)), "selected": int(len(picked))}

        if not selected:
            n_select = min(self.config.max_configs, n_unique)
            selected = np.argsort(-weights)[:n_select].tolist()

        stats = {
            "n_input": int(len(packed)),
            "n_unique": int(n_unique),
            "n_selected": int(len(selected)),
            "bucket_stats": bucket_stats,
        }
        return uniq[np.asarray(selected, dtype=np.int64)], stats


def select_diverse_basis(packed, hf_state, max_configs: int = 2048,
                         nqs_probs=None, local_energies=None,
                         **kwargs) -> Tuple[np.ndarray, Dict]:
    """Functional wrapper (``diversity_selection.py:400-430``)."""
    cfg = DiversityConfig(max_configs=max_configs, **kwargs)
    return DiversitySelector(hf_state, cfg).select(
        packed, nqs_probs, local_energies)


def analyze_basis_diversity(packed: np.ndarray, hf_state) -> Dict:
    """Rank distribution + pairwise-distance stats (``:433-471``)."""
    packed = np.atleast_2d(packed)
    ranks = compute_excitation_rank(packed, np.asarray(hf_state, np.uint32))
    out = {
        "n_configs": int(len(packed)),
        "rank_distribution": {int(r): int((ranks == r).sum())
                              for r in np.unique(ranks)},
        "mean_rank": float(ranks.mean()),
    }
    if len(packed) <= 4096:
        d = compute_hamming_distance_matrix(packed)
        iu = np.triu_indices(len(packed), 1)
        if len(iu[0]):
            out["mean_pairwise_distance"] = float(d[iu].mean())
            out["min_pairwise_distance"] = int(d[iu].min())
    return out
