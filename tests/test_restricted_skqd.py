"""Restricted-subspace SKQD: stage 4 beyond full-space enumeration.

Round-3 verdict item 3: the pipeline skipped SKQD whenever the
particle-conserving space outgrew the propagator, so the framework's
namesake stage never ran at the molecular frontier.  Restricted SKQD
evolves within (stage-3 basis + top PT2-ranked externals) instead
(reference full-space subspace setup: ``skqd.py:135-177``).

Tested on LiH/N2-class systems where the FULL-space answer is available
for comparison: the restricted run must discover determinants beyond its
seed basis and land between the seed energy and FCI.
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import MOLECULE_FACTORIES
from flow_guided_krylov_tpu.krylov import (SKQDConfig,
                                           FlowGuidedSKQD)
from flow_guided_krylov_tpu.krylov.skqd import build_restricted_subspace


@pytest.fixture(scope="module")
def lih():
    return MOLECULE_FACTORIES["lih"]()


def _seed_basis(h, n=24):
    """HF + its strongest connections as a stand-in stage-3 basis."""
    hf = h.get_hf_state()[None, :]
    conn, el = h.connections_np(hf)
    order = np.argsort(-np.abs(el[0]))
    basis = np.concatenate([hf, conn[0][order[:n - 1]]], axis=0)
    keys = h.keys(basis)
    _, first = np.unique(keys, return_index=True)
    return basis[np.sort(first)]


def test_build_restricted_subspace_invariants(lih):
    h = lih
    basis = _seed_basis(h, 24)
    hf = h.get_hf_state()[None, :]
    cap = 80
    states = build_restricted_subspace(h, basis, cap, initial_state=hf)
    assert len(states) <= cap
    assert len(states) > len(basis)                    # externals added
    keys = set(h.keys(states).tolist())
    for row in basis:
        assert int(h.keys(row[None, :])[0]) in keys    # basis contained
    assert int(h.keys(hf)[0]) in keys                  # init contained
    assert len(keys) == len(states)                    # dedup
    # particle sector conserved
    pa = np.array([bin(int(r[0])).count("1") for r in states])
    pb = np.array([bin(int(r[1])).count("1") for r in states])
    assert np.all(pa == h.integrals.n_alpha)
    assert np.all(pb == h.integrals.n_beta)


def test_build_restricted_subspace_overflowing_basis(lih):
    """A basis larger than the cap keeps its top-|c| rows."""
    h = lih
    basis = _seed_basis(h, 40)
    hf = h.get_hf_state()[None, :]
    states = build_restricted_subspace(h, basis, 16, initial_state=hf)
    assert len(states) <= 16
    assert int(h.keys(hf)[0]) in set(h.keys(states).tolist())


def test_restricted_skqd_discovers_and_improves(lih):
    """Restricted evolution must (a) sample determinants outside the seed
    basis, (b) improve the energy beyond the seed-basis eigensolve, and
    (c) stay variational (above FCI).

    Seeded WEAK (HF + 7 connections) so there is something to discover —
    the reference records 0 Krylov-unique configs for a converged LiH
    basis (SKQD_VALIDATION_REPORT.md:155-160), and a strong seed
    reproduces exactly that.  Measured here: 0.58 mHa seed -> ~0.04 mHa,
    basis 8 -> ~20."""
    h = lih
    fci = h.fci_energy()
    basis = _seed_basis(h, 8)
    e_seed = float(h.exact_ground_state(basis, k=1)[0][0])

    states = build_restricted_subspace(h, basis, 150,
                                       initial_state=h.get_hf_state())
    skqd = FlowGuidedSKQD(
        h, basis,
        SKQDConfig(max_krylov_dim=6, shots_per_krylov=20_000, seed=0,
                   time_step=0.4, evolution="scipy"),
        initial_state=h.get_hf_state(), subspace_states=states)
    assert skqd.restricted
    assert skqd.dim == len(states) < h.n_valid_configs
    out = skqd.run_with_nf()
    e = out["best_stable_energy"]
    assert e <= e_seed + 1e-9
    assert e >= fci - 1e-9                              # variational
    assert e - fci < (e_seed - fci) * 0.5               # real improvement
    assert out["combined_sizes"][-1] > len(basis)       # discovery


def test_restricted_skqd_device_ell_w2_membership(lih):
    """The device ELL build must handle W=2 molecular keys
    ((alpha << n_orb) | beta packed in uint32) — matvec parity against
    the host sparse matrix on the restricted space."""
    import jax.numpy as jnp
    h = lih
    basis = _seed_basis(h, 20)
    states = build_restricted_subspace(h, basis, 100,
                                       initial_state=h.get_hf_state())
    skqd = FlowGuidedSKQD(h, basis, SKQDConfig(evolution="ell"),
                          initial_state=h.get_hf_state(),
                          subspace_states=states)
    ell = skqd._ell_structure()
    assert ell is not None
    diag, elems_t, tgt_t = ell
    # reconstruct H@v from the ELL table and compare to scipy CSR
    rng = np.random.default_rng(0)
    v = rng.normal(size=skqd.dim).astype(np.float32)
    Hv_ell = np.asarray(diag) * v
    elems = np.asarray(elems_t).T                       # (N, C)
    tgt = np.asarray(tgt_t).T
    for c in range(elems.shape[1]):
        np.add.at(Hv_ell, tgt[:, c], 0.0)               # no-op guard
    # target columns: H[tgt, i] += elems  (conn lists column-wise action)
    Hv = np.asarray(diag) * v
    for c in range(elems.shape[1]):
        np.add.at(Hv, tgt[:, c], elems[:, c] * v)
    H = skqd.subspace_hamiltonian.toarray()
    Hv_ref = H @ v
    assert np.max(np.abs(Hv - Hv_ref)) < 5e-4


def test_pipeline_routes_restricted_skqd(lih, monkeypatch):
    """With the full space declared too large, stage 4 must run the
    restricted route instead of skipping (the round-3 behavior).  A
    deliberately poor stage-3 result is injected so the accuracy-based
    skip heuristics cannot fire."""
    from flow_guided_krylov_tpu.pipeline import (FlowGuidedKrylovPipeline,
                                                 PipelineConfig)
    h = lih
    fci = h.fci_energy()
    cfg = PipelineConfig(max_krylov_dim=4, shots_per_krylov=10_000,
                         verbose=False)
    pipe = FlowGuidedKrylovPipeline(h, cfg, exact_energy=fci)
    # pretend the 225-config space is beyond full evolution, with a
    # propagator cap that still leaves room beyond the stage-3 basis
    monkeypatch.setattr(pipe, "_supported_evolution_dim", lambda: 180)
    pipe.n_valid = 300_000
    seed = _seed_basis(h, 4)                 # ~several-mHa stage-3 stand-in
    e_seed = float(h.exact_ground_state(seed, k=1)[0][0])
    assert e_seed - fci > 2e-3               # poor enough to not skip
    pipe.nf_basis = seed
    pipe.results["stage3"] = {"energy": e_seed, "basis": seed}
    out = pipe.run_skqd()
    assert not out["skipped"]
    assert 0 < out["restricted_dim"] <= 180
    assert out["final_energy"] <= e_seed + 1e-9
    assert out["final_energy"] >= fci - 1e-9
