"""CCSD / CCSD(T) oracle validation (chem/ccsd.py).

CCSD is exact for two-electron systems, so H2 (in two bases) pins the full
machinery against in-repo FCI to ~1e-8 Ha.  The MP2 starting energy is
cross-checked against the independent closed-shell spatial-orbital formula.
Multi-electron systems are compared against in-repo FCI with physically
known gaps (CCSD slightly above FCI; (T) closes most of the rest).
Counterpart of the reference's PySCF CCSD fallback
(``/root/reference/examples/moderate_system_benchmark.py:122-157``).
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.chem import (compute_active_space_integrals,
                                         compute_molecular_integrals,
                                         run_ccsd)
from flow_guided_krylov_tpu.chem.ccsd import (ccsd_reference_dict,
                                              mp2_energy_closed_shell)
from flow_guided_krylov_tpu.hamiltonians import (MOLECULE_FACTORIES,
                                                 MolecularHamiltonian)


def test_h2_ccsd_equals_fci():
    h = MOLECULE_FACTORIES["h2"]()
    res = run_ccsd(h.integrals, do_triples=True)
    assert res.converged
    assert abs(res.e_tot - h.fci_energy()) < 1e-8
    # no triples exist for 2 electrons
    assert res.e_triples == pytest.approx(0.0, abs=1e-14)


def test_h2_631g_ccsd_equals_fci():
    ints = compute_molecular_integrals(
        [("H", (0, 0, 0)), ("H", (0, 0, 0.74))], basis="6-31g")
    res = run_ccsd(ints)
    fci = MolecularHamiltonian(ints).fci_energy()
    assert res.converged
    assert abs(res.e_tot - fci) < 1e-7


def test_mp2_cross_check():
    """Spin-orbital MP2 (initial CCSD amplitudes) must equal the
    independent closed-shell spatial-orbital formula."""
    h = MOLECULE_FACTORIES["h2o"]()
    ints = h.integrals
    e_mp2_spatial = mp2_energy_closed_shell(ints)

    # recompute the spin-orbital MP2 through the CCSD entry point by
    # stopping after 0 iterations is not exposed; instead check that a
    # 1-cycle run's energy history starts from MP2: run with max_cycles=1
    # and verify E_corr moved *from* MP2 (sanity), and that the tensors
    # agree by computing MP2 directly from the same spin-orbital blocks.
    from flow_guided_krylov_tpu.chem.ccsd import _spin_orbital_tensors
    h1, eri, occ = _spin_orbital_tensors(ints)
    f = h1 + np.einsum("piqi->pq", eri[:, occ][:, :, :, occ], optimize=True)
    m = h1.shape[0]
    occ_set = set(int(p) for p in occ)
    v_idx = np.array([p for p in range(m) if p not in occ_set])
    o_idx = np.asarray(occ)
    fd = np.diag(f)
    d2 = (fd[o_idx][:, None, None, None] + fd[o_idx][None, :, None, None]
          - fd[v_idx][None, None, :, None] - fd[v_idx][None, None, None, :])
    oovv = eri[np.ix_(o_idx, o_idx, v_idx, v_idx)]
    e_mp2_so = 0.25 * float(np.einsum("ijab,ijab->", oovv, oovv / d2))
    assert abs(e_mp2_so - e_mp2_spatial) < 1e-10


@pytest.mark.parametrize("name,tol_ccsd,tol_t", [
    ("lih", 5e-5, 1e-5),     # 4 electrons: CCSD ~0.011 mHa above FCI
    ("h2o", 5e-4, 2e-4),     # 10 electrons: ~0.12 mHa
    ("beh2", 1e-3, 5e-4),    # ~0.40 mHa
])
def test_ccsd_vs_fci_gap(name, tol_ccsd, tol_t):
    h = MOLECULE_FACTORIES[name]()
    fci = h.fci_energy()
    res = run_ccsd(h.integrals, do_triples=True)
    assert res.converged
    # CCSD lands above FCI (not variational in general, but is here)
    assert -1e-7 < res.e_tot - fci < tol_ccsd
    # (T) closes most of the remaining gap
    assert abs(res.e_tot_t - fci) < tol_t
    assert res.e_tot_t < res.e_tot


def test_open_shell_rohf_ccsd():
    """Li atom (doublet, ROHF reference): one valence electron outside a
    core pair — CCSD captures essentially all correlation."""
    ints = compute_molecular_integrals([("Li", (0.0, 0.0, 0.0))],
                                       basis="sto-3g", spin=1)
    res = run_ccsd(ints)
    fci = MolecularHamiltonian(ints).fci_energy()
    assert res.converged
    assert abs(res.e_tot - fci) < 1e-6


def test_frozen_core_matches_folded_active_space():
    h = MOLECULE_FACTORIES["lih"]()
    direct = run_ccsd(h.integrals, n_frozen=1)
    folded = run_ccsd(compute_active_space_integrals(h.integrals, n_frozen=1))
    assert abs(direct.e_tot - folded.e_tot) < 1e-9


@pytest.mark.parametrize("name", ["lih", "h2o", "beh2"])
def test_blocked_triples_matches_full_tensor(name):
    """The O(nv^3)-memory blocked (T) (the >32-orbital frontier path) must
    reproduce the full-t3-tensor contraction to machine precision."""
    from flow_guided_krylov_tpu.chem.ccsd import (
        _perturbative_triples, _perturbative_triples_blocked,
        _spin_orbital_tensors)
    h = MOLECULE_FACTORIES[name]()
    ints = h.integrals
    res = run_ccsd(ints, do_triples=True)

    # rebuild the converged-amplitude inputs the same way run_ccsd does
    h1, eri, occ_all = _spin_orbital_tensors(ints)
    f = h1 + np.einsum("piqi->pq", eri[:, occ_all][:, :, :, occ_all],
                       optimize=True)
    m = h1.shape[0]
    occ_set = set(int(p) for p in occ_all)
    o_idx = np.asarray(occ_all, dtype=np.int64)
    v_idx = np.array([p for p in range(m) if p not in occ_set],
                     dtype=np.int64)
    fd = np.diag(f)
    ix = np.ix_
    oovv = eri[ix(o_idx, o_idx, v_idx, v_idx)]
    ovvv = eri[ix(o_idx, v_idx, v_idx, v_idx)]
    ooov = eri[ix(o_idx, o_idx, o_idx, v_idx)]
    d1 = fd[o_idx][:, None] - fd[v_idx][None, :]
    d2 = (fd[o_idx][:, None, None, None] + fd[o_idx][None, :, None, None]
          - fd[v_idx][None, None, :, None] - fd[v_idx][None, None, None, :])
    # MP2 amplitudes are a perfectly good (T) input for a parity check
    t1 = f[ix(o_idx, v_idx)] / d1
    t2 = oovv / d2

    e_full = _perturbative_triples(t1, t2, oovv, ovvv, ooov, fd,
                                   o_idx, v_idx)
    e_blocked = _perturbative_triples_blocked(t1, t2, oovv, ovvv, ooov,
                                              fd, o_idx, v_idx)
    assert e_full == pytest.approx(e_blocked, abs=1e-12, rel=1e-10)
    assert res.e_triples < 0.0


def test_ccsd_reference_dict():
    h = MOLECULE_FACTORIES["lih"]()
    out = ccsd_reference_dict(h.integrals, h.fci_energy())
    assert out["ccsd_converged"]
    assert abs(out["error_vs_ccsd_mha"]) < 0.1
    assert abs(out["error_vs_ccsd_t_mha"]) < 0.05
    assert out["ccsd_t_energy"] < out["ccsd_energy"]
