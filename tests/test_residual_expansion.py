"""Stage-3 Selected-CI expansion: device scoring, incremental H, caching."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
from flow_guided_krylov_tpu.krylov.residual_expansion import (
    ResidualExpansionConfig, SelectedCIExpander,
    iterative_residual_expansion)


@pytest.fixture(scope="module")
def lih():
    return create_lih_hamiltonian()


def _seed_basis(h, n=40):
    basis = h.enumerate_basis()
    diag = h.diagonal_np(basis)
    return basis[np.argsort(diag)[:n]]


def test_device_scoring_matches_host(lih):
    """Device PT2 candidate scoring == vectorized host scoring."""
    h = lih
    basis = _seed_basis(h)
    vals, vecs = h.exact_ground_state(basis, k=1)
    e0, coeffs = float(vals[0]), vecs[:, 0]

    host = SelectedCIExpander(h, use_device_scoring=False)
    dev = SelectedCIExpander(h, use_device_scoring=True)
    cand_h, scores_h = host._pt2_candidates(basis, coeffs, e0)
    cand_d, scores_d = dev._pt2_candidates(basis, coeffs, e0)

    kh = h.keys(cand_h)
    kd = h.keys(cand_d)
    # device path returns the top-K by coupling^2; every host candidate
    # with a non-negligible score must appear with a matching score
    oh = np.argsort(kh)
    od = np.argsort(kd)
    sig_h = scores_h[oh] > 1e-10
    m_h = dict(zip(kh[oh][sig_h].tolist(), scores_h[oh][sig_h].tolist()))
    m_d = dict(zip(kd[od].tolist(), scores_d[od].tolist()))
    assert set(m_h).issubset(set(m_d))
    for k, s in m_h.items():
        assert m_d[k] == pytest.approx(s, rel=5e-3, abs=1e-9)


def test_blocked_device_scoring_matches_unblocked(lih):
    """HBM-bounded source blocking (pt2_score_rows cap) returns the same
    candidates and scores as a single unblocked call: per-block partial
    couplings of a key must merge exactly in the host's grouped sum."""
    h = lih
    basis = _seed_basis(h, 100)
    vals, vecs = h.exact_ground_state(basis, k=1)
    e0, coeffs = float(vals[0]), vecs[:, 0]

    one = SelectedCIExpander(h, use_device_scoring=True)
    one._pt2_row_cap = 1 << 30            # force a single block
    blk = SelectedCIExpander(h, use_device_scoring=True)
    blk._pt2_row_cap = 32                 # force >= 4 blocks

    cand_1, scores_1 = one._pt2_candidates(basis, coeffs, e0)
    cand_b, scores_b = blk._pt2_candidates(basis, coeffs, e0)

    m1 = dict(zip(h.keys(cand_1).tolist(), scores_1.tolist()))
    mb = dict(zip(h.keys(cand_b).tolist(), scores_b.tolist()))
    sig = {k for k, s in m1.items() if s > 1e-10}
    assert sig.issubset(set(mb))
    for k in sig:
        assert mb[k] == pytest.approx(m1[k], rel=5e-3, abs=1e-9)


def test_pt2_correction_tightens_toward_fci(lih):
    """Exact Epstein-Nesbet dE2 over all externals: negative, recovers
    most of the remaining error of a partially converged SCI state, and
    the device kernel matches the host-f64 fallback."""
    h = lih
    cfg = ResidualExpansionConfig(max_iterations=2,
                                  configs_per_iteration=8,
                                  max_basis_size=20)
    out = iterative_residual_expansion(h, h.get_hf_state()[None, :], cfg)
    basis = out["basis"]
    vals, vecs = h.exact_ground_state(basis, k=1)
    e_var, coeffs = float(vals[0]), vecs[:, 0]
    e_fci = h.fci_energy()
    assert e_var > e_fci + 1e-5          # partially converged on purpose

    dev = SelectedCIExpander(h)
    corr = dev.pt2_correction(basis, coeffs, e_var)
    assert corr["exact"]
    assert corr["de2"] < 0
    assert abs(corr["corrected_energy"] - e_fci) < 0.5 * (e_var - e_fci)

    host = SelectedCIExpander(h)
    host._pt2_row_cap = 0                # force the host-f64 path
    corr_h = host.pt2_correction(basis, coeffs, e_var)
    assert corr_h["exact"]
    # counts differ only by numerically-cancelled couplings (f64 noise
    # rows the f32 device sum resolves to exact zeros)
    assert abs(corr_h["n_external"] - corr["n_external"]) \
        <= 0.25 * corr_h["n_external"]
    assert corr_h["de2"] == pytest.approx(corr["de2"], rel=1e-3)


def test_pt2_correction_blocked_matches_host(lih):
    """Source-blocked correction (basis above half the scoring row
    budget) merges per-block partial couplings exactly: de2 matches the
    host-f64 single-pass sum on a basis large enough for 4 blocks."""
    h = lih
    basis = h.enumerate_basis()           # 225 configs -> 4 blocks at 64
    vals, vecs = h.exact_ground_state(basis, k=1)
    # correct a deliberately-shifted energy so de2 is well-conditioned
    # (at the FCI point every external coupling vanishes)
    sub = basis[: len(basis) // 2]
    vals_s, vecs_s = h.exact_ground_state(sub, k=1)
    e_var, coeffs = float(vals_s[0]), vecs_s[:, 0]

    blk = SelectedCIExpander(h)
    blk._pt2_row_cap = 128                # S_blk = 64 -> 2 blocks
    corr_b = blk.pt2_correction(sub, coeffs, e_var)
    assert corr_b["exact"]

    host = SelectedCIExpander(h)
    host._pt2_row_cap = 0                 # force the host-f64 path
    corr_h = host.pt2_correction(sub, coeffs, e_var)
    assert corr_h["exact"]
    assert corr_b["de2"] == pytest.approx(corr_h["de2"], rel=1e-3)
    assert corr_b["corrected_energy"] <= e_var + 1e-12


def _dense_of(H, n):
    """Materialize a CSR or LinearOperator projected H."""
    if hasattr(H, "toarray"):
        return H.toarray()
    return H @ np.eye(n)


def test_incremental_projected_h_matches_full(lih):
    """Blockwise-grown projected H (prefix CSR + pending staircase blocks,
    exposed as a matvec operator) == a fresh to_sparse build."""
    h = lih
    full = h.enumerate_basis()
    b1, b2, b3 = full[:120], full[:180], full[:225]

    exp = SelectedCIExpander(h)
    H1 = exp._projected_sparse(b1, h.keys(b1))
    H2 = exp._projected_sparse(b2, h.keys(b2))   # prefix extension
    d2 = _dense_of(H2, len(b2))                  # materialize BEFORE the
    H3 = exp._projected_sparse(b3, h.keys(b3))   # next growth step

    for basis, H in ((b2, d2), (b3, _dense_of(H3, len(b3)))):
        ref = h.to_sparse(basis)
        ref = ((ref + ref.T) * 0.5).toarray()
        np.testing.assert_allclose(H, ref, atol=1e-12)

    # consolidation folds the pending blocks without changing the action
    exp._consolidate()
    ref = h.to_sparse(b3)
    np.testing.assert_allclose(exp._inc_H.toarray(),
                               ((ref + ref.T) * 0.5).toarray(), atol=1e-12)

    # restriction (variational rejection revert)
    H1b = exp._projected_sparse(b1, h.keys(b1))
    ref = h.to_sparse(b1)
    np.testing.assert_allclose(H1b.toarray(),
                               ((ref + ref.T) * 0.5).toarray(), atol=1e-12)


def test_diagonalize_fingerprint_cache(lih):
    h = lih
    basis = _seed_basis(h)
    exp = SelectedCIExpander(h)
    e0, c0 = exp._diagonalize(basis)
    calls = {"n": 0}
    orig = h.exact_ground_state

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    h.exact_ground_state = counting
    try:
        e1, c1 = exp._diagonalize(basis)
    finally:
        h.exact_ground_state = orig
    assert calls["n"] == 0
    assert e1 == e0
    np.testing.assert_array_equal(c0, c1)


def test_iterative_expansion_reaches_fci(lih):
    h = lih
    exact = h.fci_energy()
    out = iterative_residual_expansion(
        h, _seed_basis(h, 20),
        ResidualExpansionConfig(configs_per_iteration=40,
                                max_iterations=8, max_basis_size=225),
        use_pt2=True)
    assert out["energy"] <= out["energies"][0] + 1e-12
    assert out["energy"] - exact < 2e-3


def test_sharded_pt2_scoring_matches_single_device(lih):
    """Mesh-sharded PT2 candidate scoring (shard_map over source rows,
    host summing merge) == the single-device device path, exactly in
    candidate set and to f32 tolerance in scores."""
    import jax
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = lih
    basis = _seed_basis(h, 60)
    vals, vecs = h.exact_ground_state(basis, k=1)
    e0, coeffs = float(vals[0]), vecs[:, 0]

    single = SelectedCIExpander(h, use_device_scoring=True)
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    sharded = SelectedCIExpander(h, use_device_scoring=True, mesh=mesh)

    cand_s, scores_s = single._pt2_candidates(basis, coeffs, e0)
    cand_m, scores_m = sharded._pt2_candidates(basis, coeffs, e0)

    ks, km = h.keys(cand_s), h.keys(cand_m)
    m_s = dict(zip(ks.tolist(), scores_s.tolist()))
    m_m = dict(zip(km.tolist(), scores_m.tolist()))
    sig = {k for k, s in m_s.items() if s > 1e-10}
    assert sig.issubset(set(m_m))
    for k in sig:
        assert m_m[k] == pytest.approx(m_s[k], rel=5e-3, abs=1e-9)


def test_sharded_pt2_correction_matches_host(lih):
    """Mesh-sharded exact dE2 (per-shard accumulate + top-cap, host
    grouped-sum merge) == the host-f64 single-pass sum."""
    import jax
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = lih
    basis = h.enumerate_basis()
    sub = basis[: len(basis) // 2]
    vals, vecs = h.exact_ground_state(sub, k=1)
    e_var, coeffs = float(vals[0]), vecs[:, 0]

    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    sharded = SelectedCIExpander(h, mesh=mesh)
    corr_m = sharded.pt2_correction(sub, coeffs, e_var)
    assert corr_m["exact"]

    host = SelectedCIExpander(h)
    host._pt2_row_cap = 0                 # force the host-f64 path
    corr_h = host.pt2_correction(sub, coeffs, e_var)
    assert corr_m["de2"] == pytest.approx(corr_h["de2"], rel=1e-3)


def test_sharded_pt2_expansion_reaches_fci(lih):
    """End-to-end sharded iterative expansion lands on FCI like the
    single-device run (N2-class workload scaled to LiH for CI)."""
    import jax
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = lih
    exact = h.fci_energy()
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    out = iterative_residual_expansion(
        h, _seed_basis(h, 20),
        ResidualExpansionConfig(configs_per_iteration=40,
                                max_iterations=8, max_basis_size=225),
        use_pt2=True, mesh=mesh)
    assert out["energy"] - exact < 2e-3


def test_growth_factor_fewer_iterations_same_energy(lih):
    """SHCI-style proportional adds reach the same energy in fewer
    eigensolves than the fixed schedule (growth_factor=0 keeps the
    reference behavior exactly)."""
    h = lih
    exact = h.fci_energy()
    seed = h.get_hf_state()[None, :]

    def run(gf):
        cfg = ResidualExpansionConfig(
            max_iterations=40, configs_per_iteration=10, growth_factor=gf,
            stagnation_threshold=1e-9, stagnation_patience=3,
            max_basis_size=225)
        return iterative_residual_expansion(h, seed, cfg)

    fixed, grown = run(0.0), run(0.5)
    assert grown["energy"] - exact < 1e-4
    assert grown["energy"] == pytest.approx(fixed["energy"], abs=1e-4)
    assert grown["n_iterations"] < fixed["n_iterations"]


def test_source_screen_preserves_convergence(lih):
    """SHCI source screening (skip rows whose |c_j|*Hmax is below the
    selection-coupling cutoff) reaches the same converged energy as the
    unscreened run and actually screens rows along the way."""
    h = lih
    exact = h.fci_energy()
    seed = h.get_hf_state()[None, :]

    def run(screen):
        cfg = ResidualExpansionConfig(
            max_iterations=40, configs_per_iteration=20,
            residual_threshold=1e-5, source_screen=screen,
            stagnation_threshold=1e-9, stagnation_patience=3,
            max_basis_size=225)
        return iterative_residual_expansion(h, seed, cfg)

    plain, screened = run(0.0), run(1.0)
    assert screened["energy"] - exact < 1e-4
    assert screened["energy"] == pytest.approx(plain["energy"], abs=1e-4)


def test_source_screen_filters_rows(lih):
    """An aggressive screen measurably shrinks the scored source batch
    (the knob's whole point): with most coefficients negligible, the
    screened candidate pool comes from the few big rows only."""
    h = lih
    basis = _seed_basis(h, 120)

    def expander(screen):
        return SelectedCIExpander(
            h, ResidualExpansionConfig(residual_threshold=1e-5,
                                       coefficient_threshold=1e-14,
                                       source_screen=screen),
            use_device_scoring=False)

    e0, coeffs = expander(0.0)._diagonalize(basis)
    # make most coefficients negligible so the screen has rows to drop
    coeffs = coeffs.copy()
    coeffs[np.abs(coeffs) < np.sort(np.abs(coeffs))[-8]] *= 1e-6

    screened = expander(1.0)
    cand_s, _ = screened._pt2_candidates(basis, coeffs, e0)
    cand_p, _ = expander(0.0)._pt2_candidates(basis, coeffs, e0)
    assert screened._hmax is not None and screened._hmax > 0
    assert 0 < len(cand_s) < len(cand_p)


def test_davidson_warm_solve_matches_eigsh(lih):
    """The use_davidson warm path reproduces eigsh energies (B > 2048)."""
    import scipy.sparse.linalg as spla

    h = lih
    basis = h.enumerate_basis()
    diag = h.diagonal_np(basis)
    order = np.argsort(diag)
    prev_b = basis[order[:2100]]
    cur_b = basis[order[:2400]]

    exp = SelectedCIExpander(
        h, ResidualExpansionConfig(use_davidson=True))
    e_prev, _ = exp._diagonalize(prev_b)      # seeds _last_coeffs
    e_dav, vec = exp._diagonalize(cur_b)      # warm Davidson branch

    M = h.to_sparse(cur_b)
    M = (M + M.T) * 0.5
    e_ref = float(spla.eigsh(M, k=1, which="SA")[0][0])
    assert abs(e_dav - e_ref) < 1e-8
    assert e_dav <= e_prev + 1e-12            # variational with more states

    exp2 = SelectedCIExpander(
        h, ResidualExpansionConfig(use_davidson=False))
    exp2._diagonalize(prev_b)
    e_eigsh, _ = exp2._diagonalize(cur_b)
    assert abs(e_dav - e_eigsh) < 1e-8


def test_davidson_solver_reports_convergence():
    from flow_guided_krylov_tpu.postprocessing.eigensolver import \
        DavidsonSolver

    rng = np.random.default_rng(3)
    n = 300
    d = np.sort(rng.uniform(1.0, 50.0, n))
    A = np.diag(d) + 1e-2 * rng.normal(size=(n, n))
    A = 0.5 * (A + A.T)
    solver = DavidsonSolver(tol=1e-9)
    vals, vecs = solver.solve(lambda v: A @ v, np.diag(A))
    ref = np.linalg.eigh(A)[0][0]
    assert solver.converged
    assert solver.n_matvecs >= 2
    assert solver.final_residual < 1e-9
    assert abs(vals[0] - ref) < 1e-8


def test_davidson_with_streaming_operator_regression():
    """Davidson warm solves must work when the projected H is a streaming
    LinearOperator (pending staircase blocks, B > 2048) — regression for
    the r4 crash: LinearOperator has no .diagonal()."""
    from flow_guided_krylov_tpu.hamiltonians import create_n2_hamiltonian

    h = create_n2_hamiltonian()
    basis = h.enumerate_basis()
    diag = h.diagonal_np(basis)
    seed = basis[np.argsort(diag)[:2000]]

    cfg = ResidualExpansionConfig(configs_per_iteration=150,
                                  max_iterations=3,
                                  max_basis_size=2450,
                                  use_davidson=True)
    out = iterative_residual_expansion(h, seed, cfg)
    energies = out["energies"]
    assert len(energies) >= 2
    # monotone variational descent across iterations
    assert all(b <= a + 1e-9 for a, b in zip(energies, energies[1:]))
    # cross-check the final energy against a cold eigsh on the same basis
    import scipy.sparse.linalg as spla
    M = h.to_sparse(out["basis"])
    M = (M + M.T) * 0.5
    e_ref = float(spla.eigsh(M, k=1, which="SA")[0][0])
    assert abs(out["energy"] - e_ref) < 1e-7


def test_pt2_checkpoints_and_extrapolation(lih):
    """Mid-trajectory exact-dE2 checkpoints record a shrinking |dE2| and
    the SHCI linear extrapolation lands at/below the variational floor,
    within a few mHa of FCI on LiH."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "examples"))
    from large_system_benchmark import extrapolate_de2

    h = lih
    exact = h.fci_energy()
    cfg = ResidualExpansionConfig(
        max_iterations=30, configs_per_iteration=20,
        stagnation_threshold=1e-9, stagnation_patience=3,
        max_basis_size=160)
    # LiH converges at basis ~63, so checkpoints must sit inside the
    # 20-configs/iter growth ramp
    out = iterative_residual_expansion(
        h, h.get_hf_state()[None, :], cfg, pt2_correct=True,
        pt2_checkpoints=[20, 40, 60])
    rows = out["pt2_checkpoints"]
    assert len(rows) == 3
    sizes = [r["basis_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert all(r["exact"] for r in rows)
    mags = [abs(r["de2"]) for r in rows]
    assert mags[-1] < mags[0], "dE2 magnitude should shrink with depth"
    assert all(r["de2"] <= 1e-12 for r in rows), "EN dE2 is negative"

    fit = extrapolate_de2(rows, e_var_final=out["energy"],
                          de2_final=out["pt2_de2"],
                          final_exact=out["pt2_exact"])
    e0 = fit["extrapolated_energy"]
    sigma = fit["extrapolation_uncertainty_mha"]
    assert fit["extrapolation_n_points"] >= 3
    # the extrapolation must land between the corrected energy's
    # neighborhood and FCI: below the variational energy, within a few
    # mHa of the exact answer on this small, well-behaved space
    assert e0 < out["energy"]
    assert abs(e0 - exact) < 3e-3
    assert sigma >= 0.0


def test_pt2_sort_rows_generous_cap_matches_uncapped(lih):
    """A pre-sort row cap larger than the row count is a no-op: identical
    candidates and scores to the uncapped scorer."""
    h = lih
    basis = _seed_basis(h, 60)
    vals, vecs = h.exact_ground_state(basis, k=1)
    e0, coeffs = float(vals[0]), vecs[:, 0]

    base = SelectedCIExpander(h, use_device_scoring=True)
    capped = SelectedCIExpander(
        h, ResidualExpansionConfig(pt2_sort_rows=1 << 24,
                                   max_basis_size=4096),
        use_device_scoring=True)
    cand_0, scores_0 = base._pt2_candidates(basis, coeffs, e0)
    cand_c, scores_c = capped._pt2_candidates(basis, coeffs, e0)

    m0 = dict(zip(h.keys(cand_0).tolist(), scores_0.tolist()))
    mc = dict(zip(h.keys(cand_c).tolist(), scores_c.tolist()))
    sig = {k for k, s in m0.items() if s > 1e-10}
    assert sig.issubset(set(mc))
    for k in sig:
        assert mc[k] == pytest.approx(m0[k], rel=5e-3, abs=1e-9)


def test_pt2_sort_rows_tight_cap_preserves_convergence(lih):
    """With a TIGHT per-block row cap (SHCI per-row screen) the expansion
    still reaches FCI-level accuracy: dropped rows are the tiny-|c*H|
    tail, which only perturbs selection order."""
    h = lih
    exact = h.fci_energy()
    cfg = ResidualExpansionConfig(
        max_iterations=40, configs_per_iteration=60,
        stagnation_threshold=1e-9, stagnation_patience=3,
        max_basis_size=640, pt2_sort_rows=4096)
    ex = SelectedCIExpander(h, cfg, use_device_scoring=True)
    basis = h.get_hf_state()[None, :]
    for _ in range(cfg.max_iterations):
        out = ex.expand_basis(basis)
        basis = out["basis"]
        if not out["accepted"]:
            break
    assert out["energy"] >= exact - 1e-9      # variational
    assert out["energy"] - exact < 2e-3       # near-FCI on LiH
