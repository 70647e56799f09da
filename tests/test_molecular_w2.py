"""Molecular determinants beyond 32 orbitals: two words per spin channel.

Round-5 frontier machinery (VERDICT item 8): rows are (B, 4) uint32
``[a_hi, a_lo, b_hi, b_lo]``, host dedup keys are structured 128-bit
records, the device kernels run the two-word bit primitives, and the
PT2 scoring/correction paths sort lexicographically on all four words.

Oracles:

* python-int bit primitives (exact popcount/flip semantics to 64 bits);
* an EMBEDDING invariant — a small system zero-padded into a >32-orbital
  space must reproduce the small system's matrix elements exactly on the
  shared determinants (extra virtuals only add zero-element connections);
* the small system's FCI energy, which the W=4 SCI machinery must reach.
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.chem.scf import MolecularIntegrals
from flow_guided_krylov_tpu.hamiltonians.molecular import MolecularHamiltonian


def _random_ints(n, n_alpha, n_beta, seed=0):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(n, n))
    h1 = 0.5 * (h1 + h1.T)
    h2 = rng.normal(size=(n,) * 4) * 0.1
    h2 = h2 + h2.transpose(1, 0, 2, 3)
    h2 = h2 + h2.transpose(0, 1, 3, 2)
    h2 = h2 + h2.transpose(2, 3, 0, 1)
    return MolecularIntegrals(
        h1e=h1, h2e=h2 / 8, nuclear_repulsion=0.5,
        n_electrons=n_alpha + n_beta, n_orbitals=n,
        n_alpha=n_alpha, n_beta=n_beta)


def _embed(ints, n_big):
    n = ints.n_orbitals
    h1 = np.zeros((n_big, n_big))
    h1[:n, :n] = ints.h1e
    h2 = np.zeros((n_big,) * 4)
    h2[:n, :n, :n, :n] = ints.h2e
    return MolecularIntegrals(
        h1e=h1, h2e=h2, nuclear_repulsion=ints.nuclear_repulsion,
        n_electrons=ints.n_electrons, n_orbitals=n_big,
        n_alpha=ints.n_alpha, n_beta=ints.n_beta)


def _widen(packed2, n_small):
    """(B, 2) single-word rows -> (B, 4) two-word rows (hi words zero)."""
    z = np.zeros(len(packed2), np.uint32)
    return np.stack([z, packed2[:, 0], z, packed2[:, 1]], -1)


# ---------------------------------------------------------------------------
# Bit primitives vs python-int oracle
# ---------------------------------------------------------------------------

def test_two_word_primitives_vs_python_ints():
    import jax.numpy as jnp
    from flow_guided_krylov_tpu.ops.bits import (
        occupancy2, occupancy2_np, parity_between2, parity_between2_np,
        flip_orbital2, flip_orbital2_np)
    rng = np.random.default_rng(0)
    n = 61
    B = 64
    vals = rng.integers(0, 1 << n, B).astype(object)
    bits2 = np.stack([
        np.array([int(v) >> 32 for v in vals], np.uint32),
        np.array([int(v) & 0xFFFFFFFF for v in vals], np.uint32)], -1)
    p = rng.integers(0, n, B).astype(np.int32)
    q = rng.integers(0, n, B).astype(np.int32)

    # occupancy
    occ_np = occupancy2_np(bits2, n)
    occ_dev = np.asarray(occupancy2(jnp.asarray(bits2), n))
    for i in range(B):
        ref = [(int(vals[i]) >> j) & 1 for j in range(n)]
        assert list(occ_np[i]) == ref
        assert list(occ_dev[i]) == ref

    # parity between (strictly between min and max)
    par_np = parity_between2_np(bits2, p, q)
    par_dev = np.asarray(parity_between2(jnp.asarray(bits2),
                                         jnp.asarray(p), jnp.asarray(q)))
    for i in range(B):
        lo, hi = sorted((int(p[i]), int(q[i])))
        cnt = sum((int(vals[i]) >> j) & 1 for j in range(lo + 1, hi))
        assert par_np[i] == (1 - 2 * (cnt & 1))
        assert par_dev[i] == (1 - 2 * (cnt & 1))

    # flip
    fl_np = flip_orbital2_np(bits2, p)
    fl_dev = np.asarray(flip_orbital2(jnp.asarray(bits2), jnp.asarray(p)))
    for i in range(B):
        ref = int(vals[i]) ^ (1 << int(p[i]))
        got_np = (int(fl_np[i, 0]) << 32) | int(fl_np[i, 1])
        got_dev = (int(fl_dev[i, 0]) << 32) | int(fl_dev[i, 1])
        assert got_np == ref and got_dev == ref


def test_key128_roundtrip_and_ordering():
    h = MolecularHamiltonian(_random_ints(34, 2, 2))
    assert h.pack_words == 4
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 1 << 32, size=(256, 4)).astype(np.uint32)
    rows[:, 0] &= 0x3                       # keep hi words in range
    rows[:, 2] &= 0x3
    keys = h.keys(rows)
    back = h.unkey(keys)
    assert np.array_equal(back, rows)
    # structured order == numeric (alpha, beta) order
    order = np.argsort(keys, kind="stable")
    nums = [((int(r[0]) << 32 | int(r[1])), (int(r[2]) << 32 | int(r[3])))
            for r in rows]
    assert [nums[i] for i in order] == sorted(nums)


# ---------------------------------------------------------------------------
# Embedding invariants
# ---------------------------------------------------------------------------

def test_embedding_34_matches_6_orbital_kernel():
    small = MolecularHamiltonian(_random_ints(6, 2, 2))
    big = MolecularHamiltonian(_embed(small.integrals, 34))
    assert big.pack_words == 4

    rng = np.random.default_rng(1)
    basis = small.enumerate_basis()
    sel = basis[rng.choice(len(basis), size=48, replace=False)]
    wide = _widen(sel, 6)
    H_small = small.matrix_elements(sel, sel)
    H_big = big.matrix_elements(wide, wide)
    assert np.max(np.abs(H_small - H_big)) < 1e-12
    assert np.max(np.abs(big.diagonal_np(wide) - small.diagonal_np(sel))) \
        < 1e-12


def test_w2_host_device_parity():
    import jax.numpy as jnp
    h = MolecularHamiltonian(_random_ints(35, 2, 2, seed=3))
    hf = h.get_hf_state()[None, :]
    conn, el = h.connections_np(hf)
    live = conn[0][np.abs(el[0]) > 1e-10][:40]
    batch = np.concatenate([hf, live], axis=0).astype(np.uint32)

    c_np, e_np = h.connections_np(batch)
    c_dev, e_dev = h.connections_device(jnp.asarray(batch))
    assert np.array_equal(np.asarray(c_dev), c_np)
    assert np.max(np.abs(np.asarray(e_dev) - e_np)) < 2e-5
    d_np = h.diagonal_np(batch)
    d_dev = np.asarray(h.diagonal_device(jnp.asarray(batch)))
    assert np.max(np.abs(d_dev - d_np) / (1.0 + np.abs(d_np))) < 1e-5


def test_w2_hf_state_spans_words():
    # 36 alpha-electron aufbau would overflow one word; use 34 orbitals
    # with n_alpha = 33 so the hi word carries a bit
    h = MolecularHamiltonian(_random_ints(34, 33, 2, seed=4))
    hf = h.get_hf_state()
    a = (int(hf[0]) << 32) | int(hf[1])
    b = (int(hf[2]) << 32) | int(hf[3])
    assert a == (1 << 33) - 1
    assert b == 3


# ---------------------------------------------------------------------------
# SCI machinery end to end at W = 4
# ---------------------------------------------------------------------------

def test_w2_sci_reaches_embedded_fci():
    """HF-seeded SCI on a 6-orbital system embedded in 34 orbitals must
    converge to the SMALL system's FCI energy: every excitation into the
    28 zero-coupling virtuals scores zero and is never selected."""
    from flow_guided_krylov_tpu.krylov import ResidualExpansionConfig
    from flow_guided_krylov_tpu.krylov.residual_expansion import \
        iterative_residual_expansion
    small = MolecularHamiltonian(_random_ints(6, 2, 2, seed=7))
    e_fci = small.fci_energy()
    big = MolecularHamiltonian(_embed(small.integrals, 34))
    cfg = ResidualExpansionConfig(
        max_iterations=30, configs_per_iteration=40,
        stagnation_threshold=1e-10, stagnation_patience=3,
        max_basis_size=240)
    out = iterative_residual_expansion(
        big, big.get_hf_state()[None, :], cfg, pt2_correct=True)
    assert out["energy"] >= e_fci - 1e-9          # variational
    assert abs(out["energy"] - e_fci) < 2e-4
    # the exact dE2 of a near-FCI state is tiny and non-positive
    assert out["pt2_de2"] <= 1e-12
    assert abs(out["pt2_de2"]) < 1e-3
    # all basis rows particle-conserving across both words
    basis = out["basis"]
    pa = np.array([bin((int(r[0]) << 32) | int(r[1])).count("1")
                   for r in basis])
    pb = np.array([bin((int(r[2]) << 32) | int(r[3])).count("1")
                   for r in basis])
    assert np.all(pa == 2) and np.all(pb == 2)


def test_w2_device_scoring_matches_host_scoring():
    """Forced device PT2 scoring (4-key lexicographic sort path) selects
    the same external couplings as the host path."""
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    h = MolecularHamiltonian(_random_ints(34, 2, 2, seed=9))
    cfg = ResidualExpansionConfig(max_iterations=1,
                                  configs_per_iteration=25,
                                  max_basis_size=120)
    hf = h.get_hf_state()[None, :]
    exp_host = SelectedCIExpander(h, cfg, use_device_scoring=False)
    exp_dev = SelectedCIExpander(h, cfg, use_device_scoring=True)
    e, coeffs = exp_host._diagonalize(hf)
    cand_h, sc_h = exp_host._pt2_candidates(hf, coeffs, e)
    cand_d, sc_d = exp_dev._pt2_candidates(hf, coeffs, e)
    kh = h.keys(cand_h)
    kd = h.keys(cand_d)
    # the device path returns its top-K by coupling^2 (K = cap + margin);
    # every device candidate must be a host candidate with the same score
    assert len(cand_d) > 0
    skh = np.sort(kh)
    pos = np.clip(np.searchsorted(skh, kd), 0, len(skh) - 1)
    assert np.all(skh[pos] == kd)
    host_score = {k.tobytes(): s for k, s in zip(kh, sc_h)}
    for k, s in zip(kd, sc_d):
        np.testing.assert_allclose(s, host_score[k.tobytes()],
                                   rtol=1e-3, atol=1e-9)
    # the invariant that matters: both paths' expansions land on the
    # same variational energy (device ranks by coupling^2 with a 16x
    # K margin, so the top-n_add selection agrees)
    out_h = exp_host.expand_basis(hf)
    out_d = exp_dev.expand_basis(hf)
    assert out_h["accepted"] and out_d["accepted"]
    assert abs(out_h["energy"] - out_d["energy"]) < 1e-6


def test_w2_pt2_correction_multiword_matches_host():
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    small = MolecularHamiltonian(_random_ints(6, 2, 2, seed=11))
    big = MolecularHamiltonian(_embed(small.integrals, 34))
    cfg = ResidualExpansionConfig(max_iterations=3,
                                  configs_per_iteration=30,
                                  max_basis_size=100)
    exp = SelectedCIExpander(big, cfg)
    basis = big.get_hf_state()[None, :]
    for _ in range(2):
        basis = exp.expand_basis(basis)["basis"]
    e, coeffs = exp._diagonalize(basis)
    # host-exact reference: temporarily hide the device kernel gate
    cap_saved = exp._pt2_row_cap
    exp._pt2_row_cap = 0
    ref = exp.pt2_correction(basis, coeffs, e)
    exp._pt2_row_cap = cap_saved
    # force the multiword device path regardless of problem size
    dev = exp._pt2_correction_multiword(basis, coeffs, e,
                                        cap=1 << 20, pad_to=0)
    assert ref["exact"] and dev["exact"]
    assert dev["n_external"] == ref["n_external"]
    assert abs(dev["de2"] - ref["de2"]) < 5e-7
