"""Multi-word (2xuint32) spin determinants: the 32..64-site frontier.

Round-3 verdict item 2: the single-word packing capped chains at 31 sites
(the reference's tuple encoding has no ceiling).  These tests pin the W=2
layout ([hi, lo] columns; low word = sites 0..31) against a slow
Python-int reference for every kernel (diagonal, connections, device
twins, uint64 keys), and drive the Selected-CI machinery end-to-end on a
33-site chain including the device PT2 scoring path (2-key lexicographic
sort, since a 2x32-bit key can never pack into one uint32).
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import (HeisenbergHamiltonian,
                                                 TransverseFieldIsing)
from flow_guided_krylov_tpu.hamiltonians.spin import (pack_spin_state,
                                                      spin_state_int)


def slow_heisenberg(ham, x: int):
    """Pure-Python diagonal + {target_int: element} for one config."""
    n = ham.n_sites
    s = [2 * ((x >> i) & 1) - 1 for i in range(n)]
    diag = sum(ham.Jz / 4.0 * s[i] * s[j] for i, j in ham.bonds)
    diag += sum(s[i] * ham.h_z[i] / 2.0 for i in range(n))
    conns = {}
    for i, j in ham.bonds:
        y = x ^ (1 << i) ^ (1 << j)
        el = (ham.Jx + ham.Jy) / 4.0 if s[i] != s[j] else 0.0
        conns[y] = conns.get(y, 0.0) + el
    for i in range(n):
        if abs(ham.h_x[i]) > 1e-12:
            y = x ^ (1 << i)
            conns[y] = conns.get(y, 0.0) + ham.h_x[i] / 2.0
    return diag, conns


def random_packed(rng, n, count):
    xs = [int(rng.integers(0, 1 << n)) for _ in range(count)]
    return xs, np.stack([pack_spin_state(x, n) for x in xs])


@pytest.mark.parametrize("n", [33, 34, 40])
def test_heisenberg_w2_kernels_vs_slow_reference(n):
    rng = np.random.default_rng(7 + n)
    hz = np.zeros(n)
    hz[0] = 0.1
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    assert ham.pack_words == 2
    xs, packed = random_packed(rng, n, 12)
    assert all(spin_state_int(packed[k]) == xs[k] for k in range(len(xs)))

    d = ham.diagonal_np(packed)
    conn, el = ham.connections_np(packed)
    assert conn.shape == (len(xs), ham.n_connections, 2)
    for k, x in enumerate(xs):
        dref, cref = slow_heisenberg(ham, x)
        assert d[k] == pytest.approx(dref, abs=1e-12)
        got = {}
        for c in range(conn.shape[1]):
            t = spin_state_int(conn[k, c])
            got[t] = got.get(t, 0.0) + el[k, c]
        for t, v in cref.items():
            assert got.get(t, 0.0) == pytest.approx(v, abs=1e-12)


def test_w2_device_kernels_match_host():
    import jax.numpy as jnp
    n = 35
    rng = np.random.default_rng(3)
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0,
                                h_x=np.full(n, 0.2))
    _, packed = random_packed(rng, n, 16)
    d = ham.diagonal_np(packed)
    conn, el = ham.connections_np(packed)
    dd = np.asarray(ham.diagonal_device(jnp.asarray(packed)))
    cd, ed = ham.connections_device(jnp.asarray(packed))
    assert np.max(np.abs(dd - d)) < 1e-5
    assert np.array_equal(np.asarray(cd), conn)
    assert np.max(np.abs(np.asarray(ed) - el)) < 1e-6


def test_w2_keys_monotone_and_dedup():
    n = 37
    rng = np.random.default_rng(11)
    ham = TransverseFieldIsing(n, V=1.0, h=0.5, periodic=True)
    assert ham.pack_words == 2
    xs, packed = random_packed(rng, n, 64)
    keys = ham.keys(packed)
    assert list(np.argsort(keys)) == \
        list(np.argsort(np.array(xs, dtype=object)))
    # unkey round-trips
    assert np.array_equal(ham.unkey(keys), packed)


def test_w2_projected_hamiltonian_hermitian_and_physical():
    """H projected on (Neel + its connections) for a 33-site chain:
    symmetric, correct diagonal, and its ground state lies below the
    seed energy (variational improvement)."""
    n = 33
    hz = np.zeros(n)
    hz[0] = 0.1
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    seed = pack_spin_state(sum(1 << i for i in range(0, n, 2)), n)[None, :]
    conn, el = ham.connections_np(seed)
    live = conn[0][np.abs(el[0]) > 1e-14]
    basis = np.concatenate([seed, live], axis=0)
    # dedup via keys
    keys = ham.keys(basis)
    _, first = np.unique(keys, return_index=True)
    basis = basis[np.sort(first)]
    H = ham.matrix_elements(basis, basis)
    assert np.max(np.abs(H - H.T)) < 1e-12
    assert np.allclose(np.diag(H), ham.diagonal_np(basis))
    e0 = np.linalg.eigvalsh(0.5 * (H + H.T))[0]
    assert e0 < ham.diagonal_np(seed)[0] - 1e-6


@pytest.mark.parametrize("force_device", [False, True])
def test_w2_selected_ci_expands_and_descends(force_device):
    """Stage-3 machinery end-to-end on a 33-site S_z-conserving chain —
    host scoring and the device PT2 path (2-key lex sort) must agree on
    physics: monotone energy descent from the Neel seed, conserved
    magnetization of every added determinant."""
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    n = 33
    hz = np.zeros(n)
    hz[0] = 0.1
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    seed_int = sum(1 << i for i in range(0, n, 2))
    seed = pack_spin_state(seed_int, n)[None, :]
    cfg = ResidualExpansionConfig(max_iterations=4,
                                  configs_per_iteration=40,
                                  max_basis_size=200)
    exp = SelectedCIExpander(ham, cfg,
                             use_device_scoring=force_device)
    basis = seed
    e_prev = float(ham.diagonal_np(seed)[0])
    energies = []
    for _ in range(3):
        out = exp.expand_basis(basis)
        basis, e = out["basis"], out["energy"]
        energies.append(e)
        assert e <= e_prev + 1e-9
        e_prev = e
    # magnetization conserved across the whole basis
    pops = np.array([bin(spin_state_int(row)).count("1") for row in basis])
    assert np.all(pops == bin(seed_int).count("1"))
    assert len(basis) > 1
    assert energies[-1] < energies[0] + 1e-12


def test_w2_exact_pt2_host_path():
    """pt2_correction on a W=2 chain routes to the exact host path
    (unpackable keys) and returns a negative, exact dE2."""
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    n = 33
    hz = np.zeros(n)
    hz[0] = 0.1
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    seed = pack_spin_state(sum(1 << i for i in range(0, n, 2)), n)[None, :]
    exp = SelectedCIExpander(ham, ResidualExpansionConfig(
        max_iterations=2, configs_per_iteration=30, max_basis_size=100))
    out = exp.expand_basis(seed)
    e, vec = exp._diagonalize(out["basis"])
    corr = exp.pt2_correction(out["basis"], vec, e)
    assert corr["exact"]
    assert corr["de2"] <= 1e-12
    assert corr["corrected_energy"] <= e + 1e-12


def test_w2_pt2_correction_multiword_matches_host():
    """The round-5 multiword DEVICE dE2 path (W-key lexicographic sort +
    host externality filter) reproduces the exact host correction on a
    33-site chain — the path the W=2 frontier runs now take."""
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    n = 33
    hz = np.zeros(n)
    hz[0] = 0.1
    ham = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    seed = pack_spin_state(sum(1 << i for i in range(0, n, 2)), n)[None, :]
    exp = SelectedCIExpander(ham, ResidualExpansionConfig(
        max_iterations=3, configs_per_iteration=60, max_basis_size=300))
    basis = seed
    for _ in range(3):
        basis = exp.expand_basis(basis)["basis"]
    e, vec = exp._diagonalize(basis)
    cap_saved = exp._pt2_row_cap
    exp._pt2_row_cap = 0                      # force the host-exact path
    ref = exp.pt2_correction(basis, vec, e)
    exp._pt2_row_cap = cap_saved
    dev = exp._pt2_correction_multiword(basis, vec, e,
                                        cap=1 << 20, pad_to=0)
    assert ref["exact"] and dev["exact"]
    assert dev["n_external"] == ref["n_external"]
    assert abs(dev["de2"] - ref["de2"]) < 5e-7


def test_single_word_layout_unchanged():
    """n <= 31 keeps the original (B, 1) packing and kernel outputs."""
    ham = HeisenbergHamiltonian(12, h_z=np.r_[0.1, np.zeros(11)])
    assert ham.pack_words == 1
    packed = (np.arange(40, dtype=np.uint32)[:, None] * 37 % 4096
              ).astype(np.uint32)
    conn, el = ham.connections_np(packed)
    assert conn.shape == (40, len(ham.bonds), 1)
    for k in range(0, 40, 7):
        dref, cref = slow_heisenberg(ham, int(packed[k, 0]))
        assert ham.diagonal_np(packed[k:k + 1])[0] == \
            pytest.approx(dref, abs=1e-12)


def test_spin_cap_raises():
    with pytest.raises(NotImplementedError):
        HeisenbergHamiltonian(65)
    with pytest.raises(NotImplementedError):
        TransverseFieldIsing(70)
