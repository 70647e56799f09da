"""n_orb = 32: the true single-word ceiling of the packed-uint32 layout.

Round-3 verdict item 2 asked for a >= 32-orbital molecular active space.
One uint32 word per spin channel holds exactly 32 orbitals (shifts only
ever use orbital indices <= 31, and the uint64 key (alpha << 32) | beta
still fits), so 32 rides the existing kernels.  These tests pin that:

* embedding test — a 10-orbital N2-sized system zero-padded to 32
  orbitals must reproduce the 10-orbital kernel's matrix elements
  EXACTLY on the shared determinants (the extra virtuals only add
  zero-element connections);
* host/device kernel parity at n_orb = 32;
* projected-H Hermiticity + variational descent of the SCI machinery.
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


def test_embedding_32_matches_10_orbital_kernel():
    small = MolecularHamiltonian(_random_ints(10, 3, 3))
    big = MolecularHamiltonian(_embed(small.integrals, 32))
    assert big.n_orbitals == 32

    rng = np.random.default_rng(1)
    basis = small.enumerate_basis()
    sel = basis[rng.choice(len(basis), size=48, replace=False)]
    # same packed determinants are valid in both systems (low orbitals)
    H_small = small.matrix_elements(sel, sel)
    H_big = big.matrix_elements(sel, sel)
    assert np.max(np.abs(H_small - H_big)) < 1e-12
    assert np.max(np.abs(big.diagonal_np(sel) - small.diagonal_np(sel))) \
        < 1e-12


def test_32_orbital_host_device_parity():
    import jax.numpy as jnp
    h = MolecularHamiltonian(_random_ints(32, 2, 2, seed=3))
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


def test_32_orbital_projected_h_and_sci():
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)
    h = MolecularHamiltonian(_random_ints(32, 2, 2, seed=5))
    hf = h.get_hf_state()[None, :]
    e_hf = float(h.diagonal_np(hf)[0])
    cfg = ResidualExpansionConfig(max_iterations=3,
                                  configs_per_iteration=30,
                                  max_basis_size=120)
    exp = SelectedCIExpander(h, cfg)
    basis, e_prev = hf, e_hf
    for _ in range(3):
        out = exp.expand_basis(basis)
        basis, e = out["basis"], out["energy"]
        assert e <= e_prev + 1e-9
        e_prev = e
    assert len(basis) > 1
    assert e_prev < e_hf - 1e-6
    H = h.matrix_elements(basis, basis)
    assert np.max(np.abs(H - H.T)) < 1e-12
    # electron counts conserved (alpha and beta popcounts)
    pa = np.array([bin(int(r[0])).count("1") for r in basis])
    pb = np.array([bin(int(r[1])).count("1") for r in basis])
    assert np.all(pa == h.integrals.n_alpha)
    assert np.all(pb == h.integrals.n_beta)


def test_33_orbitals_routes_to_two_word_channels():
    # round 5: 33..64 orbitals use two words per spin channel
    # (tests/test_molecular_w2.py); 65 is the new hard ceiling
    h = MolecularHamiltonian(_random_ints(33, 2, 2))
    assert h.pack_words == 4
    with pytest.raises(NotImplementedError):
        MolecularHamiltonian(_random_ints(65, 2, 2))
