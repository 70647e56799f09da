"""Native connection-hits kernel (``native/conn_hits.cpp``) vs the NumPy
mirror.

The C++ engine fuses excitation enumeration + sorted-key membership +
Slater-Condon values for the incremental projected-H build; the NumPy
path (``connections_batch_np`` + keys + searchsorted) is the reference
implementation it must match triplet-for-triplet, at both channel widths
(W = 2 single-word, W = 4 two-word determinant rows).
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians.molecular import MolecularHamiltonian
from flow_guided_krylov_tpu.ops.native_conn import (conn_hits_native,
                                                    native_available)
from tests.test_molecular_w2 import _random_ints

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine unavailable")


def _numpy_triplets(h, new, basis):
    keys = h.keys(basis)
    order = np.argsort(keys)
    sorted_keys = keys[order]
    conn, elems = h.connections_np(new)
    ck = h.keys(conn.reshape(-1, conn.shape[-1]))
    pos = np.clip(np.searchsorted(sorted_keys, ck), 0, len(basis) - 1)
    hit = sorted_keys[pos] == ck
    rows = np.repeat(np.arange(len(new)), conn.shape[1])[hit]
    spos = pos[hit]
    vals = elems.reshape(-1)[hit]
    return rows, spos, vals, sorted_keys


def _check(h, basis, new):
    rows_np, pos_np, vals_np, sorted_keys = _numpy_triplets(h, new, basis)
    out = conn_hits_native(h, new, sorted_keys)
    assert out is not None
    rows_c, pos_c, vals_c = out
    assert len(rows_c) == len(rows_np)
    o_np = np.lexsort((pos_np, rows_np))
    o_c = np.lexsort((pos_c, rows_c))
    np.testing.assert_array_equal(rows_c[o_c], rows_np[o_np])
    np.testing.assert_array_equal(pos_c[o_c], pos_np[o_np])
    np.testing.assert_allclose(vals_c[o_c], vals_np[o_np],
                               rtol=1e-12, atol=1e-12)
    # and at least some hits, or the test checks nothing
    assert len(rows_c) > 0


def test_hits_match_numpy_w2():
    h = MolecularHamiltonian(_random_ints(8, 2, 2, seed=1))
    full = h.enumerate_basis()
    rng = np.random.default_rng(2)
    basis = full[rng.choice(len(full), 200, replace=False)]
    _check(h, basis, basis[:40])


def test_hits_match_numpy_w2_asymmetric():
    h = MolecularHamiltonian(_random_ints(9, 3, 2, seed=3))
    full = h.enumerate_basis()
    rng = np.random.default_rng(4)
    basis = full[rng.choice(len(full), 300, replace=False)]
    _check(h, basis, basis[-60:])


def test_hits_match_numpy_w4():
    h = MolecularHamiltonian(_random_ints(35, 2, 2, seed=5))
    assert h.pack_words == 4
    full = h.enumerate_basis()
    rng = np.random.default_rng(6)
    basis = full[rng.choice(len(full), 400, replace=False)]
    _check(h, basis, basis[:25])


def test_spin_hamiltonian_falls_back():
    from flow_guided_krylov_tpu.hamiltonians import \
        create_heisenberg_hamiltonian
    h = create_heisenberg_hamiltonian(8, h_z=0.1)
    basis = np.arange(16, dtype=np.uint32)[:, None]
    assert conn_hits_native(h, basis, np.sort(h.keys(basis))) is None


def test_incremental_projected_h_uses_native_consistently():
    """End to end: the staircase eigensolve with the native path must
    reproduce the full-matrix ground energy exactly."""
    from flow_guided_krylov_tpu.krylov.residual_expansion import (
        ResidualExpansionConfig, SelectedCIExpander)
    h = MolecularHamiltonian(_random_ints(8, 2, 2, seed=7))
    full = h.enumerate_basis()
    cfg = ResidualExpansionConfig(max_basis_size=len(full),
                                  configs_per_iteration=100)
    ex = SelectedCIExpander(h, cfg, use_device_scoring=False)
    e1, _ = ex._diagonalize(full[:500])
    e2, _ = ex._diagonalize(full[:700])      # grows through the native path
    vals, _ = h.exact_ground_state(full[:700], k=1)
    assert abs(e2 - float(vals[0])) < 1e-9
    assert e2 <= e1 + 1e-12


def test_to_sparse_native_matches_numpy():
    """Hamiltonian.to_sparse through the native kernel must equal the
    NumPy mirror exactly (same matrix, both channel widths)."""
    from flow_guided_krylov_tpu.ops import native_conn

    for n, ka, kb, seed in ((8, 2, 2, 11), (34, 2, 1, 12)):
        h = MolecularHamiltonian(_random_ints(n, ka, kb, seed=seed))
        full = h.enumerate_basis()
        rng = np.random.default_rng(seed)
        basis = full[rng.choice(len(full), min(len(full), 250),
                                replace=False)]
        M_nat = h.to_sparse(basis)
        orig = native_conn._lib
        native_conn._lib = None            # force the NumPy mirror
        try:
            M_np = h.to_sparse(basis)
        finally:
            native_conn._lib = orig
        diff = abs(M_nat - M_np)
        assert (diff.max() if diff.nnz else 0.0) < 1e-12
        assert M_nat.nnz == M_np.nnz
