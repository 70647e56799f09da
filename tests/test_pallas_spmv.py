"""ELL SpMV + ELL Lanczos propagator tests (CPU reference path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
from flow_guided_krylov_tpu.krylov import (SKQDConfig,
                                           SampleBasedKrylovDiagonalization)
from flow_guided_krylov_tpu.ops.pallas_spmv import ell_spmv_reference


def test_ell_reference_matches_dense():
    h = create_lih_hamiltonian()
    skqd = SampleBasedKrylovDiagonalization(h, SKQDConfig())
    diag, elems, tgt = skqd._ell_structure()
    H = skqd.subspace_hamiltonian.toarray()
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.normal(size=skqd.dim).astype(np.float32))
    out = ell_spmv_reference(diag, elems, tgt, psi)
    ref = H @ np.asarray(psi)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_evolution_modes_agree():
    h = create_lih_hamiltonian()
    outs = {}
    for mode in ("scipy", "dense", "ell"):
        skqd = SampleBasedKrylovDiagonalization(
            h, SKQDConfig(evolution=mode, seed=2))
        psi0 = np.zeros(skqd.dim, complex)
        psi0[skqd._index_of(h.get_hf_state())[0]] = 1.0
        outs[mode] = skqd.evolve(psi0)
    assert np.abs(outs["dense"] - outs["scipy"]).max() < 1e-5
    assert np.abs(outs["ell"] - outs["scipy"]).max() < 1e-5


def test_x_sweep_matches_rotation_sequence():
    """Fused Pallas sweep (interpret mode) == the per-rotation XLA path
    for mixed pure-X / XX / YY words on a 2^12 statevector."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flow_guided_krylov_tpu.ops.pallas_trotter import make_x_sweep
    from flow_guided_krylov_tpu.krylov.basis_sampler import \
        _apply_pauli_rotation

    n = 12
    dim = 1 << n
    rng = np.random.default_rng(3)
    re0 = rng.normal(size=dim).astype(np.float32)
    im0 = rng.normal(size=dim).astype(np.float32)
    nrm = np.sqrt((re0 ** 2 + im0 ** 2).sum())
    re0, im0 = re0 / nrm, im0 / nrm

    # pure-X single-bit, lane-bit X, XX (2-bit mask), YY (x=z, n_y=2)
    words = [(0.07, 1 << 3, 0, 0),
             (-0.11, 1 << 9, 0, 0),
             (0.05, (1 << 2) | (1 << 8), 0, 0),
             (0.09, (1 << 1) | (1 << 5), (1 << 1) | (1 << 5), 2)]

    for reverse in (False, True):
        sweep = make_x_sweep(n, words, block_rows=8, reverse=reverse,
                             interpret=True)
        assert sweep is not None
        r_s, i_s = sweep(jnp.asarray(re0), jnp.asarray(im0))
        r_x, i_x = jnp.asarray(re0), jnp.asarray(im0)
        seq = list(reversed(words)) if reverse else words
        for theta, xm, zm, ny in seq:
            r_x, i_x = _apply_pauli_rotation(r_x, i_x, jnp.float32(theta),
                                             xm, zm, ny, n)
        np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_x),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(i_s), np.asarray(i_x),
                                   atol=2e-6)

    # masks outside the block are rejected
    assert make_x_sweep(n, [(0.1, 1 << 11, 0, 0)], block_rows=8,
                        interpret=True) is None
