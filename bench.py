#!/usr/bin/env python
"""Headline benchmark: batched <x|H|y> matrix-element throughput.

This is the hot op of the whole framework (SURVEY.md §6: "matrix-element
eval + matvec rate" is the BASELINE target metric): for a batch of
determinants, enumerate ALL connected determinants and their Slater-Condon
matrix elements on device (N2-sized system: 20 qubits, 609 connections per
determinant).

The reference computes this with Python/numpy loops on the CPU
(``molecular.py:194-327``) — its single biggest bottleneck.  ``vs_baseline``
compares the device kernel against this repo's *vectorized NumPy float64*
host implementation, itself already much faster than the reference's
per-determinant loops, so the ratio is conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# Pinned host baseline: steady-state rate of connections_batch_np (the
# vectorized float64 NumPy mirror) on THIS idle single-core host, median of
# warm trials, measured 2026-08-19 (round 4).  Pinned as a constant because
# the live host rate varies ~6x with host state (page-cache/arena warmth,
# concurrent work), which made the round-over-round vs_baseline ratio
# meaningless (BENCH_r01-03: 156.8 / 333.5 / 50.67 at near-identical device
# rates).  The live rate is still measured and reported as a diagnostic.
HOST_BASELINE_ELEMENTS_PER_S = 12.6e6


def main():
    import jax
    from flow_guided_krylov_tpu.utils.profiling import \
        enable_compilation_cache
    enable_compilation_cache()

    from flow_guided_krylov_tpu.chem.scf import MolecularIntegrals
    from flow_guided_krylov_tpu.hamiltonians.molecular import \
        MolecularHamiltonian
    from flow_guided_krylov_tpu.ops.slater import connections_batch_np

    # N2/STO-3G-sized synthetic system (20 qubits, C(10,7)^2 = 14,400 dets)
    rng = np.random.default_rng(0)
    n = 10
    h1 = rng.normal(size=(n, n))
    h1 = 0.5 * (h1 + h1.T)
    h2 = rng.normal(size=(n,) * 4) * 0.1
    h2 = h2 + h2.transpose(1, 0, 2, 3)
    h2 = h2 + h2.transpose(0, 1, 3, 2)
    h2 = h2 + h2.transpose(2, 3, 0, 1)
    ints = MolecularIntegrals(h1e=h1, h2e=h2 / 8, nuclear_repulsion=0.5,
                              n_electrons=14, n_orbitals=n,
                              n_alpha=7, n_beta=7)
    h = MolecularHamiltonian(ints)

    # the whole N2-sized space in one batch — the production shape (the
    # training fast path enumerates/densifies the full subspace), and
    # batch amortization is worth ~1.6x over B=2048
    basis = h.enumerate_basis()
    B = len(basis)
    batch = basis[rng.permutation(B)]
    C = h.n_connections

    # the ROUTED production kernel — the same auto-pick every production
    # call site builds (round-5: bench must report the deployed kernel,
    # not the best of the variants; see ops/slater.py and
    # results/conn_kernel_crossover_r5.txt for the per-variant numbers)
    from flow_guided_krylov_tpu.ops.slater import connection_kernel_choice
    import jax.numpy as jnp
    batch_dev = jnp.asarray(batch)
    iters = 10
    fn = h.connections_device
    out = fn(batch_dev)
    jax.block_until_ready(out)             # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(batch_dev)
    jax.block_until_ready(out)
    dt_dev = (time.perf_counter() - t0) / iters
    rate_dev = B * C / dt_dev
    kernel_name = connection_kernel_choice(h.tables)

    # live host rate (diagnostic only — the ratio uses the pinned constant)
    t0 = time.perf_counter()
    connections_batch_np(batch, h.tables)
    dt_host = time.perf_counter() - t0
    rate_host_live = B * C / dt_host

    tta_s, tta_err, tta_basis = time_to_accuracy("n2")
    # second wall (round-5): CH4's space (15,876 configs, C=560) runs the
    # same HF-seeded SCI machinery on a different shape so the gate can't
    # overfit the N2 path
    tta2_s, tta2_err, tta2_basis = time_to_accuracy("ch4")

    print(json.dumps({
        "metric": "matrix_elements_per_second",
        "value": round(rate_dev),
        "unit": "elements/s",
        "vs_baseline": round(rate_dev / HOST_BASELINE_ELEMENTS_PER_S, 2),
        "kernel": kernel_name,
        "host_rate_live": round(rate_host_live),
        # BASELINE.md target metric: end-to-end wall to <1.6 mHa on N2
        # (HF-seeded Selected-CI, the framework's fastest route; the
        # reference's best N2 is 13.82 mHa — it never reaches the bar)
        "n2_time_to_chemacc_s": tta_s,
        "n2_error_mha": tta_err,
        "n2_basis_size": tta_basis,
        "ch4_time_to_chemacc_s": tta2_s,
        "ch4_error_mha": tta2_err,
        "ch4_basis_size": tta2_basis,
    }))


def time_to_accuracy(molecule: str):
    """Wall-clock from HF seed to <1.6 mHa vs FCI (N2/STO-3G: 14,400
    configs; CH4: 15,876) via the stage-3 Selected-CI machinery — the
    BASELINE.md time-to-accuracy target.  The FCI oracle is
    instrumentation (disk cached, nothing in the solver reads it); the
    timed region is the solve alone."""
    from flow_guided_krylov_tpu.hamiltonians import MOLECULE_FACTORIES
    from flow_guided_krylov_tpu.krylov import (ResidualExpansionConfig,
                                               SelectedCIExpander)

    h = MOLECULE_FACTORIES[molecule]()
    exact = h.fci_energy()
    cfg = ResidualExpansionConfig(
        max_iterations=40, configs_per_iteration=300,
        stagnation_threshold=1e-6, stagnation_patience=3,
        max_basis_size=min(h.n_valid_configs, 30_000))
    expander = SelectedCIExpander(h, cfg)
    basis = h.get_hf_state()[None, :]
    t0 = time.perf_counter()
    wall = None
    e = float("inf")
    for _ in range(cfg.max_iterations):
        out = expander.expand_basis(basis)
        basis, e = out["basis"], out["energy"]
        if e - exact < 1.6e-3:
            wall = round(time.perf_counter() - t0, 2)
            break
        if not out["accepted"]:
            break
    return wall, round(1000 * (e - exact), 4), int(len(basis))


if __name__ == "__main__":
    from flow_guided_krylov_tpu.utils.profiling import run_with_cache_retry
    run_with_cache_retry(main)
