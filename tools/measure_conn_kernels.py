#!/usr/bin/env python
"""Measure the v1 (gather) vs v2 (MXU one-hot) connection kernels across
active-space shapes, to calibrate the production auto-pick
(``ops/slater.py::make_connection_fn_auto``).

For each (n_orb, n_alpha) shape this times both kernels at a
production-like batch (sized so B*C covers the PT2-scoring block scale)
and prints one JSON line per shape.  Run on the real TPU:

    python tools/measure_conn_kernels.py
    python tools/measure_conn_kernels.py --shapes 14:5 12:6 --elems 8e6
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def random_system(n, ka, kb, seed=0):
    from flow_guided_krylov_tpu.chem.scf import MolecularIntegrals
    from flow_guided_krylov_tpu.hamiltonians.molecular import \
        MolecularHamiltonian
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(n, n))
    h1 = 0.5 * (h1 + h1.T)
    h2 = rng.normal(size=(n,) * 4) * 0.1
    h2 = h2 + h2.transpose(1, 0, 2, 3)
    h2 = h2 + h2.transpose(0, 1, 3, 2)
    h2 = h2 + h2.transpose(2, 3, 0, 1)
    ints = MolecularIntegrals(h1e=h1, h2e=h2 / 8, nuclear_repulsion=0.5,
                              n_electrons=ka + kb, n_orbitals=n,
                              n_alpha=ka, n_beta=kb)
    return MolecularHamiltonian(ints)


def random_dets(h, B, seed=1):
    rng = np.random.default_rng(seed)
    n, ka, kb = h.n_orbitals, h.n_alpha, h.n_beta

    def words(k, count):
        out = np.empty(count, np.uint32)
        for i in range(count):
            bits = rng.choice(n, size=k, replace=False)
            out[i] = np.uint32(sum(1 << int(b) for b in bits))
        return out

    return np.stack([words(ka, B), words(kb, B)], -1)


def time_fn(fn, batch_dev, iters=10):
    import jax
    out = fn(batch_dev)
    jax.block_until_ready(out)           # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(batch_dev)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", nargs="*",
                   default=["6:2", "8:5", "9:5", "10:7", "12:6",
                            "14:5", "16:8"],
                   help="n_orb:n_alpha pairs (n_beta = n_alpha)")
    p.add_argument("--elems", type=float, default=6e6,
                   help="target B*C connection evaluations per call")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from flow_guided_krylov_tpu.utils.profiling import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flow_guided_krylov_tpu.ops.slater import (
        make_connection_fn, make_connection_fn_mxu,
        make_connection_fn_mxu_pair)

    for spec in args.shapes:
        n, ka = (int(x) for x in spec.split(":"))
        h = random_system(n, ka, ka)
        C = h.n_connections
        B = max(256, int(args.elems / C) // 256 * 256)
        batch = random_dets(h, B)
        batch_dev = jnp.asarray(batch)
        row = {"n_orb": n, "n_alpha": ka, "C": C, "B": B}
        for name, maker in (("v1", make_connection_fn),
                            ("v2", make_connection_fn_mxu),
                            ("v3", make_connection_fn_mxu_pair)):
            try:
                dt = time_fn(maker(h.tables), batch_dev, args.iters)
                row[f"{name}_ms"] = round(dt * 1e3, 2)
                row[f"{name}_melems_s"] = round(B * C / dt / 1e6, 1)
            except Exception as e:                      # OOM etc.
                row[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        if "v1_ms" in row and "v2_ms" in row:
            row["v2_speedup"] = round(row["v1_ms"] / row["v2_ms"], 3)
        if "v1_ms" in row and "v3_ms" in row:
            row["v3_speedup"] = round(row["v1_ms"] / row["v3_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    from flow_guided_krylov_tpu.utils.profiling import run_with_cache_retry
    run_with_cache_retry(main)
