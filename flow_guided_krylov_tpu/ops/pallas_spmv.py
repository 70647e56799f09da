"""Pallas ELL sparse matvec for subspace Hamiltonians.

The particle-conserving subspace Hamiltonian has FIXED row degree: every
determinant couples to exactly C others (plus the diagonal).  That makes
ELL format exact (no padding waste) and the matvec

    out[i] = diag[i] * psi[i] + sum_c elems[i, c] * psi[tgt[i, c]]

a good Pallas target: ``psi`` fits in VMEM for any enumerable subspace
(N <= ~1M f32), so the random gather runs at VMEM speed while ``elems`` /
``tgt`` tiles stream from HBM — 24x less HBM traffic than the dense
matvec for N2 (609 nonzeros vs 14,400 columns per row).

Used by the SKQD Lanczos propagator when the dense subspace H would not
fit in HBM; also the building block for basis-sharded matvecs (each shard
holds a row block, psi is all-gathered).  The XLA-gather formulation is
the reference implementation and the fallback on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ell_spmv", "ell_spmv_reference", "make_ell_spmv"]


def ell_spmv_reference(diag: jnp.ndarray, elems: jnp.ndarray,
                       tgt: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """XLA gather formulation (reference implementation)."""
    return diag * psi + jnp.sum(elems * psi[tgt], axis=1)


def make_ell_spmv(n: int, c: int, tile: int = 512):
    """Build a jitted Pallas ELL matvec for fixed (N, C) structure."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_pad = ((n + tile - 1) // tile) * tile
    grid = (n_pad // tile,)

    def kernel(psi_ref, diag_ref, psi_tile_ref, elems_ref, tgt_ref, out_ref):
        psi = psi_ref[:]                               # VMEM-resident vector
        vals = jnp.take(psi, tgt_ref[:].reshape(-1), axis=0)
        vals = vals.reshape(tgt_ref.shape)
        out_ref[:] = (diag_ref[:] * psi_tile_ref[:]
                      + jnp.sum(elems_ref[:] * vals, axis=1))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),              # psi (full)
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),              # diag tile
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),              # psi tile
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # elems tile
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # tgt tile
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
    )

    @jax.jit
    def spmv(diag, elems, tgt, psi):
        pad = n_pad - n
        diag_p = jnp.pad(diag, (0, pad))
        psi_p = jnp.pad(psi, (0, pad))
        elems_p = jnp.pad(elems, ((0, pad), (0, 0)))
        tgt_p = jnp.pad(tgt, ((0, pad), (0, 0)))
        out = call(psi_p, diag_p, psi_p, elems_p, tgt_p)
        return out[:n]

    return spmv


_PALLAS_OK = None


def _pallas_supported() -> bool:
    """One-time probe: does the Pallas kernel compile on this backend?"""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            spmv = make_ell_spmv(8, 3, tile=8)
            out = spmv(jnp.zeros(8), jnp.ones((8, 3)),
                       jnp.zeros((8, 3), jnp.int32), jnp.ones(8))
            jax.block_until_ready(out)
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK


def ell_spmv(diag, elems, tgt, psi, use_pallas: bool = True):
    """ELL matvec; Pallas kernel on TPU (when supported), XLA gather else."""
    if use_pallas and jax.default_backend() == "tpu" and _pallas_supported():
        n, c = elems.shape
        return make_ell_spmv(n, c)(diag, elems, tgt, psi)
    return ell_spmv_reference(diag, elems, tgt, psi)
