"""Pallas/XLA ELL sparse matvec for subspace Hamiltonians.

The particle-conserving subspace Hamiltonian has FIXED row degree: every
determinant couples to exactly C others (plus the diagonal), so ELL format
is exact (no padding waste):

    out[i] = diag[i] * psi[i] + sum_c elems_t[c, i] * psi[tgt_t[c, i]]

Layout: the tables are stored TRANSPOSED, (C, N).  TPU HBM tiles f32/s32
arrays as (8, 128) (sublane, lane); an (N, C) table with small C pads the
minor dim C -> 128 — measured 5.1x expansion at C=25, which alone OOM'd
the 10.4M-state Heisenberg-26 sector oracle (s32[10400600,25] held 4.96G
for 992M of payload).  (C, N) pads C -> the next sublane multiple of 8
(1.28x at C=25) and N -> a lane multiple (negligible), and the scan
accumulation below never materializes an (N, C) intermediate.

Hardware reality (measured on v5e): arbitrary-index gathers are the VPU's
weak spot — Mosaic lowers only restricted gather forms, and reformulating
via 128-wide row gathers inflates VMEM 128x.  The production routing is
therefore: dense MXU matvec for subspaces that fit HBM (<= ~20k), ELL for
large conserved sectors, scipy f64 beyond HBM, with the experimental
Pallas kernel available where it compiles — a documented speed-of-light
trade-off, not a missing feature (see docs/KERNELS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ell_spmv", "ell_spmv_reference", "make_ell_spmv"]


def ell_spmv_reference(diag: jnp.ndarray, elems_t: jnp.ndarray,
                       tgt_t: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
    """XLA gather formulation over (C, N) transposed tables.

    A scan over the C connection rows keeps peak live memory at one
    N-vector gather per step (vs a full (C, N) product), which is what
    lets 10M+-state sector Lanczos fit HBM next to its m x N Krylov
    block."""
    def body(acc, et):
        e, t = et
        return acc + e * jnp.take(psi, t, axis=0), None

    acc, _ = jax.lax.scan(body, diag * psi, (elems_t, tgt_t))
    return acc


def make_ell_spmv(n: int, c: int, tile: int = 512):
    """Build a jitted Pallas ELL matvec for fixed (N, C) structure."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert tile % 128 == 0 or tile >= 8, "tile must suit TPU tiling"
    if tile % 128 != 0:
        tile = ((tile + 127) // 128) * 128
    n_pad = ((n + tile - 1) // tile) * tile
    grid = (n_pad // tile,)

    def kernel(psi2d_ref, diag_ref, psi_tile_ref, elems_ref, tgt_ref,
               out_ref):
        # NOTE: arbitrary-index gathers are the weak spot of the VPU; this
        # kernel exists for backends/Mosaic versions where the 1D gather
        # lowers.  The capability probe + host-level fallback below route
        # around it otherwise (see ell_spmv / SKQD evolve auto-routing).
        psi = psi2d_ref[:].reshape(-1)
        idx = tgt_ref[:]                                        # (c, tile)
        vals = jnp.take(psi, idx.reshape(-1), axis=0).reshape(idx.shape)
        out_ref[:] = (diag_ref[:] * psi_tile_ref[:]
                      + jnp.sum(elems_ref[:] * vals, axis=0))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),              # psi2d full
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),              # diag tile
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),              # psi tile
            pl.BlockSpec((c, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # elems tile
            pl.BlockSpec((c, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # tgt tile
        ],
        out_specs=pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.float32),
    )

    @jax.jit
    def spmv(diag, elems_t, tgt_t, psi):
        pad = n_pad - n
        diag_p = jnp.pad(diag, (0, pad))
        psi_p = jnp.pad(psi, (0, pad))
        elems_p = jnp.pad(elems_t, ((0, 0), (0, pad)))
        tgt_p = jnp.pad(tgt_t, ((0, 0), (0, pad)))
        psi2d = psi_p.reshape(n_pad // 128, 128)
        out = call(psi2d, diag_p, psi_p, elems_p, tgt_p)
        return out[:n]

    return spmv


_PALLAS_OK = None


def _pallas_supported() -> bool:
    """One-time probe: does the Pallas kernel compile on this backend?"""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            spmv = make_ell_spmv(128, 3, tile=128)
            out = spmv(jnp.zeros(128), jnp.ones((3, 128)),
                       jnp.zeros((3, 128), jnp.int32), jnp.ones(128))
            jax.block_until_ready(out)
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK


def ell_spmv(diag, elems_t, tgt_t, psi, use_pallas: bool = True):
    """ELL matvec over (C, N) tables; Pallas kernel on TPU (when
    supported), XLA gather-scan else."""
    if use_pallas and jax.default_backend() == "tpu" and _pallas_supported():
        c, n = elems_t.shape
        return make_ell_spmv(n, c)(diag, elems_t, tgt_t, psi)
    return ell_spmv_reference(diag, elems_t, tgt_t, psi)
