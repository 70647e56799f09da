"""Pallas fused Trotter-rotation sweep for large statevectors.

**Measured and demoted** (round 3): on a real TPU at TFIM-24 this sweep
runs an 8-substep evolve in 1055.7 ms where the per-rotation XLA path
takes 51.4 ms — 20x SLOWER.  The hypothesis behind the kernel (one HBM
round trip per rotation on the XLA path) is wrong: XLA loop-fuses the
chained elementwise rotations into a handful of HBM passes already, so
the path is near the bandwidth bound, while this kernel's
MXU-permutation formulation turns free XOR addressing into dense
512x512x128 matmuls per word per tile and becomes compute-bound.  The
kernel is kept as an interpret-mode-tested reference implementation and
is only routed to when ``FGK_PALLAS_SWEEP=1`` is set (see
``sweep_supported``); docs/KERNELS.md records the measurement.

Original design (retained for reference): fuse EVERY rotation whose
x_mask lies inside one VMEM block (bits 0..B-1, B = log2(block_rows)+7)
into a single HBM pass:

* the statevector is viewed as (2^n / 128, 128) and processed in
  (block_rows, 128) tiles held in VMEM;
* an XOR flip inside the tile is exact as a one-hot matmul — lane bits
  (0-6) right-multiply by a 128x128 permutation, sublane bits
  left-multiply by a block_rows x block_rows permutation — both ride the
  MXU and are exact in f32 (each output has exactly one unit term);
* Z/Y phases come from the tile's global indices (broadcasted_iota +
  popcount), never materialized in HBM.

Rotations with x_mask bits >= B still need cross-tile data and stay on
the XLA flip path (strided reverses fuse well there); for a TFIM-28
substep that leaves 12 of 28 rotations un-fused, cutting the HBM passes
per substep by ~2.5x.  Because a symmetric (forward-then-reversed)
sweep is 2nd-order for ANY term ordering, the low-bit words are hoisted
to the outside of the splitting: sweep(fwd) . high(fwd) . high(rev) .
sweep(rev).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["make_x_sweep", "sweep_supported"]


def _xor_perm_matrix(size: int, mask: int) -> jnp.ndarray:
    """P[i, j] = 1 iff j == i ^ mask (symmetric, orthogonal)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return ((rows ^ mask) == cols).astype(jnp.float32)


def sweep_supported(n_qubits: int, block_rows: int = 512) -> bool:
    """Opt-in only (FGK_PALLAS_SWEEP=1): the sweep measured 20x slower
    than the loop-fused XLA per-rotation path on TPU (see module
    docstring); it also needs at least one full (block_rows, 128) tile."""
    import os
    return (os.environ.get("FGK_PALLAS_SWEEP") == "1"
            and jax.default_backend() == "tpu"
            and n_qubits - 7 >= int(np.log2(block_rows)))


def make_x_sweep(n_qubits: int,
                 words: Sequence[Tuple[float, int, int, int]],
                 block_rows: int = 512,
                 reverse: bool = False,
                 interpret: bool = False):
    """Build a jitted (re, im) -> (re, im) applying exp(-i theta_w P_w)
    for every word (theta, x_mask, z_mask, n_y) in order (reversed when
    ``reverse``), all x_masks confined to the low log2(block_rows)+7 bits.

    Returns None when any word's x_mask escapes the block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dim = 1 << n_qubits
    n_rows = dim // 128
    block_rows = min(block_rows, n_rows)
    block_elems = block_rows * 128
    if any(w[1] <= 0 or w[1] >= block_elems for w in words):
        return None
    seq = list(reversed(words)) if reverse else list(words)
    grid = (n_rows // block_rows,)
    need_phase = any(w[2] != 0 or w[3] % 4 != 0 for w in seq)

    def kernel(re_ref, im_ref, out_re_ref, out_im_ref):
        re = re_ref[:]
        im = im_ref[:]
        if need_phase:
            base = pl.program_id(0) * block_elems
            row = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 128), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 128), 1)
            gidx = (base + row * 128 + lane).astype(jnp.uint32)

        for theta, xm, zm, ny in seq:
            lane_m = xm & 127
            row_m = xm >> 7
            ct = jnp.float32(np.cos(theta))
            st = jnp.float32(np.sin(theta))

            def permute(v, row_m=row_m, lane_m=lane_m):
                if row_m:
                    v = jax.lax.dot(_xor_perm_matrix(block_rows, row_m), v,
                                    preferred_element_type=jnp.float32)
                if lane_m:
                    v = jax.lax.dot(v, _xor_perm_matrix(128, lane_m),
                                    preferred_element_type=jnp.float32)
                return v

            xr = permute(re)
            xi = permute(im)
            if zm == 0 and ny % 4 == 0:
                re, im = ct * re + st * xi, ct * im - st * xr
            else:
                src = gidx ^ jnp.uint32(xm)
                par = (jax.lax.population_count(src & jnp.uint32(zm))
                       & jnp.uint32(1))
                s = 1.0 - 2.0 * par.astype(jnp.float32)
                a = int(((1j) ** ny).real)
                b = int(((1j) ** ny).imag)
                p_re = s * (a * xr - b * xi)
                p_im = s * (a * xi + b * xr)
                re, im = ct * re + st * p_im, ct * im - st * p_re

        out_re_ref[:] = re
        out_im_ref[:] = im

    spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_rows, 128), jnp.float32)),
        interpret=interpret,
    )

    @jax.jit
    def sweep(re, im):
        r2, i2 = call(re.reshape(n_rows, 128), im.reshape(n_rows, 128))
        return r2.reshape(-1), i2.reshape(-1)

    return sweep
