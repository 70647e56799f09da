"""Packed-bitstring utilities for Slater determinants.

Determinants are stored as pairs of unsigned 32-bit words — one word per
spin channel (alpha occupations in bit i of word 0, beta in word 1) — not
as (B, 2*n_orb) 0/1 float tensors like the reference
(``/root/reference/src/hamiltonians/molecular.py:43-45``).  Jordan-Wigner
parities become popcounts of masked prefixes (SURVEY.md §7.1).  Orbital
ordering matches the reference: alpha orbitals on qubits 0..n-1, beta on
n..2n-1.

Supports n_orb <= 31 (the benchmark systems need <= 13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pack_np", "unpack_np", "keys_np", "occupancy", "parity_between",
    "pack_device", "unpack_device", "keys_device",
]


# ---------------------------------------------------------------------------
# Host (NumPy) side
# ---------------------------------------------------------------------------

def pack_np(configs: np.ndarray, n_orb: int) -> np.ndarray:
    """(B, 2*n_orb) 0/1 array -> (B, 2) uint32 [alpha_bits, beta_bits]."""
    configs = np.asarray(configs)
    w = (1 << np.arange(n_orb, dtype=np.uint64))
    a = (configs[:, :n_orb].astype(np.uint64) @ w).astype(np.uint32)
    b = (configs[:, n_orb:2 * n_orb].astype(np.uint64) @ w).astype(np.uint32)
    return np.stack([a, b], axis=-1)


def unpack_np(packed: np.ndarray, n_orb: int) -> np.ndarray:
    """(B, 2) uint32 -> (B, 2*n_orb) int8 occupation vectors."""
    packed = np.asarray(packed)
    shifts = np.arange(n_orb, dtype=np.uint32)
    a = (packed[:, 0:1] >> shifts) & 1
    b = (packed[:, 1:2] >> shifts) & 1
    return np.concatenate([a, b], axis=-1).astype(np.int8)


def keys_np(packed: np.ndarray) -> np.ndarray:
    """(B, 2) uint32 -> (B,) uint64 unique key (alpha << 32 | beta)."""
    packed = np.asarray(packed, dtype=np.uint64)
    return (packed[..., 0] << np.uint64(32)) | packed[..., 1]


def from_keys_np(keys: np.ndarray) -> np.ndarray:
    keys = np.asarray(keys, dtype=np.uint64)
    a = (keys >> np.uint64(32)).astype(np.uint32)
    b = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return np.stack([a, b], axis=-1)


# ---------------------------------------------------------------------------
# Device (JAX) side
# ---------------------------------------------------------------------------

def occupancy(bits: jnp.ndarray, n_orb: int) -> jnp.ndarray:
    """uint32 scalar/array -> (..., n_orb) int32 occupation vector."""
    shifts = jnp.arange(n_orb, dtype=jnp.uint32)
    return ((bits[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.int32)


def pack_device(occ: jnp.ndarray) -> jnp.ndarray:
    """(..., n_orb) 0/1 -> uint32 bits."""
    n_orb = occ.shape[-1]
    w = (jnp.uint32(1) << jnp.arange(n_orb, dtype=jnp.uint32))
    return jnp.sum(occ.astype(jnp.uint32) * w, axis=-1)


def unpack_device(packed: jnp.ndarray, n_orb: int) -> jnp.ndarray:
    """(..., 2) uint32 -> (..., 2*n_orb) float32 occupations."""
    a = occupancy(packed[..., 0], n_orb)
    b = occupancy(packed[..., 1], n_orb)
    return jnp.concatenate([a, b], axis=-1).astype(jnp.float32)


def keys_device(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) uint32 -> (...,) float-safe composite sort key as 2 uint32.

    On-device (no uint64 on TPU) we keep keys as the packed pair itself and
    compare lexicographically where needed; helper returns alpha*2^32+beta
    as float64 is unavailable, so callers use :func:`lexsort_keys` instead.
    """
    return packed


def parity_between(bits: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray
                   ) -> jnp.ndarray:
    """(-1)^(# occupied orbitals strictly between p and q) as int32 sign.

    This is the Jordan-Wigner / fermionic permutation sign for a†_q a_p
    acting on ``bits`` with p occupied and q empty (reference:
    ``molecular.py:379-389``).
    """
    lo = jnp.minimum(p, q).astype(jnp.uint32)
    hi = jnp.maximum(p, q).astype(jnp.uint32)
    one = jnp.uint32(1)
    mask = ((one << hi) - one) & ~((one << (lo + one)) - one)
    par = jax.lax.population_count(bits & mask) & jnp.uint32(1)
    return (1 - 2 * par.astype(jnp.int32))


def parity_between_np(bits: np.ndarray, p: np.ndarray, q: np.ndarray
                      ) -> np.ndarray:
    """NumPy mirror of :func:`parity_between` (vectorized, uint64-safe)."""
    bits = np.asarray(bits, dtype=np.uint64)
    lo = np.minimum(p, q).astype(np.uint64)
    hi = np.maximum(p, q).astype(np.uint64)
    one = np.uint64(1)
    mask = ((one << hi) - one) & ~((one << (lo + one)) - one)
    masked = bits & mask
    # popcount via bit tricks (numpy lacks popcount pre-2.0 on uint64)
    v = masked
    count = np.zeros_like(v)
    while np.any(v):
        count += v & one
        v = v >> one
    return (1 - 2 * (count & one).astype(np.int64)).astype(np.int64)
