"""Spin-lattice Hamiltonians over packed bitstrings.

Counterparts of ``/root/reference/src/hamiltonians/spin.py``:

* :class:`HeisenbergHamiltonian` — XXZ + fields
  (``spin.py:13-180``): diagonal Jz/4 * sum_bonds s_i s_j + sum_i h_z/2 s_i;
  off-diagonal antiparallel-bond flips with element (Jx+Jy)/4 and single
  X-field flips h_x/2.
* :class:`TransverseFieldIsing` — H = -V sum_edges Z_i Z_j - h sum_i X_i
  with range-L (optionally periodic) interactions (``spin.py:183-309``).
* :func:`extract_coeffs_and_paulis` — spin H -> Pauli words for the
  circuit-based Krylov sampler (``spin.py:346-434``).

TPU-first: configs are (B, W) uint32 words — W=1 for n <= 31 spins, W=2
(columns [hi, lo]: sites 0..31 in the LOW word, 32..63 in the HIGH word)
for 32..64 spins, so the base-class uint64 sort/dedup keys
((w0 << 32) | w1) stay monotone in the integer state value.  Connections
are static-shaped (every config has the same flip slots; forbidden flips
carry a zero element), so batches jit cleanly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .base import Hamiltonian

__all__ = ["HeisenbergHamiltonian", "TransverseFieldIsing",
           "create_heisenberg_hamiltonian", "create_tfim_hamiltonian",
           "extract_coeffs_and_paulis", "pack_spin_state",
           "spin_state_int"]

MAX_SPINS = 64


def _spin_words(n: int) -> int:
    """uint32 words per config: 1 for n <= 31 (the original single-word
    layout), 2 for 32..64 (the multi-word frontier, VERDICT r3 item 2)."""
    return 1 if n <= 31 else 2


def pack_spin_state(x: int, n: int) -> np.ndarray:
    """Python-int spin configuration -> (W,) uint32 packed row."""
    if _spin_words(n) == 1:
        return np.array([x], np.uint32)
    return np.array([(x >> 32) & 0xFFFFFFFF, x & 0xFFFFFFFF], np.uint32)


def spin_state_int(row: np.ndarray) -> int:
    """(W,) uint32 packed row -> Python-int spin configuration."""
    row = np.asarray(row).reshape(-1)
    if row.shape[0] == 1:
        return int(row[0])
    return (int(row[0]) << 32) | int(row[1])


def _site_mask(sites: Sequence[int], W: int) -> np.ndarray:
    """XOR mask (W,) uint32 flipping the given sites."""
    m = np.zeros(W, np.uint32)
    for s in sites:
        col = W - 1 - (s // 32)          # low word is the LAST column
        m[col] |= np.uint32(1 << (s % 32))
    return m


def _bit_np(packed: np.ndarray, s: int) -> np.ndarray:
    """(B, W) uint32, site index -> (B,) uint32 occupation bit."""
    W = packed.shape[1]
    col = W - 1 - (s // 32)
    return (packed[:, col] >> np.uint32(s % 32)) & np.uint32(1)


def _spins(packed: np.ndarray, n: int) -> np.ndarray:
    """(B, W) packed -> (B, n) {-1,+1} float64."""
    packed = np.atleast_2d(packed)
    lo = packed[:, -1]
    shifts = np.arange(min(n, 32), dtype=np.uint32)
    bits = ((lo[:, None] >> shifts) & 1)
    if n > 32:
        hi = packed[:, 0]
        shifts_hi = np.arange(n - 32, dtype=np.uint32)
        bits = np.concatenate([bits, (hi[:, None] >> shifts_hi) & 1], axis=1)
    return 2.0 * bits.astype(np.float64) - 1.0


def _flip1(v: np.ndarray, i: int, n: int) -> np.ndarray:
    """``v`` reindexed with basis bit ``i`` flipped — one slab-swap copy
    (pure SIMD memcpy; no index arrays touch the host's slow integer
    paths)."""
    return v.reshape(1 << (n - 1 - i), 2, 1 << i)[:, ::-1, :].reshape(-1)


def _flip2_anti(v: np.ndarray, i: int, j: int, n: int) -> np.ndarray:
    """``v`` reindexed with bits ``i < j`` both flipped, zeroed wherever
    the OUTPUT configuration is aligned at (i, j).

    This is exactly the XXZ flip-flop stencil: output x receives
    v[x ^ mask] iff x (equivalently its source) is antiparallel on the
    bond, and alignment is invariant under the double flip."""
    a, b, c = 1 << (n - 1 - j), 1 << (j - 1 - i), 1 << i
    w = v.reshape(a, 2, b, 2, c)[:, ::-1, :, ::-1, :].copy()
    w[:, 0, :, 0, :] = 0.0
    w[:, 1, :, 1, :] = 0.0
    return w.reshape(-1)


# TPU memory tiling pads the last two axes of every array to (8, 128);
# the host slab trick (reshape to a (..., 2, 2^i) view and reverse the
# 2-axis) therefore explodes 4-64x on device whenever the trailing dims
# are small — measured: the naive formulation of ONE bit-1 flip at 2^26
# wanted a 16 GiB padded temp (f32[2^24, 2, 2] -> T(2,128) = 64x).  The
# device flips below are layout-aware instead:
#
# * bit i >= 7 ("row bits"): flipping bit i swaps CONTIGUOUS 2^i-element
#   blocks, i.e. a static roll of each (2^(i+1))-wide row — XLA lowers
#   jnp.roll(…, axis=1) to two slices + a concat with no repadding.
# * bit i < 7 ("lane bits"): the flip permutes positions within each
#   128-lane group — one (N/128, 128) @ (128, 128) permutation matmul on
#   the MXU at Precision.HIGHEST (exact pass-through of f32 values).
#
# Tiny spaces (n <= 14: CPU tests, dryruns) keep the reverse formulation,
# where padding is irrelevant and matmul shapes would degenerate.

_LANE_BITS = 7


def _lane_perm(mask: int):
    """(128, 128) f32 permutation matrix for column index XOR ``mask``."""
    L = 1 << _LANE_BITS
    cols = np.arange(L)
    P = np.zeros((L, L), np.float32)
    P[cols ^ mask, cols] = 1.0
    return P


def _xor_flip_jax(v, mask: int, n: int):
    """``v`` reindexed by flat-index XOR ``mask`` (any set of bits),
    decomposed into one lane-permutation matmul + per-row-bit rolls."""
    import jax
    import jax.numpy as jnp
    lane_mask = mask & ((1 << _LANE_BITS) - 1)
    if lane_mask:
        v = jnp.dot(v.reshape(-1, 1 << _LANE_BITS),
                    jnp.asarray(_lane_perm(lane_mask)),
                    precision=jax.lax.Precision.HIGHEST).reshape(-1)
    for i in range(_LANE_BITS, n):
        if (mask >> i) & 1:
            v = jnp.roll(v.reshape(-1, 1 << (i + 1)), 1 << i,
                         axis=1).reshape(-1)
    return v


def _flip1_jax(v, i: int, n: int):
    """Device twin of ``_flip1`` (see the layout note above)."""
    import jax.numpy as jnp
    if n <= 14:
        return jnp.flip(v.reshape(1 << (n - 1 - i), 2, 1 << i), axis=1
                        ).reshape(-1)
    return _xor_flip_jax(v, 1 << i, n)


def _flip2_anti_jax(v, i: int, j: int, n: int):
    """Device twin of ``_flip2_anti`` (requires ``i < j``): double bit
    flip masked to antiparallel (i, j) output configurations.  The mask
    is computed from a broadcast iota — elementwise, fused by XLA, no
    stored pattern."""
    import jax
    import jax.numpy as jnp
    if n <= 14:
        a, b, c = 1 << (n - 1 - j), 1 << (j - 1 - i), 1 << i
        w = jnp.flip(v.reshape(a, 2, b, 2, c), axis=(1, 3))
        anti = jnp.array([[0.0, 1.0], [1.0, 0.0]],
                         w.dtype).reshape(1, 2, 1, 2, 1)
        return (w * anti).reshape(-1)
    w = _xor_flip_jax(v, (1 << i) | (1 << j), n)
    iota = jax.lax.iota(jnp.uint32, 1 << n)
    anti = (((iota >> jnp.uint32(i)) ^ (iota >> jnp.uint32(j)))
            & jnp.uint32(1)).astype(w.dtype)
    return w * anti


class _SpinBase(Hamiltonian):
    pack_words = 1          # overridden per instance for n > 31

    def _init_packing(self, num_spins: int) -> None:
        if num_spins > MAX_SPINS:
            raise NotImplementedError(
                f"packed 2xuint32 supports <= {MAX_SPINS} spins")
        self.pack_words = _spin_words(num_spins)
        # key layout for the device PT2 sort: W=2 words carry full 32-bit
        # halves, so a (a << k) | b uint32 pack is never possible — the
        # scoring kernels fall back to 2-key lexicographic sorts
        self.key_bits_per_word = 32 if self.pack_words == 2 \
            else min(num_spins, 32)

    def exact_dense(self) -> np.ndarray:
        """Dense H over the full 2^n space (for n <= ~14; test oracle)."""
        states = np.arange(1 << self.n_sites, dtype=np.uint32)[:, None]
        return self.matrix_elements(states, states)

    # -- host f64 full-space statevector application ---------------------
    #
    # An INDEPENDENT formulation of H (slab bit-flip reshapes, not the
    # packed-connection kernels): the host-side refine/oracle route for
    # full-2^n eigensolves where no enumerated subspace exists (see
    # ``postprocessing.eigensolver.exact_fullspace_ground_state``).
    # Tested against ``exact_dense`` at small n (tests/test_hamiltonians).

    def full_diagonal_np(self) -> np.ndarray:
        """f64 diagonal over the full 2^n space (chunked, cached)."""
        if self.pack_words != 1:
            raise NotImplementedError(
                "full-2^n statevector routes require n <= 31 spins")
        cached = getattr(self, "_full_diag_np", None)
        if cached is None:
            dim = 1 << self.n_sites
            out = np.empty(dim, np.float64)
            step = 1 << 20
            for s in range(0, dim, step):
                states = np.arange(s, min(s + step, dim),
                                   dtype=np.uint32)[:, None]
                out[s:s + len(states)] = self.diagonal_np(states)
            self._full_diag_np = cached = out
        return cached

    def apply_statevector_np(self, v: np.ndarray,
                             diag: Optional[np.ndarray] = None) -> np.ndarray:
        """H @ v over the full 2^n space, float64, on the host."""
        n = self.n_sites
        if self.pack_words != 1:
            raise NotImplementedError(
                "full-2^n statevector routes require n <= 31 spins")
        v = np.asarray(v, np.float64).reshape(-1)
        if v.shape[0] != (1 << n):
            raise ValueError(f"expected a full 2^{n} statevector")
        out = (self.full_diagonal_np() if diag is None else diag) * v
        self._apply_offdiag_np(v, out)
        return out

    def _apply_offdiag_np(self, v: np.ndarray, out: np.ndarray) -> None:
        raise NotImplementedError

    # -- device (f32) full-space statevector application ------------------
    #
    # The TABLE-FREE route for full-2^n eigensolves: where the identity-ELL
    # tables cost 2 * pad(C) * 2^n words of HBM (17+ GiB at n=26, C=n),
    # the flip formulation stores NOTHING but the vectors — each term of H
    # is a slab-reshape axis reverse that XLA lowers to pure data movement.
    # Jittable; the device twin of ``apply_statevector_np`` above.

    def apply_statevector_jax(self, v, diag):
        """H @ v over the full 2^n space on device (f32 slab bit-flips).

        ``diag`` is the precomputed (2^n,) f32 diagonal (see
        ``postprocessing.eigensolver.full_diagonal_device``)."""
        out = diag * v
        return self._apply_offdiag_jax(v, out)

    def _apply_offdiag_jax(self, v, out):
        raise NotImplementedError


class HeisenbergHamiltonian(_SpinBase):
    def __init__(self, num_spins: int, Jx: float = 1.0, Jy: float = 1.0,
                 Jz: float = 1.0, h_x: Optional[np.ndarray] = None,
                 h_y: Optional[np.ndarray] = None,
                 h_z: Optional[np.ndarray] = None, periodic: bool = False):
        self._init_packing(num_spins)
        # The connection kernels implement the XXZ flip-flop (Jx+Jy)/4 on
        # antiparallel bonds; anisotropic-XY (Jx != Jy) adds parallel-bond
        # (XX-YY)/4 flips and an h_y field adds Y single-spin terms, neither
        # of which the kernels (or diagonal) carry.  Gate them here so the
        # matrix-element, Trotter and sector paths can never silently use
        # different Hamiltonians.
        if abs(Jx - Jy) > 1e-12:
            raise NotImplementedError(
                "anisotropic XY (Jx != Jy) is not supported: the connection "
                "kernels only implement the (Jx+Jy)/4 flip-flop terms")
        if h_y is not None and np.any(np.abs(np.asarray(h_y, float)) > 1e-12):
            raise NotImplementedError(
                "h_y fields are not supported by the connection kernels")
        self.n_sites = num_spins
        self.num_sites = num_spins
        self.Jx, self.Jy, self.Jz = Jx, Jy, Jz
        self.h_x = np.asarray(h_x if h_x is not None else np.zeros(num_spins),
                              float)
        self.h_y = np.asarray(h_y if h_y is not None else np.zeros(num_spins),
                              float)
        self.h_z = np.asarray(h_z if h_z is not None else np.zeros(num_spins),
                              float)
        self.periodic = periodic
        self.bonds = [(i, i + 1) for i in range(num_spins - 1)]
        if periodic and num_spins > 2:
            self.bonds.append((num_spins - 1, 0))
        self._has_x_field = bool(np.any(np.abs(self.h_x) > 1e-10))

    @property
    def conserves_magnetization(self) -> bool:
        """True when total S_z commutes with H: the implemented terms
        (Jz diagonal, antiparallel bond flips, h_z fields) all conserve
        magnetization; only a transverse x/y field breaks it.  Callers
        (SKQD, the pipeline flow selection) use this to restrict work to
        the fixed-popcount sector of the initial state."""
        return not (self._has_x_field
                    or bool(np.any(np.abs(self.h_y) > 1e-10)))

    @property
    def n_connections(self) -> int:
        return len(self.bonds) + (self.n_sites if self._has_x_field else 0)

    def diagonal_np(self, packed: np.ndarray) -> np.ndarray:
        s = _spins(np.atleast_2d(packed), self.n_sites)
        diag = np.zeros(s.shape[0])
        for i, j in self.bonds:
            diag += self.Jz / 4.0 * s[:, i] * s[:, j]
        diag += (s * (self.h_z / 2.0)).sum(axis=1)
        return diag

    def connections_np(self, packed: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        packed = np.atleast_2d(packed).astype(np.uint32)
        B, W = packed.shape
        conns = []
        elems = []
        # bond flips: element (Jx+Jy)/4 when antiparallel, else 0
        for i, j in self.bonds:
            mask = _site_mask((i, j), W)
            anti = _bit_np(packed, i) != _bit_np(packed, j)
            conns.append(packed ^ mask[None, :])
            elems.append(np.where(anti, (self.Jx + self.Jy) / 4.0, 0.0))
        if self._has_x_field:
            for i in range(self.n_sites):
                conns.append(packed ^ _site_mask((i,), W)[None, :])
                elems.append(np.full(B, self.h_x[i] / 2.0))
        conn = np.stack(conns, axis=1)                  # (B, C, W)
        el = np.stack(elems, axis=1)
        return conn.astype(np.uint32), el

    def _apply_offdiag_np(self, v: np.ndarray, out: np.ndarray) -> None:
        n = self.n_sites
        jxy = (self.Jx + self.Jy) / 4.0
        if abs(jxy) > 1e-15:
            for i, j in self.bonds:
                lo, hi = (i, j) if i < j else (j, i)
                out += jxy * _flip2_anti(v, lo, hi, n)
        if self._has_x_field:
            for i in range(n):
                if abs(self.h_x[i]) > 1e-12:
                    out += (self.h_x[i] / 2.0) * _flip1(v, i, n)

    def _apply_offdiag_jax(self, v, out):
        n = self.n_sites
        jxy = float((self.Jx + self.Jy) / 4.0)
        if abs(jxy) > 1e-15:
            for i, j in self.bonds:
                lo, hi = (i, j) if i < j else (j, i)
                out = out + jxy * _flip2_anti_jax(v, lo, hi, n)
        if self._has_x_field:
            for i in range(n):
                hx = float(self.h_x[i])
                if abs(hx) > 1e-12:
                    out = out + (hx / 2.0) * _flip1_jax(v, i, n)
        return out


class TransverseFieldIsing(_SpinBase):
    def __init__(self, num_spins: int, V: float = 1.0, h: float = 1.0,
                 L: int = 1, periodic: bool = True):
        self._init_packing(num_spins)
        self.n_sites = num_spins
        self.num_sites = num_spins
        self.V, self.h, self.L = V, h, L
        self.periodic = periodic
        edges = []
        for i in range(num_spins):
            for d in range(1, L + 1):
                j = (i + d) % num_spins if periodic else i + d
                if j < num_spins and (i, j) not in edges \
                        and (j, i) not in edges and i != j:
                    edges.append((i, j))
        self.edges = edges

    @property
    def n_connections(self) -> int:
        return self.n_sites

    def diagonal_np(self, packed: np.ndarray) -> np.ndarray:
        s = _spins(np.atleast_2d(packed), self.n_sites)
        diag = np.zeros(s.shape[0])
        for i, j in self.edges:
            diag -= self.V * s[:, i] * s[:, j]
        return diag

    def connections_np(self, packed: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        packed = np.atleast_2d(packed).astype(np.uint32)
        B, W = packed.shape
        conns = [packed ^ _site_mask((i,), W)[None, :]
                 for i in range(self.n_sites)]
        conn = np.stack(conns, axis=1)                  # (B, C, W)
        el = np.full((B, self.n_sites), -self.h)
        return conn.astype(np.uint32), el

    def _apply_offdiag_np(self, v: np.ndarray, out: np.ndarray) -> None:
        n = self.n_sites
        acc = _flip1(v, 0, n)
        for i in range(1, n):
            acc += _flip1(v, i, n)
        out -= self.h * acc

    def _apply_offdiag_jax(self, v, out):
        n = self.n_sites
        acc = _flip1_jax(v, 0, n)
        for i in range(1, n):
            acc = acc + _flip1_jax(v, i, n)
        return out - float(self.h) * acc


def create_heisenberg_hamiltonian(num_spins: int, Jx: float = 1.0,
                                  Jy: float = 1.0, Jz: float = 1.0,
                                  h_x=None, h_y=None, h_z=None,
                                  periodic: bool = False
                                  ) -> HeisenbergHamiltonian:
    return HeisenbergHamiltonian(num_spins, Jx, Jy, Jz, h_x, h_y, h_z,
                                 periodic)


def create_tfim_hamiltonian(num_spins: int, V: float = 1.0, h: float = 1.0,
                            L: int = 1, periodic: bool = True
                            ) -> TransverseFieldIsing:
    return TransverseFieldIsing(num_spins, V, h, L, periodic)


def extract_coeffs_and_paulis(hamiltonian) -> Tuple[List[float], List[str]]:
    """Spin Hamiltonian -> (coefficients, Pauli words) for the circuit-based
    Krylov basis sampler (reference ``spin.py:346-434``)."""
    n = hamiltonian.n_sites
    coeffs: List[float] = []
    words: List[str] = []

    def word(ops: dict) -> str:
        return "".join(ops.get(q, "I") for q in range(n))

    if isinstance(hamiltonian, TransverseFieldIsing):
        for i, j in hamiltonian.edges:
            coeffs.append(-hamiltonian.V)
            words.append(word({i: "Z", j: "Z"}))
        for i in range(n):
            coeffs.append(-hamiltonian.h)
            words.append(word({i: "X"}))
    elif isinstance(hamiltonian, HeisenbergHamiltonian):
        for i, j in hamiltonian.bonds:
            for op, J in (("X", hamiltonian.Jx), ("Y", hamiltonian.Jy),
                          ("Z", hamiltonian.Jz)):
                if abs(J) > 1e-12:
                    coeffs.append(J / 4.0)
                    words.append(word({i: op, j: op}))
        for i in range(n):
            for op, harr in (("X", hamiltonian.h_x), ("Y", hamiltonian.h_y),
                             ("Z", hamiltonian.h_z)):
                if abs(harr[i]) > 1e-12:
                    # spin map s = 2b - 1 means Z|b> = (1-2b)|b> = -s|b>,
                    # so single-Z coefficients flip sign relative to the
                    # h_z/2 * s_i diagonal convention
                    sign = -1.0 if op == "Z" else 1.0
                    coeffs.append(sign * harr[i] / 2.0)
                    words.append(word({i: op}))
    else:
        raise TypeError(f"unsupported Hamiltonian {type(hamiltonian)}")
    return coeffs, words


# ---------------------------------------------------------------------------
# Device (JAX) kernels — static-shape spin connections for the jitted
# training hot path (molecular systems get these from ops/slater.py)
# ---------------------------------------------------------------------------

def _spin_device_ops(ham):
    """Build (diagonal_fn, connections_fn) closures in jnp for a spin H.

    Handles both packings: W=1 (n <= 31) and W=2 ([hi, lo] for 32..64
    sites).  Per-site bit tests gather the right word column; flip masks
    are precomputed (C, W) uint32 tables XORed against the batch."""
    import jax
    import jax.numpy as jnp

    n = ham.n_sites
    W = ham.pack_words

    def spins_of(packed):
        """(B, W) -> (B, n) f32 in {-1, +1}."""
        lo = packed[:, W - 1]
        shifts = jnp.arange(min(n, 32), dtype=jnp.uint32)
        bits = (lo[:, None] >> shifts) & jnp.uint32(1)
        if n > 32:
            hi = packed[:, 0]
            sh = jnp.arange(n - 32, dtype=jnp.uint32)
            bits = jnp.concatenate(
                [bits, (hi[:, None] >> sh) & jnp.uint32(1)], axis=1)
        return 2.0 * bits.astype(jnp.float32) - 1.0

    def site_cols_shifts(sites):
        cols = np.array([W - 1 - (s // 32) for s in sites], np.int32)
        shifts = np.array([s % 32 for s in sites], np.uint32)
        return jnp.asarray(cols), jnp.asarray(shifts)

    def masks_for(groups):
        """list of site tuples -> (C, W) uint32 XOR masks."""
        return jnp.asarray(np.stack([_site_mask(g, W) for g in groups]))

    if isinstance(ham, TransverseFieldIsing):
        edges = jnp.asarray(np.array(ham.edges, np.int32).reshape(-1, 2))
        V, hf = float(ham.V), float(ham.h)
        flip_masks = masks_for([(i,) for i in range(n)])

        @jax.jit
        def diagonal(packed):
            s = spins_of(packed)
            return -V * jnp.sum(s[:, edges[:, 0]] * s[:, edges[:, 1]], -1)

        @jax.jit
        def connections(packed):
            conn = packed[:, None, :] ^ flip_masks[None, :, :]
            elems = jnp.full((packed.shape[0], n), -hf, jnp.float32)
            return conn, elems

        return diagonal, connections

    if isinstance(ham, HeisenbergHamiltonian):
        Jz = float(ham.Jz)
        Jxy4 = float((ham.Jx + ham.Jy) / 4.0)
        hz = jnp.asarray(ham.h_z, jnp.float32)
        hx = jnp.asarray(ham.h_x, jnp.float32)
        has_x = bool(np.any(np.abs(ham.h_x) > 1e-10))
        bonds_np = np.array(ham.bonds, np.int32).reshape(-1, 2)
        bonds = jnp.asarray(bonds_np)
        bond_masks = masks_for([tuple(b) for b in bonds_np])
        ci, si = site_cols_shifts(bonds_np[:, 0])
        cj, sj = site_cols_shifts(bonds_np[:, 1])
        flip_masks = masks_for([(i,) for i in range(n)])

        @jax.jit
        def diagonal(packed):
            s = spins_of(packed)
            zz = Jz / 4.0 * jnp.sum(s[:, bonds[:, 0]] * s[:, bonds[:, 1]], -1)
            return zz + jnp.sum(s * (hz / 2.0)[None, :], -1)

        @jax.jit
        def connections(packed):
            bi = (packed[:, ci] >> si[None, :]) & jnp.uint32(1)
            bj = (packed[:, cj] >> sj[None, :]) & jnp.uint32(1)
            anti = (bi != bj).astype(jnp.float32)
            conn_b = packed[:, None, :] ^ bond_masks[None, :, :]
            el_b = anti * Jxy4
            if has_x:
                conn_x = packed[:, None, :] ^ flip_masks[None, :, :]
                el_x = jnp.broadcast_to((hx / 2.0)[None, :],
                                        (packed.shape[0], n))
                return (jnp.concatenate([conn_b, conn_x], 1),
                        jnp.concatenate([el_b, el_x], 1))
            return conn_b, el_b

        return diagonal, connections

    raise TypeError(f"no device kernels for {type(ham)}")


def _install_device_ops(self):
    if getattr(self, "_device_ops", None) is None:
        self._device_ops = _spin_device_ops(self)
    return self._device_ops


def _diagonal_device(self, packed):
    return _install_device_ops(self)[0](packed)


def _connections_device_fn(self):
    return _install_device_ops(self)[1]


_SpinBase.diagonal_device = _diagonal_device
_SpinBase.connections_device = property(_connections_device_fn)
