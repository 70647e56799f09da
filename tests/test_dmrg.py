"""DMRG oracle tests: ED parity on every supported model family.

The DMRG module exists to be an INDEPENDENT oracle for large-chain
claims (Heisenberg-24/26/28 sectors dwarf dense ED), so its own
validation is dense-ED parity at small N across couplings, fields and
model types — the same discipline the reference applies to its lattice
claims (``examples/skqd_lattice_validation.py:63-103``).
"""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import (HeisenbergHamiltonian,
                                                 TransverseFieldIsing)
from flow_guided_krylov_tpu.postprocessing import dmrg_ground_state


def _ed(h) -> float:
    return float(np.linalg.eigvalsh(h.exact_dense()).min())


@pytest.mark.parametrize("n", [8, 12])
def test_dmrg_matches_ed_heisenberg(n):
    hz = np.zeros(n)
    hz[0] = 0.1                     # the lattice-validation perturbation
    h = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    e, info = dmrg_ground_state(h, max_bond=64, sweeps=8)
    assert e == pytest.approx(_ed(h), abs=1e-9)
    assert info["truncation_error"] < 1e-10
    assert abs(info["total_sz"]) < 1e-6   # even-N AFM ground: S_z = 0


def test_dmrg_odd_chain_half_integer_sector():
    """Odd chains ground in S_z = +/-1/2 — the sector measurement must
    resolve it (it is the caller's sector-consistency check)."""
    # a uniform field splits the +/-1/2 doublet so the sector is sharp
    h = HeisenbergHamiltonian(11, 1.0, 1.0, 1.0, h_z=np.full(11, 0.05))
    e, info = dmrg_ground_state(h, max_bond=64, sweeps=8)
    assert e == pytest.approx(_ed(h), abs=1e-9)
    assert abs(abs(info["total_sz"]) - 0.5) < 1e-6


def test_dmrg_odd_chain_sector_sign_matches_packed_convention():
    """The lattice SCI runner flips its Neel seed into the sector DMRG's
    total_sz reports (odd N); that relies on bit=1 ↔ sigma_z=+1 meaning
    sector S_z = popcount − n/2 in BOTH representations.  Pin it: the
    DMRG energy must equal the dense-ED minimum restricted to the
    popcount sector matching sign(total_sz), and that sector must hold
    the global ground state."""
    n = 11
    hz = np.zeros(n)
    hz[0] = 0.1                     # the lattice-validation perturbation
    h = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0, h_z=hz)
    e, info = dmrg_ground_state(h, max_bond=64, sweeps=8)
    dense = h.exact_dense()
    pop = np.array([bin(s).count("1") for s in range(1 << n)])
    sector_min = {}
    for k in (n // 2, n // 2 + 1):          # S_z = -1/2, +1/2
        idx = np.where(pop == k)[0]
        sector_min[k - n / 2.0] = float(
            np.linalg.eigvalsh(dense[np.ix_(idx, idx)]).min())
    sz = 0.5 if info["total_sz"] > 0 else -0.5
    assert e == pytest.approx(sector_min[sz], abs=1e-9)
    assert sector_min[sz] == min(sector_min.values())


def test_dmrg_matches_ed_xxz_with_fields():
    n = 10
    h = HeisenbergHamiltonian(n, 0.8, 0.8, 0.55,
                              h_z=np.full(n, 0.07),
                              h_x=np.full(n, 0.02))
    e, _ = dmrg_ground_state(h, max_bond=64, sweeps=8)
    assert e == pytest.approx(_ed(h), abs=1e-9)


def test_dmrg_matches_ed_tfim_open():
    t = TransverseFieldIsing(10, V=1.0, h=0.8, periodic=False)
    e, _ = dmrg_ground_state(t, max_bond=64, sweeps=8)
    assert e == pytest.approx(_ed(t), abs=1e-9)


def test_dmrg_energy_is_variational():
    """A deliberately starved bond dimension still upper-bounds ED."""
    n = 12
    h = HeisenbergHamiltonian(n, 1.0, 1.0, 1.0)
    e, _ = dmrg_ground_state(h, max_bond=8, sweeps=4)
    assert e >= _ed(h) - 1e-12


def test_dmrg_rejects_periodic():
    with pytest.raises(NotImplementedError):
        dmrg_ground_state(TransverseFieldIsing(10, V=1.0, h=1.0,
                                               periodic=True))
    with pytest.raises(NotImplementedError):
        dmrg_ground_state(HeisenbergHamiltonian(10, periodic=True))
