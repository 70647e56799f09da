"""Coverage for profiling + adaptive adjuster utilities."""

import time

from flow_guided_krylov_tpu.utils import AdaptiveAdjuster, StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2
    assert s["a"]["total_s"] >= 0.01
    assert "a" in t.dump()


def test_adaptive_adjuster():
    adj = AdaptiveAdjuster(patience=5)
    hist = {"unique_ratios": [0.95] * 10,
            "energies": [-1.0] * 5 + [-1.2] * 5}
    tips = adj.suggest(hist)
    assert "samples_per_batch" in tips
    hist2 = {"unique_ratios": [0.5] * 10, "energies": [-1.0] * 20}
    assert "max_epochs" not in adj.suggest(hist2)


def test_memory_budget_knobs():
    """HBM-aware sizing (reference system_scaler.py:399-437 analog):
    knobs scale with the memory size and respect their clamps."""
    from flow_guided_krylov_tpu.utils import MemoryBudget, device_memory_bytes

    assert device_memory_bytes() > 1 << 28      # something sensible reported

    small = MemoryBudget(4 << 30)
    big = MemoryBudget(64 << 30)
    assert small.connection_table_entries() < big.connection_table_entries()
    assert small.nqs_chunk_size(20) <= big.nqs_chunk_size(20)
    assert small.nqs_chunk_size(20) % 1024 == 0
    assert 4096 <= small.nqs_chunk_size(20, [512] * 6) <= 131072
    assert small.dense_hamiltonian_cap() < big.dense_hamiltonian_cap()
    assert 16 <= small.statevector_sites_cap() <= 28
    assert small.statevector_sites_cap() < big.statevector_sites_cap()

    # wider networks need shorter chunks at the same budget
    assert small.nqs_chunk_size(20, [1024] * 8) <= \
        small.nqs_chunk_size(20, [64])


def test_system_scaler_memory_parameters():
    from flow_guided_krylov_tpu.utils import SystemScaler
    p = SystemScaler(10_000).memory_parameters(n_sites=20,
                                               hidden_dims=[256] * 4)
    assert set(p) == {"nqs_chunk_size", "connection_table_max_entries",
                      "dense_local_energy_max_dim", "statevector_sites_cap"}
    assert all(v > 0 for v in p.values())
