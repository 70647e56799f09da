"""Discrete flow, legacy trainer, circuit sampler, checkpoint tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_discrete_flow_sample_and_prob():
    from flow_guided_krylov_tpu.flows import DiscreteFlowSampler
    flow = DiscreteFlowSampler(n_sites=6, n_layers=4, hidden=32)
    key = jax.random.PRNGKey(0)
    params = flow.init(key, key, 4, method=flow.sample)
    configs, lp = flow.apply(params, key, 128, method=flow.sample)
    assert configs.shape == (128, 6)
    assert set(np.unique(np.asarray(configs))) <= {0.0, 1.0}
    probs = flow.apply(params, jax.random.PRNGKey(1), configs[:8],
                       method=flow.estimate_discrete_prob)
    p = np.asarray(probs)
    assert (p > 0).all() and (p < 1.0).all()


def test_circuit_sampler_vs_exact_evolution():
    """Trotter statevector vs dense expm for a small TFIM."""
    from flow_guided_krylov_tpu.hamiltonians.spin import (
        TransverseFieldIsing, extract_coeffs_and_paulis)
    from flow_guided_krylov_tpu.krylov import (CircuitSamplerConfig,
                                               KrylovBasisSampler)
    import scipy.linalg as sla

    tfim = TransverseFieldIsing(4, V=1.0, h=0.9)
    coeffs, words = extract_coeffs_and_paulis(tfim)
    cfg = CircuitSamplerConfig(num_trotter_steps=64, time_step=0.3,
                               initial_state="zeros", shots=1000)
    sampler = KrylovBasisSampler(coeffs, words, 4, cfg)
    psi = sampler.evolve_statevector(0.3)

    H = tfim.exact_dense()
    psi0 = np.zeros(16, complex)
    psi0[0] = 1.0
    psi_exact = sla.expm(-1j * 0.3 * H) @ psi0
    fidelity = abs(np.vdot(psi_exact, psi)) ** 2
    assert fidelity > 0.999, fidelity

    counts = sampler.sample()
    assert sum(counts.values()) == 1000


def test_legacy_trainer_h2():
    from flow_guided_krylov_tpu.flows import (FlowNQSTrainer,
                                              ParticleConservingFlow,
                                              TrainingConfig)
    from flow_guided_krylov_tpu.hamiltonians import create_h2_hamiltonian
    from flow_guided_krylov_tpu.models import DenseNQS

    h = create_h2_hamiltonian()
    flow = ParticleConservingFlow(n_orbitals=2, n_alpha=1, n_beta=1,
                                  hidden_dims=(32, 32))
    nqs = DenseNQS(num_sites=4, hidden_dims=(32, 32))
    tr = FlowNQSTrainer(h, flow, nqs, TrainingConfig(
        num_epochs=120, min_epochs=60, samples_per_batch=64, patience=40))
    hist = tr.train()
    # amplitude-only (positive-coefficient) Rayleigh quotient: energy must
    # improve substantially and the accumulated basis must become complete.
    # (Sign structure needs SignedDenseNQS; the reference's legacy trainer
    # has the same positive-coefficient limitation, which is why run()
    # never invokes it.)
    energies = hist["energies"]
    assert min(energies) < energies[0] - 0.2
    assert min(energies) < -1.0
    basis = tr.extract_basis()
    assert len(basis) == 4
    # checkpoint roundtrip on the legacy trainer
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        tr.save_checkpoint(d + "/ck")
        tr2 = FlowNQSTrainer(h, flow, nqs, TrainingConfig(num_epochs=1))
        tr2.load_checkpoint(d + "/ck")
        assert len(tr2.cache) == len(tr.cache)


def test_incremental_hamiltonian_cache_matches_direct():
    from flow_guided_krylov_tpu.flows import IncrementalHamiltonianCache
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    h = create_lih_hamiltonian()
    basis = h.enumerate_basis()[:60]
    cache = IncrementalHamiltonianCache(h)
    cache.extend(basis[:25])
    cache.extend(basis[25:])
    direct = h.matrix_elements(basis, basis)
    direct = 0.5 * (direct + direct.T)
    np.testing.assert_allclose(cache.H, direct, atol=1e-10)


def test_checkpoint_roundtrip(tmp_path):
    from flow_guided_krylov_tpu.utils import load_checkpoint, save_checkpoint
    state = {"a": jnp.arange(5), "nested": {"b": np.eye(3)},
             "scalar": 3.5}
    p = save_checkpoint(str(tmp_path / "ck"), state)
    restored = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))
    np.testing.assert_allclose(np.asarray(restored["nested"]["b"]), np.eye(3))


def test_system_scaler():
    from flow_guided_krylov_tpu.utils import (QualityPreset, SystemScaler,
                                              SystemTier)
    s = SystemScaler(14400, QualityPreset.BALANCED)
    assert s.tier == SystemTier.LARGE
    p = s.scaled_parameters()
    assert p["max_krylov_dim"] >= 5
    assert p["samples_per_batch"] >= 2000
    cfg = s.create_pipeline_config(verbose=False)
    assert cfg.max_epochs >= 400
    fast = SystemScaler(14400, QualityPreset.FAST).scaled_parameters()
    assert fast["max_epochs"] <= p["max_epochs"]
