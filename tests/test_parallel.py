"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mesh_shapes():
    from flow_guided_krylov_tpu.parallel import make_mesh
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest should force 8 virtual CPU devices"
    mesh = make_mesh(8, devices=devs)
    assert mesh.shape == {"data": 4, "basis": 2}
    mesh1 = make_mesh(1, devices=devs)
    assert mesh1.shape == {"data": 1, "basis": 1}


def test_sharded_training_step_matches_single_device():
    """The SPMD-sharded step must produce the same physics as unsharded."""
    from flow_guided_krylov_tpu.flows import (ParticleConservingFlow,
                                              PhysicsGuidedConfig,
                                              PhysicsGuidedFlowTrainer)
    from flow_guided_krylov_tpu.models import DenseNQS
    from flow_guided_krylov_tpu.parallel import make_mesh
    import __graft_entry__ as g

    h = g._make_system(6, 2, 2, seed=3)

    def run_one(mesh):
        flow = ParticleConservingFlow(n_orbitals=6, n_alpha=2, n_beta=2,
                                      hidden_dims=(32, 32))
        nqs = DenseNQS(num_sites=12, hidden_dims=(32, 32))
        cfg = PhysicsGuidedConfig(samples_per_batch=64, verbose=False,
                                  use_connection_table=False, seed=11)
        tr = PhysicsGuidedFlowTrainer(h, flow, nqs, cfg, mesh=mesh)
        out = tr._step(tr.flow_params, tr.nqs_params, tr.flow_opt_state,
                       tr.nqs_opt_state, tr._acc_buf,
                       jax.random.PRNGKey(5), jnp.float32(1.0))
        vec = np.asarray(out[-1])
        return {"energy": float(vec[0]), "unique_ratio": float(vec[4])}

    m_none = run_one(None)
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    m_shard = run_one(mesh)
    assert m_shard["energy"] == pytest.approx(m_none["energy"],
                                              rel=1e-4, abs=1e-4)
    assert m_shard["unique_ratio"] == pytest.approx(m_none["unique_ratio"])


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sharded_lanczos_matches_host():
    """Basis-sharded Lanczos ground state == host eigh, on the 8-dev mesh."""
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    from flow_guided_krylov_tpu.parallel import (make_mesh,
                                                 shard_hamiltonian_rows,
                                                 sharded_lanczos_expm,
                                                 sharded_lanczos_ground_state)
    h = create_lih_hamiltonian()
    basis = h.enumerate_basis()        # 225, pads to shards unevenly? 225
    # pad rows to a multiple of 8 for even sharding
    H = h.to_sparse(basis).toarray().astype(np.float32)
    n = H.shape[0]
    n_pad = ((n + 7) // 8) * 8
    Hp = np.zeros((n_pad, n_pad), np.float32)
    Hp[:n, :n] = H
    Hp[n:, n:] = np.eye(n_pad - n) * 1e3   # push padding far up-spectrum
    # basis_parallel=2: rows shard over BOTH mesh axes, so the 'basis'
    # axis is genuinely exercised by the matvec/expm below
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    Hs = shard_hamiltonian_rows(mesh, jnp.asarray(Hp))
    e, v = sharded_lanczos_ground_state(mesh, Hs, m=80)
    exact = np.linalg.eigh(H.astype(np.float64))[0][0]
    assert e == pytest.approx(exact, abs=5e-4)

    # evolution: exp(-i dt H)|HF> matches the scipy reference
    import scipy.sparse.linalg as spla
    psi0 = np.zeros(n_pad, np.float32)
    from flow_guided_krylov_tpu.krylov import SampleBasedKrylovDiagonalization, SKQDConfig
    skqd = SampleBasedKrylovDiagonalization(h, SKQDConfig())
    idx = skqd._index_of(h.get_hf_state())[0]
    psi0[idx] = 1.0
    re, im = sharded_lanczos_expm(mesh, Hs, jnp.asarray(psi0),
                                  jnp.zeros(n_pad, jnp.float32), 0.1, 30)
    ref = spla.expm_multiply(-1j * 0.1 * h.to_sparse(basis), psi0[:n].astype(complex))
    out = np.asarray(re)[:n] + 1j * np.asarray(im)[:n]
    assert np.abs(out - ref).max() < 1e-5


def test_sharded_dense_table_step_matches_single_device():
    """Connection-table + dense-H local energies under a mesh == unsharded
    (the table paths must not be disabled by sharding)."""
    from flow_guided_krylov_tpu.flows import (ParticleConservingFlow,
                                              PhysicsGuidedConfig,
                                              PhysicsGuidedFlowTrainer)
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    from flow_guided_krylov_tpu.models import DenseNQS
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = create_lih_hamiltonian()

    def run_one(mesh):
        flow = ParticleConservingFlow(n_orbitals=6, n_alpha=2, n_beta=2,
                                      hidden_dims=(32, 32))
        nqs = DenseNQS(num_sites=12, hidden_dims=(32, 32))
        cfg = PhysicsGuidedConfig(samples_per_batch=64, verbose=False,
                                  seed=11)
        tr = PhysicsGuidedFlowTrainer(h, flow, nqs, cfg, mesh=mesh)
        assert tr.connection_table is not None
        assert tr._h_dense_dev is not None
        out = tr._step(tr.flow_params, tr.nqs_params, tr.flow_opt_state,
                       tr.nqs_opt_state, tr._acc_buf,
                       jax.random.PRNGKey(5), jnp.float32(1.0),
                       tr._table_arrays())
        return float(np.asarray(out[-1])[0])

    e_none = run_one(None)
    e_mesh = run_one(make_mesh(8, devices=jax.devices("cpu")))
    assert e_mesh == pytest.approx(e_none, rel=1e-4, abs=1e-4)


def test_skqd_sharded_evolution_matches_scipy():
    """SKQD dense device evolution with a mesh == the f64 scipy propagator."""
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    from flow_guided_krylov_tpu.krylov import (
        SampleBasedKrylovDiagonalization, SKQDConfig)
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = create_lih_hamiltonian()
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    skqd = SampleBasedKrylovDiagonalization(
        h, SKQDConfig(evolution="dense"), mesh=mesh)
    assert skqd._dense_evolution_cap() > 20_000

    psi = np.zeros(skqd.dim, np.complex128)
    psi[skqd._index_of(h.get_hf_state())[0]] = 1.0
    out = skqd.evolve(psi)
    ref = skqd._evolve_scipy(psi)
    assert np.abs(out - ref).max() < 1e-5


def test_pipeline_mesh_matches_single_device():
    """End-to-end pipeline on the 8-device CPU mesh == single device."""
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    from flow_guided_krylov_tpu.pipeline import (FlowGuidedKrylovPipeline,
                                                 PipelineConfig)

    h = create_lih_hamiltonian()
    exact = h.fci_energy()

    def run_one(n_devices):
        cfg = PipelineConfig(max_epochs=25, min_epochs=8,
                             samples_per_batch=128,
                             nf_hidden_dims=[32, 32],
                             nqs_hidden_dims=[32, 32],
                             residual_iterations=2, max_krylov_dim=3,
                             shots_per_krylov=2000,
                             n_devices=n_devices, seed=4, verbose=False)
        pipe = FlowGuidedKrylovPipeline(h, cfg, exact_energy=exact)
        return pipe.run()

    out1 = run_one(None)
    out8 = run_one(8)
    assert out8["final_energy"] == pytest.approx(out1["final_energy"],
                                                 abs=1e-4)


def test_restore_trainer_roundtrip(tmp_path):
    """save_trainer -> restore_trainer into a fresh PhysicsGuidedFlowTrainer
    reproduces params, basis and the next training step."""
    from flow_guided_krylov_tpu.flows import (ParticleConservingFlow,
                                              PhysicsGuidedConfig,
                                              PhysicsGuidedFlowTrainer)
    from flow_guided_krylov_tpu.hamiltonians import create_lih_hamiltonian
    from flow_guided_krylov_tpu.models import DenseNQS
    from flow_guided_krylov_tpu.utils.checkpoint import CheckpointManager

    h = create_lih_hamiltonian()

    def make(seed):
        flow = ParticleConservingFlow(n_orbitals=6, n_alpha=2, n_beta=2,
                                      hidden_dims=(32, 32))
        nqs = DenseNQS(num_sites=12, hidden_dims=(32, 32))
        cfg = PhysicsGuidedConfig(num_epochs=3, min_epochs=1,
                                  samples_per_batch=64, verbose=False,
                                  use_accumulated_energy=False, seed=seed)
        return PhysicsGuidedFlowTrainer(h, flow, nqs, cfg)

    src = make(seed=1)
    src.train()
    ck = CheckpointManager(str(tmp_path))
    ck.save_trainer("stage1", src)

    dst = make(seed=99)
    assert ck.restore_trainer("stage1", dst)
    np.testing.assert_array_equal(dst.accumulated_basis,
                                  src.accumulated_basis)
    leaves_s = jax.tree_util.tree_leaves(src.flow_params)
    leaves_d = jax.tree_util.tree_leaves(dst.flow_params)
    for a, b in zip(leaves_s, leaves_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert dst._acc_keys is not None
    np.testing.assert_array_equal(dst._acc_keys, src._acc_keys)


def test_sharded_ell_evolution_matches_scipy():
    """Mesh-sharded ELL propagator (rows over all devices, replicated psi)
    == the f64 scipy propagator on a conserved Heisenberg sector."""
    from flow_guided_krylov_tpu.hamiltonians import HeisenbergHamiltonian
    from flow_guided_krylov_tpu.krylov import (
        SampleBasedKrylovDiagonalization, SKQDConfig)
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = HeisenbergHamiltonian(12, 1.0, 1.0, 1.0,
                              h_z=np.array([0.1] + [0.0] * 11))
    neel = sum(1 << i for i in range(0, 12, 2))
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    skqd = SampleBasedKrylovDiagonalization(
        h, SKQDConfig(evolution="ell"), mesh=mesh,
        initial_state=np.array([neel], np.uint32))
    assert skqd.dim == 924                         # C(12,6), pads to 928
    psi = np.zeros(skqd.dim, np.complex128)
    psi[skqd._index_of(skqd.initial_state)[0]] = 1.0
    out = skqd.evolve(psi)
    ref = skqd._evolve_scipy(psi)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-5
    # the sharded structure really is padded + row-sharded
    assert getattr(skqd, "_ell_pad", 0) == (-924) % 8


def test_sharded_trotter_matches_single_device():
    """Mesh-sharded statevector Trotter substep (ppermute block exchanges
    for high-bit flips) == the single-device substep, TFIM-10."""
    from flow_guided_krylov_tpu.hamiltonians import TransverseFieldIsing
    from flow_guided_krylov_tpu.krylov import (
        SampleBasedKrylovDiagonalization, SKQDConfig)
    from flow_guided_krylov_tpu.parallel import (make_mesh,
                                                 mesh_supports_statevector)

    h = TransverseFieldIsing(10, V=1.0, h=0.5, periodic=True)
    init = np.array([0], np.uint32)
    cfg = SKQDConfig(evolution="trotter", num_trotter_steps=4,
                     time_step=0.1)

    single = SampleBasedKrylovDiagonalization(h, cfg, initial_state=init)
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    assert mesh_supports_statevector(mesh, 10)
    sharded = SampleBasedKrylovDiagonalization(h, cfg, initial_state=init,
                                               mesh=mesh)
    assert single.use_trotter and sharded.use_trotter

    re0 = jnp.zeros(1 << 10, jnp.float32).at[0].set(1.0)
    im0 = jnp.zeros(1 << 10, jnp.float32)
    r1, i1 = single._evolve_trotter(re0, im0)
    from flow_guided_krylov_tpu.parallel import shard_statevector
    re_s, im_s = shard_statevector(mesh, re0, im0)
    r2, i2 = sharded._evolve_trotter(re_s, im_s)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(i1), atol=2e-6)


def test_sharded_trotter_skqd_run():
    """End-to-end sharded-Trotter SKQD reaches the same physics as the
    single-device run (same seed -> same samples up to float noise)."""
    from flow_guided_krylov_tpu.hamiltonians import TransverseFieldIsing
    from flow_guided_krylov_tpu.krylov import (
        SampleBasedKrylovDiagonalization, SKQDConfig)
    from flow_guided_krylov_tpu.parallel import make_mesh

    h = TransverseFieldIsing(10, V=1.0, h=0.5, periodic=True)
    init = np.array([0], np.uint32)
    cfg = SKQDConfig(evolution="trotter", max_krylov_dim=6,
                     shots_per_krylov=20_000, seed=7)
    mesh = make_mesh(8, devices=jax.devices("cpu"), basis_parallel=2)
    e1 = SampleBasedKrylovDiagonalization(
        h, cfg, initial_state=init).run()["final_energy"]
    e2 = SampleBasedKrylovDiagonalization(
        h, cfg, initial_state=init, mesh=mesh).run()["final_energy"]
    # float-order differences in the sharded cumsum move a handful of
    # shots across CDF boundaries, so bases differ by a few configs; the
    # projected energies must still agree to sub-mHa
    assert e2 == pytest.approx(e1, abs=5e-4)
