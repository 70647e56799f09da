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
                       tr.nqs_opt_state, jax.random.PRNGKey(5),
                       jnp.float32(1.0))
        return {k: float(v) for k, v in out[-1].items()}

    m_none = run_one(None)
    mesh = make_mesh(8, devices=jax.devices("cpu"))
    m_shard = run_one(mesh)
    assert m_shard["energy"] == pytest.approx(m_none["energy"],
                                              rel=1e-4, abs=1e-4)
    assert m_shard["unique_ratio"] == pytest.approx(m_none["unique_ratio"])


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
