"""Distributed layer: device meshes and sharded execution.

New first-class capability (the reference is single-process/single-GPU,
SURVEY.md §2.9): data-parallel sampling/NQS evaluation and basis-sharded
connection sums over a ('data', 'basis') mesh, with collectives inserted
by XLA from sharding annotations.
"""

from .mesh import make_mesh, data_sharding, replicated, P, NamedSharding
from .sharded_matvec import (shard_hamiltonian_rows, sharded_matvec_fn,
                             sharded_lanczos_expm,
                             sharded_lanczos_ground_state)
from .sharded_trotter import (make_sharded_substep,
                              mesh_supports_statevector, shard_statevector)

__all__ = ["make_mesh", "data_sharding", "replicated", "P", "NamedSharding",
           "shard_hamiltonian_rows", "sharded_matvec_fn",
           "sharded_lanczos_expm", "sharded_lanczos_ground_state",
           "make_sharded_substep", "mesh_supports_statevector",
           "shard_statevector"]
