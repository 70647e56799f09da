"""Krylov solvers: SKQD, Selected-CI expansion, circuit basis sampling."""

from .basis_sampler import (CircuitSamplerConfig, CUDAQConfig,
                            KrylovBasisSampler, create_circuit_sampler)
from .residual_expansion import (ResidualBasedExpander,
                                 ResidualExpansionConfig, SelectedCIExpander,
                                 iterative_residual_expansion)
from .skqd import (FlowGuidedSKQD, SampleBasedKrylovDiagonalization,
                   SKQDConfig, lanczos_expm)

__all__ = [
    "ResidualExpansionConfig", "SelectedCIExpander", "ResidualBasedExpander",
    "iterative_residual_expansion",
    "SKQDConfig", "SampleBasedKrylovDiagonalization", "FlowGuidedSKQD",
    "lanczos_expm",
    "CircuitSamplerConfig", "CUDAQConfig", "KrylovBasisSampler",
    "create_circuit_sampler",
]
