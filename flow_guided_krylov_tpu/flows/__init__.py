"""Generative samplers (flows) and Stage-1 trainers."""

from .discrete import DiscreteFlowSampler, MultiModalPrior
from .particle_conserving import (GumbelTopK, OrbitalScoringNetwork,
                                  ParticleConservingFlow,
                                  ParticleConservingFlowSampler,
                                  SzConservingFlow, gumbel_topk,
                                  verify_particle_conservation)
from .physics_guided_training import (PhysicsGuidedConfig,
                                      PhysicsGuidedFlowTrainer)
from .spin_training import SpinFlowTrainer
from .training import (FlowNQSTrainer, IncrementalHamiltonianCache,
                       InferenceNQSTrainer, TrainingConfig)

__all__ = [
    "ParticleConservingFlow", "ParticleConservingFlowSampler", "gumbel_topk",
    "GumbelTopK", "OrbitalScoringNetwork", "verify_particle_conservation",
    "PhysicsGuidedConfig", "PhysicsGuidedFlowTrainer", "SpinFlowTrainer",
    "DiscreteFlowSampler", "MultiModalPrior",
    "TrainingConfig", "FlowNQSTrainer", "InferenceNQSTrainer",
    "IncrementalHamiltonianCache",
]
