"""Generative samplers (flows) and Stage-1 trainers."""

from .particle_conserving import (ParticleConservingFlow, gumbel_topk,
                                  verify_particle_conservation)
from .physics_guided_training import (PhysicsGuidedConfig,
                                      PhysicsGuidedFlowTrainer)

__all__ = [
    "ParticleConservingFlow", "gumbel_topk", "verify_particle_conservation",
    "PhysicsGuidedConfig", "PhysicsGuidedFlowTrainer",
]
