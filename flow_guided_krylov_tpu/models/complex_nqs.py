"""Complex-valued NQS variants.

Counterparts of ``/root/reference/src/nqs/complex_nqs.py``:

* :class:`ComplexNQS` — shared GELU trunk with separate amplitude/phase
  heads, unbounded phase (``complex_nqs.py:13-88``).
* :class:`RBMQuantumState` — Carleo-Troyer restricted Boltzmann machine
  with log-cosh hidden activations (``complex_nqs.py:91-185``); real or
  complex weights.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .base import NeuralQuantumState

__all__ = ["ComplexNQS", "RBMQuantumState"]


class ComplexNQS(NeuralQuantumState):
    num_sites: int
    hidden_dims: Sequence[int] = (256, 256)

    @nn.compact
    def amplitude_and_phase(self, x: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = x
        for d in self.hidden_dims:
            h = nn.gelu(nn.Dense(d)(h))
        log_amp = nn.Dense(1)(h).squeeze(-1)
        phase = nn.Dense(1)(h).squeeze(-1)
        return log_amp, phase

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.amplitude_and_phase(x)[0]

    def phase(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.amplitude_and_phase(x)[1]


class RBMQuantumState(NeuralQuantumState):
    """RBM wavefunction: log psi = sum_j a_j s_j + sum_i log cosh(b_i + W_i.s)."""
    num_sites: int
    n_hidden: int = 64
    complex_weights: bool = False

    @nn.compact
    def _log_psi_parts(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s = 2.0 * x - 1.0  # spins in {-1, +1}
        if self.complex_weights:
            a_r = self.param("a_real", nn.initializers.normal(0.01),
                             (self.num_sites,))
            a_i = self.param("a_imag", nn.initializers.normal(0.01),
                             (self.num_sites,))
            w_r = self.param("w_real", nn.initializers.normal(0.01),
                             (self.n_hidden, self.num_sites))
            w_i = self.param("w_imag", nn.initializers.normal(0.01),
                             (self.n_hidden, self.num_sites))
            b_r = self.param("b_real", nn.initializers.normal(0.01),
                             (self.n_hidden,))
            b_i = self.param("b_imag", nn.initializers.normal(0.01),
                             (self.n_hidden,))
            a = a_r + 1j * a_i
            w = w_r + 1j * w_i
            b = b_r + 1j * b_i
            z = s @ w.T + b
            log_psi = s @ a + jnp.sum(jnp.log(jnp.cosh(z)), axis=-1)
            return jnp.real(log_psi), jnp.imag(log_psi)
        a = self.param("a", nn.initializers.normal(0.01), (self.num_sites,))
        w = self.param("w", nn.initializers.normal(0.01),
                       (self.n_hidden, self.num_sites))
        b = self.param("b", nn.initializers.normal(0.01), (self.n_hidden,))
        z = s @ w.T + b
        log_psi = s @ a + jnp.sum(
            jnp.abs(z) + jnp.log1p(jnp.exp(-2.0 * jnp.abs(z))) - jnp.log(2.0),
            axis=-1)
        return log_psi, jnp.zeros_like(log_psi)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._log_psi_parts(x)[0]

    def phase(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._log_psi_parts(x)[1]
