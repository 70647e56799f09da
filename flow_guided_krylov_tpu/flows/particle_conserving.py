"""Particle-conserving normalizing flow (Gumbel top-k), JAX-native.

Counterpart of ``/root/reference/src/flows/particle_conserving_flow.py``:
samples determinants with exactly n_alpha alpha and n_beta beta electrons by
Gumbel-top-k selection over per-orbital logits — alpha from a learnable
prior, beta conditioned on the sampled alpha occupation
(``particle_conserving_flow.py:153-370``).

Design differences from the reference (TPU-first):
* sampling is a pure function of (params, rng key, temperature) — jit/vmap
  friendly, no global RNG state;
* straight-through estimation composes ``stop_gradient`` explicitly;
* the top-k log-probability keeps the reference's approximation
  (sum of selected log-softmax terms minus lgamma(k+1),
  ``particle_conserving_flow.py:274-295``) since training dynamics depend
  on it (SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = ["ParticleConservingFlow", "ParticleConservingFlowSampler",
           "SzConservingFlow",
           "gumbel_topk", "GumbelTopK", "OrbitalScoringNetwork",
           "verify_particle_conservation"]


def gumbel_topk(key: jax.Array, logits: jnp.ndarray, k: int,
                temperature: jnp.ndarray, hard: bool = True) -> jnp.ndarray:
    """Differentiable k-hot sample: (B, n) logits -> (B, n) mask with k ones.

    Straight-through: hard one-hot forward, softmax gradients backward
    (reference ``particle_conserving_flow.py:37-78``).
    """
    u = jax.random.uniform(key, logits.shape, minval=1e-10, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    z = (logits + gumbel) / temperature
    _, idx = jax.lax.top_k(z, k)
    one_hot = jnp.zeros_like(logits).at[
        jnp.arange(logits.shape[0])[:, None], idx].set(1.0)
    if not hard:
        return jax.nn.softmax(z, axis=-1)  # z already carries 1/temperature
    soft = jax.nn.softmax(z, axis=-1) * one_hot
    return one_hot - jax.lax.stop_gradient(soft) + soft


def _topk_log_prob(logits: jnp.ndarray, selection: jnp.ndarray,
                   k: int) -> jnp.ndarray:
    """Approximate log-probability of an (unordered) top-k selection."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    selected = jnp.sum(logp * selection, axis=-1)
    return selected - gammaln(k + 1.0)


class ParticleConservingFlow(nn.Module):
    """Exact-particle-number determinant sampler.

    alpha channel: learnable prior logits (the reference's empty-context
    path, ``particle_conserving_flow.py:119,229-234``).
    beta channel: logits from an MLP conditioned on the alpha occupation
    (``particle_conserving_flow.py:192-203,236-243``).
    """

    n_orbitals: int
    n_alpha: int
    n_beta: int
    hidden_dims: Sequence[int] = (256, 256)
    context_dim: int = 64

    @nn.compact
    def _logits(self, alpha_config: Optional[jnp.ndarray],
                batch_size: int) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Return (alpha_logits (B,n), beta_logits (B,n) or None)."""
        prior = self.param("alpha_prior_logits", nn.initializers.zeros,
                           (self.n_orbitals,))
        alpha_logits = jnp.broadcast_to(prior[None, :],
                                        (batch_size, self.n_orbitals))
        if alpha_config is None:
            return alpha_logits, None
        # beta conditioned on alpha via a small context net + scorer MLP
        ctx = nn.Dense(128, name="a2b_in")(alpha_config)
        ctx = nn.silu(ctx)
        ctx = nn.Dense(self.context_dim, name="a2b_out")(ctx)
        h = jnp.concatenate(
            [jnp.zeros((batch_size, self.n_orbitals), alpha_config.dtype), ctx],
            axis=-1)
        h = nn.silu(nn.Dense(self.hidden_dims[0], name="beta_h0")(h))
        h = nn.silu(nn.Dense(self.hidden_dims[-1], name="beta_h1")(h))
        beta_logits = nn.Dense(self.n_orbitals, name="beta_out")(h)
        return alpha_logits, beta_logits

    def sample(self, key: jax.Array, batch_size: int,
               temperature: jnp.ndarray, hard: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample (B, 2*n_orbitals) configurations + (B,) log-probs."""
        ka, kb = jax.random.split(key)
        alpha_logits, _ = self._logits(None, batch_size)
        alpha = gumbel_topk(ka, alpha_logits, self.n_alpha, temperature, hard)
        alpha_hard = jax.lax.stop_gradient(jnp.round(alpha))
        _, beta_logits = self._logits(alpha_hard, batch_size)
        beta = gumbel_topk(kb, beta_logits, self.n_beta, temperature, hard)
        configs = jnp.concatenate([alpha, beta], axis=-1)
        log_probs = (_topk_log_prob(alpha_logits, alpha_hard, self.n_alpha)
                     + _topk_log_prob(beta_logits,
                                      jax.lax.stop_gradient(jnp.round(beta)),
                                      self.n_beta))
        return configs, log_probs

    def log_prob(self, configs: jnp.ndarray) -> jnp.ndarray:
        """Log-probability of given (B, 2n) configurations
        (``particle_conserving_flow.py:297-325``)."""
        b = configs.shape[0]
        alpha = configs[:, :self.n_orbitals]
        beta = configs[:, self.n_orbitals:]
        alpha_logits, beta_logits = self._logits(alpha, b)
        return (_topk_log_prob(alpha_logits, alpha, self.n_alpha)
                + _topk_log_prob(beta_logits, beta, self.n_beta))

    def estimate_discrete_prob(self, configs: jnp.ndarray) -> jnp.ndarray:
        """p(x) = exp(log p(x)) (``particle_conserving_flow.py:357-370``)."""
        return jnp.exp(self.log_prob(configs))


class SzConservingFlow(nn.Module):
    """Exact-magnetization spin sampler: k-hot Gumbel-top-k over sites.

    Spin analog of the molecular particle-conserving flow's alpha channel
    (reference ``particle_conserving_flow.py:153-370``): for XXZ-class
    Hamiltonians that conserve total S_z the ground state lives in one
    fixed-popcount sector, so sampling k-hot configurations removes all
    out-of-sector waste the RealNVP discrete flow pays (Heisenberg-10:
    the S_z=0 sector is 252 of 1,024 states).

    Method signatures mirror :class:`~..flows.discrete.DiscreteFlowSampler`
    so :class:`~.spin_training.SpinFlowTrainer` drives either unchanged
    (``estimate_discrete_prob`` takes and ignores (key, n_mc): the top-k
    probability is exact, no MC needed).
    """

    n_sites: int
    n_up: int

    @nn.compact
    def _logits(self, batch_size: int) -> jnp.ndarray:
        prior = self.param("site_logits", nn.initializers.zeros,
                           (self.n_sites,))
        return jnp.broadcast_to(prior[None, :], (batch_size, self.n_sites))

    def sample(self, key: jax.Array, batch: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = self._logits(batch)
        occ = gumbel_topk(key, logits, self.n_up, jnp.float32(1.0))
        hard = jax.lax.stop_gradient(jnp.round(occ))
        return occ, _topk_log_prob(logits, hard, self.n_up)

    def estimate_discrete_prob(self, key: jax.Array, configs: jnp.ndarray,
                               n_mc: int = 0) -> jnp.ndarray:
        return jnp.exp(self.log_prob(key, configs))

    def log_prob(self, key: jax.Array, configs: jnp.ndarray,
                 n_mc: int = 0) -> jnp.ndarray:
        logits = self._logits(configs.shape[0])
        return _topk_log_prob(logits, configs, self.n_up)


def verify_particle_conservation(configs, n_alpha: int, n_beta: int,
                                 n_orbitals: int) -> dict:
    """Audit sampled configs: all rows must satisfy the particle numbers
    (reference ``particle_conserving_flow.py:465-502``, invoked from the
    pipeline's stage 2)."""
    import numpy as np
    configs = np.asarray(configs)
    a = configs[:, :n_orbitals].sum(axis=-1)
    b = configs[:, n_orbitals:2 * n_orbitals].sum(axis=-1)
    ok = (a == n_alpha) & (b == n_beta)
    return {
        "all_valid": bool(ok.all()),
        "fraction_valid": float(ok.mean()) if len(ok) else 1.0,
        "n_violations": int((~ok).sum()),
        "alpha_counts": (int(a.min()), int(a.max())) if len(a) else (0, 0),
        "beta_counts": (int(b.min()), int(b.max())) if len(b) else (0, 0),
    }


class OrbitalScoringNetwork(nn.Module):
    """Standalone per-orbital scorer (reference
    ``particle_conserving_flow.py:81-150``): context encoder -> scorer MLP
    -> per-orbital logits, learnable prior for the empty context, occupied
    orbitals masked to -inf for autoregressive use."""

    n_orbitals: int
    hidden_dims: Sequence[int] = (256, 256)
    context_dim: int = 64

    @nn.compact
    def __call__(self, context: Optional[jnp.ndarray] = None,
                 batch_size: int = 1) -> jnp.ndarray:
        prior = self.param("prior_logits", nn.initializers.zeros,
                           (self.n_orbitals,))
        if context is None:
            return jnp.broadcast_to(prior[None, :],
                                    (batch_size, self.n_orbitals))
        h = nn.silu(nn.Dense(self.hidden_dims[0])(context))
        h = nn.Dense(self.context_dim)(h)
        for d in self.hidden_dims:
            h = nn.silu(nn.Dense(d)(h))
        logits = nn.Dense(self.n_orbitals)(h)
        return jnp.where(context > 0.5, -jnp.inf, logits)


class GumbelTopK:
    """Object-style wrapper over :func:`gumbel_topk` holding a temperature
    (reference ``particle_conserving_flow.py:24-78``)."""

    def __init__(self, temperature: float = 1.0):
        self.temperature = temperature

    def __call__(self, key, logits, k: int, hard: bool = True):
        return gumbel_topk(key, logits, k, jnp.float32(self.temperature),
                           hard)


# The reference wraps the flow in a `ParticleConservingFlowSampler`
# (``particle_conserving_flow.py:373-462``) to present a uniform sampler
# interface; the functional flax API already exposes sample / log_prob /
# estimate_discrete_prob directly, so the wrapper is an alias.
ParticleConservingFlowSampler = ParticleConservingFlow
