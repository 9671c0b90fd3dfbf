"""Generic sequential-importance-resampling particle filter.

Replaces ``fl/filter/particle/particle_filter.hpp`` (F8): the vanilla SIR
PF over arbitrary pytree states — kept for parity with the reference
library surface (dbot itself uses the Rao-Blackwellized coordinate variant
in filters/rbcpf.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from dbot_ros_tpu.ops import resample as rs


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SirBelief:
    particles: jax.Array    # (P, ...) or pytree with leading P
    log_weights: jax.Array  # (P,)
    key: jax.Array


def init(key, particles) -> SirBelief:
    p = jax.tree_util.tree_leaves(particles)[0].shape[0]
    return SirBelief(particles=particles,
                     log_weights=jnp.zeros((p,), jnp.float32), key=key)


def step(belief: SirBelief, obs, propagate: Callable, loglik: Callable,
         ess_threshold: float = 0.5) -> SirBelief:
    """One SIR step: propagate → weight → ESS-triggered resample.

    propagate(key, particles) → particles; loglik(particles, obs) → (P,).
    """
    key, k_prop, k_res = jax.random.split(belief.key, 3)
    particles = propagate(k_prop, belief.particles)
    log_w = belief.log_weights + loglik(particles, obs)
    p = log_w.shape[0]
    ess = rs.effective_sample_size(log_w)

    # ESS-triggered resample, cond-free (DESIGN.md anti-pattern #1: a
    # lax.cond over particle-sized operands pays cond-boundary copies
    # every frame): where-select the parent indices and gather
    # unconditionally — identity on no-resample frames.
    do = ess < ess_threshold * p
    idx = jnp.where(do, rs.systematic_indices(k_res, log_w, p),
                    jnp.arange(p, dtype=jnp.int32))
    particles = rs.resample_pytree(particles, idx)
    log_w = jnp.where(do, jnp.zeros_like(log_w), log_w)
    return SirBelief(particles=particles, log_weights=log_w, key=key)


def mean(belief: SirBelief):
    ln, _ = rs.normalize_log_weights(belief.log_weights)
    w = jnp.exp(ln)
    return jax.tree_util.tree_map(
        lambda x: jnp.einsum("p,p...->...", w, x), belief.particles)
