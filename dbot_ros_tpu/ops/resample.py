"""Particle weight bookkeeping and resampling.

Replaces ``fl/distribution/discrete_distribution.hpp`` (F1: categorical
sampling, entropy/KL utilities — the machinery behind D17's
KL-divergence-triggered resampling) and ``sum_of_deltas.hpp``.

All functions take *log* weights (unnormalized) — the filter works purely in
log space; normalization happens via logsumexp. Systematic resampling is the
sorted-uniform + searchsorted formulation, which XLA lowers to a vectorized
binary search (no host loop), and the same code runs under shard_map with
a psum-based global logsumexp (parallel/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w):
    """Return (normalized log weights, logsumexp) along the last axis."""
    lse = jax.scipy.special.logsumexp(log_w, axis=-1, keepdims=True)
    return log_w - lse, lse[..., 0]


def effective_sample_size(log_w):
    """ESS = 1 / Σ wᵢ² of the normalized weights."""
    ln, _ = normalize_log_weights(log_w)
    return jnp.exp(-jax.scipy.special.logsumexp(2.0 * ln, axis=-1))


def kl_to_uniform(log_w):
    """KL(w ‖ uniform) = Σ wᵢ log wᵢ + log N — the reference's resampling
    trigger (``max_kl_divergence`` in rao_blackwell_coordinate_particle_filter).
    """
    ln, _ = normalize_log_weights(log_w)
    n = log_w.shape[-1]
    w = jnp.exp(ln)
    return jnp.sum(w * jnp.where(w > 0, ln, 0.0), axis=-1) + jnp.log(
        jnp.float32(n))


def systematic_indices(key, log_w, num_samples: int):
    """Systematic (low-variance) resampling → parent indices [num_samples].

    One uniform u; thresholds (i + u)/M against the weight CDF. O(N log N)
    via searchsorted; deterministic given the key; preserves particle order
    (parents come out sorted), which keeps downstream gathers coalesced.
    """
    ln, _ = normalize_log_weights(log_w)
    cdf = jnp.cumsum(jnp.exp(ln), axis=-1)
    u = jax.random.uniform(key, ())
    pos = (jnp.arange(num_samples, dtype=jnp.float32) + u) / num_samples
    idx = jnp.searchsorted(cdf, pos, side="left")
    return jnp.clip(idx, 0, log_w.shape[-1] - 1).astype(jnp.int32)


def multinomial_indices(key, log_w, num_samples: int):
    """IID categorical resampling (reference: DiscreteDistribution sampling)."""
    ln, _ = normalize_log_weights(log_w)
    return jax.random.categorical(key, ln, shape=(num_samples,)).astype(
        jnp.int32)


def resample_pytree(tree, indices):
    """Gather every leaf's leading (particle) axis by ``indices``.

    This single ``jnp.take`` per leaf is what replaces the reference's
    trickiest invariant — the persistent per-particle occlusion arrays on
    the GPU, scattered/gathered by CUDA on every resample
    (cuda_likelihood_evaluator.cu): here the occlusion map is just another
    leaf of the belief pytree.
    """
    return jax.tree_util.tree_map(lambda x: jnp.take(x, indices, axis=0),
                                  tree)
