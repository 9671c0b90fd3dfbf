"""Standalone probability distributions (ref: fl/distribution/*, F1).

The fl library exposes a small zoo of distributions with Evaluation
(log-density), Sampling, and Moments interfaces; dbot builds its models
from them. Most of that machinery dissolves into jnp expressions in this
framework (beam.py, body_tail.py), but the standalone pieces remain useful
— and are part of the reference's public surface — so they live here as
plain function families: ``<name>_logpdf / <name>_sample / <name>_mean``.

Everything is batched and f32; samplers take explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_SQRT2PI = 0.9189385332046727  # log sqrt(2*pi)


# ------------------------------------------------------------- Gaussian

def gaussian_logpdf(x, mean, cov):
    """Multivariate normal log-density; x, mean [..., D], cov [..., D, D]."""
    d = x - mean
    chol = jnp.linalg.cholesky(cov)
    sol = jax.scipy.linalg.solve_triangular(chol, d[..., None], lower=True)
    maha = jnp.sum(sol[..., 0] ** 2, axis=-1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    k = x.shape[-1]
    return -0.5 * (maha + logdet) - k * _LOG_SQRT2PI


def gaussian_sample(key, mean, cov, shape=()):
    chol = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, tuple(shape) + mean.shape, mean.dtype)
    return mean + jnp.einsum("...ij,...j->...i", chol, eps)


def standard_gaussian_sample(key, dim, shape=()):
    """ref: StandardGaussian — the unit-normal sampler feeding models."""
    return jax.random.normal(key, tuple(shape) + (dim,), jnp.float32)


# --------------------------------------------------- truncated Gaussian

def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.float32(2.0))))


def truncated_gaussian_logpdf(x, mean, sigma, lo, hi):
    """ref: TruncatedGaussian (Evaluation)."""
    z = (x - mean) / sigma
    log_body = -0.5 * z * z - jnp.log(sigma) - _LOG_SQRT2PI
    norm = _norm_cdf((hi - mean) / sigma) - _norm_cdf((lo - mean) / sigma)
    inside = (x >= lo) & (x <= hi)
    return jnp.where(inside, log_body - jnp.log(jnp.maximum(norm, 1e-12)),
                     -jnp.inf)


def truncated_gaussian_sample(key, mean, sigma, lo, hi, shape=()):
    """Inverse-CDF sampling (exact, vectorized)."""
    a = _norm_cdf((lo - mean) / sigma)
    b = _norm_cdf((hi - mean) / sigma)
    u = jax.random.uniform(key, shape, jnp.float32)
    p = a + u * (b - a)
    z = jnp.sqrt(jnp.float32(2.0)) * jax.scipy.special.erfinv(
        2.0 * p - 1.0)
    return jnp.clip(mean + sigma * z, lo, hi)


# ------------------------------------------------------------- uniform

def uniform_logpdf(x, lo, hi):
    inside = (x >= lo) & (x <= hi)
    return jnp.where(inside, -jnp.log(hi - lo), -jnp.inf)


def uniform_sample(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


# --------------------------------------------------------- exponential

def exponential_logpdf(x, rate, lo=0.0, hi=jnp.inf):
    """Optionally truncated exponential (the beam model's occluder prior)."""
    norm = 1.0 - jnp.exp(-rate * (hi - lo)) if hi != jnp.inf else 1.0
    inside = (x >= lo) & (x <= hi)
    return jnp.where(
        inside,
        jnp.log(rate) - rate * (x - lo) - jnp.log(jnp.maximum(norm, 1e-12)),
        -jnp.inf)


def exponential_sample(key, rate, shape=()):
    return jax.random.exponential(key, shape, jnp.float32) / rate


def cauchy_logpdf(x, loc=0.0, scale=1.0):
    """Cauchy log-density (ref: fl heavy-tail option for the body-tail
    observation model, F1/F6)."""
    z = (x - loc) / scale
    return -jnp.log(jnp.pi * scale * (1.0 + z * z))


def cauchy_sample(key, loc=0.0, scale=1.0, shape=()):
    return loc + scale * jax.random.cauchy(key, shape, jnp.float32)


# ------------------------------------------ discrete / particle beliefs

def discrete_entropy(log_w):
    """ref: DiscreteDistribution::entropy (normalized weights)."""
    from dbot_ros_tpu.ops.resample import normalize_log_weights
    ln, _ = normalize_log_weights(log_w)
    w = jnp.exp(ln)
    return -jnp.sum(w * jnp.where(w > 0, ln, 0.0), axis=-1)


def discrete_kl_to_uniform(log_w):
    from dbot_ros_tpu.ops.resample import kl_to_uniform
    return kl_to_uniform(log_w)


def discrete_sample(key, log_w, shape=()):
    """Categorical sampling (ref: DiscreteDistribution sampling)."""
    return jax.random.categorical(key, log_w, shape=tuple(shape))


def sum_of_deltas_moments(particles, log_w):
    """Weighted particle mean/cov in Euclidean coords (ref: SumOfDeltas).

    For SE(3) states use utils/se3.states_mean (manifold-aware) instead.
    """
    from dbot_ros_tpu.ops.resample import normalize_log_weights
    ln, _ = normalize_log_weights(log_w)
    w = jnp.exp(ln)
    mean = jnp.einsum("p,p...->...", w, particles)
    c = particles - mean
    cov = jnp.einsum("p,pi,pj->ij", w, c, c)
    return mean, cov


# ------------------------------------------------- Monte Carlo transform

def monte_carlo_transform(key, fn, mean, cov, num_samples: int = 256):
    """ref: fl MonteCarloTransform (F2): propagate a Gaussian through fn
    by sampling → (mean_y, cov_yy, cov_xy)."""
    x = gaussian_sample(key, mean, cov, (num_samples,))
    y = jax.vmap(fn)(x)
    my = jnp.mean(y, axis=0)
    cy = y - my
    cx = x - mean
    cov_yy = jnp.einsum("pi,pj->ij", cy, cy) / num_samples
    cov_xy = jnp.einsum("pi,pj->ij", cx, cy) / num_samples
    return my, cov_yy, cov_xy
