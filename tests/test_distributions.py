"""Distribution zoo tests (ref: fl/test/distribution suites)."""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.models import distributions as D


def test_gaussian_logpdf_matches_scipy_form():
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[2.0, 0.3], [0.3, 0.5]])
    x = jnp.array([0.5, -1.5])
    d = np.asarray(x - mean, np.float64)
    c = np.asarray(cov, np.float64)
    expect = (-0.5 * d @ np.linalg.inv(c) @ d
              - 0.5 * np.log(np.linalg.det(c)) - np.log(2 * np.pi))
    np.testing.assert_allclose(float(D.gaussian_logpdf(x, mean, cov)),
                               expect, rtol=1e-5)


def test_gaussian_sample_moments():
    mean = jnp.array([1.0, -1.0])
    cov = jnp.array([[1.0, 0.6], [0.6, 2.0]])
    s = D.gaussian_sample(jax.random.PRNGKey(0), mean, cov, (20000,))
    np.testing.assert_allclose(np.mean(np.asarray(s), 0), mean, atol=0.05)
    np.testing.assert_allclose(np.cov(np.asarray(s).T), cov, atol=0.1)


def test_truncated_gaussian_normalizes_and_samples_in_range():
    xs = jnp.linspace(0.0, 2.0, 4001)
    lp = D.truncated_gaussian_logpdf(xs, 0.8, 0.5, 0.0, 2.0)
    total = jnp.trapezoid(jnp.exp(lp), xs)
    np.testing.assert_allclose(float(total), 1.0, atol=1e-3)
    s = D.truncated_gaussian_sample(jax.random.PRNGKey(1), 0.8, 0.5,
                                    0.0, 2.0, (5000,))
    assert float(jnp.min(s)) >= 0.0 and float(jnp.max(s)) <= 2.0
    # mean of the truncated distribution, not the parent
    numeric_mean = float(jnp.trapezoid(xs * jnp.exp(lp), xs))
    np.testing.assert_allclose(float(jnp.mean(s)), numeric_mean, atol=0.02)


def test_uniform_and_exponential():
    np.testing.assert_allclose(
        float(D.uniform_logpdf(jnp.float32(1.0), 0.0, 4.0)), -np.log(4.0),
        rtol=1e-6)
    assert float(D.uniform_logpdf(jnp.float32(5.0), 0.0, 4.0)) == -np.inf
    s = D.exponential_sample(jax.random.PRNGKey(2), 2.0, (20000,))
    np.testing.assert_allclose(float(jnp.mean(s)), 0.5, atol=0.02)
    xs = jnp.linspace(0.0, 3.0, 3001)
    lp = D.exponential_logpdf(xs, 1.5, 0.0, 3.0)
    np.testing.assert_allclose(float(jnp.trapezoid(jnp.exp(lp), xs)), 1.0,
                               atol=1e-3)


def test_discrete_entropy_and_sampling():
    log_w = jnp.log(jnp.array([0.5, 0.25, 0.25]))
    np.testing.assert_allclose(float(D.discrete_entropy(log_w)),
                               1.5 * np.log(2), rtol=1e-5)
    s = D.discrete_sample(jax.random.PRNGKey(3), log_w, (8000,))
    counts = np.bincount(np.asarray(s), minlength=3) / 8000
    np.testing.assert_allclose(counts, [0.5, 0.25, 0.25], atol=0.03)


def test_sum_of_deltas_moments():
    p = jnp.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0], [2.0, 2.0]])
    mean, cov = D.sum_of_deltas_moments(p, jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(mean), [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), np.eye(2), atol=1e-6)


def test_monte_carlo_transform_linear_function():
    A = jnp.array([[2.0, 0.0], [1.0, 1.0]])
    mean = jnp.array([1.0, 2.0])
    cov = jnp.array([[0.5, 0.1], [0.1, 0.3]])
    my, cyy, cxy = D.monte_carlo_transform(
        jax.random.PRNGKey(4), lambda x: A @ x, mean, cov,
        num_samples=40000)
    np.testing.assert_allclose(np.asarray(my), np.asarray(A @ mean),
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(cyy),
                               np.asarray(A @ cov @ A.T), atol=0.03)
    np.testing.assert_allclose(np.asarray(cxy), np.asarray(cov @ A.T),
                               atol=0.03)


def test_cauchy_logpdf_and_sample():
    from dbot_ros_tpu.models.distributions import (cauchy_logpdf,
                                                   cauchy_sample)
    # standard Cauchy density at 0 is 1/pi; at 1 it's 1/(2*pi)
    np.testing.assert_allclose(np.exp(cauchy_logpdf(0.0)), 1.0 / np.pi,
                               rtol=1e-6)
    np.testing.assert_allclose(np.exp(cauchy_logpdf(1.0)), 1.0 / (2 * np.pi),
                               rtol=1e-6)
    # loc/scale: density integrates to ~1 on a wide grid
    xs = jnp.linspace(-400.0, 400.0, 200001)
    dens = jnp.exp(cauchy_logpdf(xs, loc=2.0, scale=0.5))
    assert 0.98 < float(jnp.trapezoid(dens, xs)) < 1.001
    # sampler: median ≈ loc, IQR ≈ 2*scale (moments don't exist)
    s = cauchy_sample(jax.random.PRNGKey(0), loc=2.0, scale=0.5,
                      shape=(20000,))
    q25, q50, q75 = np.percentile(np.asarray(s), [25, 50, 75])
    np.testing.assert_allclose(q50, 2.0, atol=0.05)
    np.testing.assert_allclose(q75 - q25, 1.0, atol=0.08)
