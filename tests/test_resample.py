"""Resampling + weight bookkeeping (ref: fl DiscreteDistribution suite)."""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.ops import resample as rs


def test_normalize():
    lw = jnp.log(jnp.array([1.0, 2.0, 3.0, 4.0])) + 7.0
    ln, lse = rs.normalize_log_weights(lw)
    np.testing.assert_allclose(jnp.exp(ln), [0.1, 0.2, 0.3, 0.4], atol=1e-6)
    np.testing.assert_allclose(lse, np.log(10.0) + 7.0, rtol=1e-6)


def test_ess_bounds():
    n = 64
    uniform = jnp.zeros((n,))
    np.testing.assert_allclose(rs.effective_sample_size(uniform), n,
                               rtol=1e-5)
    onehot = jnp.full((n,), -100.0).at[3].set(0.0)
    np.testing.assert_allclose(rs.effective_sample_size(onehot), 1.0,
                               rtol=1e-3)


def test_kl_uniform_zero_and_positive():
    np.testing.assert_allclose(rs.kl_to_uniform(jnp.zeros((32,))), 0.0,
                               atol=1e-6)
    onehot = jnp.full((32,), -1e9).at[0].set(0.0)
    np.testing.assert_allclose(rs.kl_to_uniform(onehot), np.log(32),
                               rtol=1e-4)


def test_systematic_degenerate_weights():
    lw = jnp.full((8,), -1e9).at[5].set(0.0)
    idx = rs.systematic_indices(jax.random.PRNGKey(0), lw, 8)
    np.testing.assert_array_equal(idx, np.full(8, 5))


def test_systematic_counts_proportional():
    w = jnp.array([0.1, 0.4, 0.2, 0.3])
    idx = rs.systematic_indices(jax.random.PRNGKey(1), jnp.log(w), 1000)
    counts = np.bincount(np.asarray(idx), minlength=4) / 1000.0
    # systematic resampling error is < 1/M per category
    np.testing.assert_allclose(counts, np.asarray(w), atol=2e-3)


def test_systematic_indices_sorted():
    w = jax.random.uniform(jax.random.PRNGKey(2), (64,))
    idx = rs.systematic_indices(jax.random.PRNGKey(3), jnp.log(w), 64)
    assert bool(jnp.all(jnp.diff(idx) >= 0))


def test_multinomial_counts():
    w = jnp.array([0.5, 0.25, 0.25])
    idx = rs.multinomial_indices(jax.random.PRNGKey(4), jnp.log(w), 4000)
    counts = np.bincount(np.asarray(idx), minlength=3) / 4000.0
    np.testing.assert_allclose(counts, np.asarray(w), atol=0.03)


def test_resample_pytree_gathers_all_leaves():
    tree = {"a": jnp.arange(6.0), "b": jnp.arange(12.0).reshape(6, 2)}
    idx = jnp.array([5, 0, 0, 3], jnp.int32)
    out = rs.resample_pytree(tree, idx)
    np.testing.assert_array_equal(out["a"], [5, 0, 0, 3])
    np.testing.assert_array_equal(out["b"][0], [10, 11])
    assert out["b"].shape == (4, 2)
