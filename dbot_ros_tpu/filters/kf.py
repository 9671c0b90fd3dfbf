"""Linear Kalman filter (vector-space states).

Replaces ``fl/filter/gaussian/gaussian_filter_linear.hpp`` (F3): the exact
Gaussian filter for linear transition ``x' = A x + B u + w, w~N(0,Q)`` and
linear sensor ``y = H x + v, v~N(0,R)``. Used directly for smoothing /
auxiliary estimation tasks and as the oracle in UKF agreement tests
(fl's KF-vs-UKF consistency suite, SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearBelief:
    mean: jax.Array  # (n,)
    cov: jax.Array   # (n, n)


def predict(belief: LinearBelief, A, Q, B=None, u=None) -> LinearBelief:
    mean = A @ belief.mean
    if B is not None and u is not None:
        mean = mean + B @ u
    cov = A @ belief.cov @ A.T + Q
    return LinearBelief(mean=mean, cov=0.5 * (cov + cov.T))


def update(belief: LinearBelief, y, H, R) -> LinearBelief:
    S = H @ belief.cov @ H.T + R
    K = jnp.linalg.solve(S.T, H @ belief.cov.T).T   # P Hᵀ S⁻¹
    mean = belief.mean + K @ (y - H @ belief.mean)
    n = belief.mean.shape[-1]
    I_KH = jnp.eye(n, dtype=belief.cov.dtype) - K @ H
    # Joseph form for numerical symmetry/PSD.
    cov = I_KH @ belief.cov @ I_KH.T + K @ R @ K.T
    return LinearBelief(mean=mean, cov=0.5 * (cov + cov.T))


def step(belief: LinearBelief, y, A, Q, H, R, B=None, u=None):
    return update(predict(belief, A, Q, B, u), y, H, R)
