"""Body-tail observation model for the robust Gaussian filter.

Replaces ``fl/model/observation/body_tail_observation_model.hpp`` (F6) and
the robustification core of ``robust_gaussian_filter.hpp`` (F5, Issac et
al., ICRA 2016): each depth pixel's measurement density is a mixture of a
Gaussian *body* around the predicted depth and a broad *tail*
(uniform clutter + dropout mass):

    p(y) = (1 - tail_weight) · N(y; m, S) + tail_weight · U(y; z_min, z_max)
    p(invalid) = p_invalid

The robustification quantity is the *body responsibility*

    beta(y) = (1-w_t) N(y; m, S) / p(y)

which the RGF uses to inflate each pixel's effective measurement noise
(R → R/beta): an outlier pixel (beta → 0) contributes nothing, a clean
pixel (beta → 1) gives the standard sigma-point update. This reproduces the
ICRA-2016 behavior — the exact posterior under the body-tail mixture is a
beta-weighted blend of "updated" and "prior" — in a form that vectorizes
over all pixels at once instead of the reference's sequential scalar loop
(SURVEY.md P2).
"""

from __future__ import annotations

import jax.numpy as jnp

from dbot_ros_tpu.models.beam import BeamParams

_SQRT2PI = 2.5066282746310002


def body_responsibility(y, m, S, p: BeamParams, body_weight=1.0):
    """beta(y) per pixel; 0 for invalid returns.

    Args:
      y: observed depths [N] (NaN = invalid).
      m: predicted depth mean [..., N].
      S: predicted depth variance incl. sensor noise [..., N].
      body_weight: prior probability the pixel is explained by the body at
        all (e.g. the silhouette hit probability from the sigma points);
        the complement joins the tail mass.
    """
    valid = jnp.isfinite(y) & (y >= p.min_depth) & (y <= p.max_depth)
    y_safe = jnp.where(valid, y, 1.0)
    sig = jnp.sqrt(jnp.maximum(S, 1e-12))
    zn = (y_safe - m) / sig
    body = jnp.exp(-0.5 * zn * zn) / (sig * _SQRT2PI)
    uniform = 1.0 / (p.max_depth - p.min_depth)
    # Occluder-aware tail: occluding surfaces produce returns *in front of*
    # the prediction (truncated exponential, same shape as the PF beam
    # model's occluded branch, D9) mixed with uniform clutter. This lets
    # high-variance silhouette pixels reject an occluder decisively instead
    # of absorbing it into the body.
    lam = p.exponential_rate
    span = jnp.maximum(jnp.clip(m, p.min_depth, p.max_depth) - p.min_depth,
                       1e-6)
    exp_norm = 1.0 - jnp.exp(-lam * span)
    in_front = (y_safe >= p.min_depth) & (y_safe <= m)
    exp_dens = jnp.where(
        in_front,
        lam * jnp.exp(-lam * (y_safe - p.min_depth))
        / jnp.maximum(exp_norm, 1e-6), 0.0)
    tail = 0.5 * uniform + 0.5 * exp_dens
    w_body = body_weight * (1.0 - p.tail_weight)
    num = w_body * body
    den = num + (1.0 - w_body) * tail
    beta = num / jnp.maximum(den, 1e-30)
    return jnp.where(valid, beta, 0.0)
