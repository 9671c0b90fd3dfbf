"""Occlusion-aware beam model for a single depth pixel.

Replaces ``dbot/model/observation/kinect_pixel_observation_model.h`` (D9) and
the GF-side ``fl::BodyTailObsrvModel`` body component (F6). Densities follow
the measurement model of Wüthrich et al., IROS 2013, §IV-B: a depth return at
a pixel whose predicted object depth is ``d`` comes from

  * the object surface (pixel visible): Gaussian around ``d`` with
    depth-dependent noise ``sigma(d) = model_sigma + sigma_factor * d²``
    (Kinect noise grows ~quadratically with range), truncated to the sensor
    interval ``[z_min, z_max]``;
  * an occluder (pixel occluded): truncated exponential over ``[z_min, d]``
    with rate ``exponential_rate`` — occluding surfaces are a priori closer
    and roughly Poisson along the ray;
  * sensor clutter, either state: uniform over ``[z_min, z_max]`` with
    mixture weight ``tail_weight``;
  * invalid return (NaN): fixed probability mass ``p_invalid`` for an
    occluded pixel and a smaller mass for a visible one (a visible opaque
    surface at moderate range rarely drops out).

All densities are vectorized over arbitrary batch shapes; outputs are linear
densities (f32) to be mixed by the occlusion marginalization in
``models/image_loglik.py`` before the final log.

Reference parameter names (dbot_ros config YAML) are preserved:
``tail_weight``, ``model_sigma``, ``sigma_factor``, ``max_depth``
(→ z_max), ``min_depth`` (→ z_min), ``exponential_rate``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_SQRT2PI = 2.5066282746310002


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BeamParams:
    tail_weight: jax.Array        # clutter mixture weight
    model_sigma: jax.Array        # base depth noise [m]
    sigma_factor: jax.Array       # quadratic range-noise coefficient [1/m]
    min_depth: jax.Array          # sensor minimum range [m]
    max_depth: jax.Array          # sensor maximum range [m]
    exponential_rate: jax.Array   # occluder density rate [1/m]
    p_invalid_occluded: jax.Array  # P(NaN | occluded)
    p_invalid_visible: jax.Array   # P(NaN | visible)
    p_invalid_background: jax.Array  # P(NaN | off-silhouette)


def make_beam_params(tail_weight=0.02, model_sigma=0.003, sigma_factor=0.0014,
                     min_depth=0.4, max_depth=5.0, exponential_rate=1.5,
                     p_invalid_occluded=0.1, p_invalid_visible=0.01,
                     p_invalid_background=0.3) -> BeamParams:
    f = lambda x: jnp.asarray(x, jnp.float32)
    return BeamParams(f(tail_weight), f(model_sigma), f(sigma_factor),
                      f(min_depth), f(max_depth), f(exponential_rate),
                      f(p_invalid_occluded), f(p_invalid_visible),
                      f(p_invalid_background))


def depth_sigma(d, p: BeamParams):
    """Range-dependent measurement noise sigma(d)."""
    return p.model_sigma + p.sigma_factor * d * d


def _norm_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.float32(2.0))))


def density_visible(z, d, p: BeamParams):
    """p(z | predicted depth d, visible), truncated-Gaussian body + tail."""
    sig = depth_sigma(d, p)
    zn = (z - d) / sig
    body = jnp.exp(-0.5 * zn * zn) / (sig * _SQRT2PI)
    # truncation normalizer over [min_depth, max_depth]
    norm = _norm_cdf((p.max_depth - d) / sig) - _norm_cdf((p.min_depth - d) / sig)
    body = body / jnp.maximum(norm, 1e-6)
    tail = 1.0 / (p.max_depth - p.min_depth)
    dens = (1.0 - p.tail_weight) * body + p.tail_weight * tail
    in_range = (z >= p.min_depth) & (z <= p.max_depth)
    return jnp.where(in_range, dens * (1.0 - p.p_invalid_visible), 0.0)


def density_occluded(z, d, p: BeamParams):
    """p(z | predicted depth d, occluded): truncated Exp on [z_min, d] + tail."""
    lam = p.exponential_rate
    d_eff = jnp.clip(d, p.min_depth, p.max_depth)
    span = jnp.maximum(d_eff - p.min_depth, 1e-6)
    # Exp(lam) truncated to [min_depth, d]; lam→0 limit = uniform on span.
    norm = 1.0 - jnp.exp(-lam * span)
    body = lam * jnp.exp(-lam * (z - p.min_depth)) / jnp.maximum(norm, 1e-6)
    tail = 1.0 / (p.max_depth - p.min_depth)
    in_front = (z >= p.min_depth) & (z <= d_eff)
    in_range = (z >= p.min_depth) & (z <= p.max_depth)
    dens = (1.0 - p.tail_weight) * jnp.where(in_front, body, 0.0) \
        + p.tail_weight * jnp.where(in_range, tail, 0.0)
    return dens * (1.0 - p.p_invalid_occluded)


def density_background(z, p: BeamParams):
    """p(z) for off-silhouette pixels: uniform clutter over the range."""
    in_range = (z >= p.min_depth) & (z <= p.max_depth)
    tail = 1.0 / (p.max_depth - p.min_depth)
    return jnp.where(in_range, tail, 0.0) * (1.0 - p.p_invalid_background)


def mass_invalid(p: BeamParams):
    """(P(NaN|occ), P(NaN|vis), P(NaN|background)) point masses."""
    return p.p_invalid_occluded, p.p_invalid_visible, p.p_invalid_background
