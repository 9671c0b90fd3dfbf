"""Fused image log-likelihood with analytic per-pixel occlusion filtering.

Replaces the inner loops of ``KinectImageObservationModelCPU::loglikes``
(D11) and the CUDA kernel in ``cuda_likelihood_evaluator.cu`` (D13): given
per-particle predicted depths and the observed frame, compute each particle's
log-likelihood while recursing the per-pixel occlusion posterior
(Rao-Blackwellization — Wüthrich IROS 2013 §IV).

Per pixel i with propagated occlusion prior ``q`` and predicted depth ``d``:

    on-silhouette (d finite):
        p(z) = (1-q)·p_vis(z|d) + q·p_occ(z|d)
        q'   = q·p_occ(z|d) / p(z)                      (posterior)
    off-silhouette (d = inf):
        p(z) = p_bg(z)          q' = q                   (no information)
    invalid z (NaN): densities replaced by the invalid point masses.

``image_loglik`` is the everything-after-render step; the Pallas kernel in
ops/raycast_pallas.py fuses it with rendering so the P×N depth tensor never
exists in HBM (the structural win over the reference's texture round-trip).
"""

from __future__ import annotations

import jax.numpy as jnp

from dbot_ros_tpu.models import beam as beam_mod
from dbot_ros_tpu.models import occlusion as occ_mod

_TINY = 1e-30


def pixel_likelihoods(depth_pred, z_obs, occ_prior,
                      bp: beam_mod.BeamParams):
    """Per-pixel likelihood + occlusion posterior (all shapes broadcast).

    Args:
      depth_pred: predicted depths, inf = off-silhouette. [..., N]
      z_obs: observed depths, NaN = invalid return. [N] (broadcasts)
      occ_prior: propagated occlusion probabilities. [..., N]
    Returns:
      (p_z, occ_post): per-pixel marginal likelihood and posterior.
    """
    z_valid = jnp.isfinite(z_obs)
    z = jnp.where(z_valid, z_obs, 1.0)  # safe placeholder, masked below
    on_sil = jnp.isfinite(depth_pred)
    d = jnp.where(on_sil, depth_pred, 1.0)

    lik_vis = jnp.where(z_valid, beam_mod.density_visible(z, d, bp),
                        bp.p_invalid_visible)
    lik_occ = jnp.where(z_valid, beam_mod.density_occluded(z, d, bp),
                        bp.p_invalid_occluded)
    lik_bg = jnp.where(z_valid, beam_mod.density_background(z, bp),
                       bp.p_invalid_background)

    p_on = (1.0 - occ_prior) * lik_vis + occ_prior * lik_occ
    p_z = jnp.where(on_sil, p_on, lik_bg)

    occ_post = occ_prior * lik_occ / jnp.maximum(p_on, _TINY)
    occ_post = jnp.where(on_sil, jnp.clip(occ_post, 0.0, 1.0), occ_prior)
    return jnp.maximum(p_z, _TINY), occ_post


def image_loglik(depth_pred, z_obs, occ_prob, bp: beam_mod.BeamParams,
                 op: occ_mod.OcclusionParams, dt_frames=1.0):
    """Log-likelihood per particle + updated occlusion map.

    Args:
      depth_pred: [..., N] rendered depths (inf = miss).
      z_obs: [N] observed frame (NaN = invalid).
      occ_prob: [..., N] occlusion probabilities from the previous frame.
    Returns:
      (loglik [...], occ_post [..., N])
    """
    occ_prior = occ_mod.propagate(occ_prob, op, dt_frames)
    p_z, occ_post = pixel_likelihoods(depth_pred, z_obs, occ_prior, bp)
    return jnp.sum(jnp.log(p_z), axis=-1), occ_post
