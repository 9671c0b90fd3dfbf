"""Per-pixel occlusion as a 2-state Markov chain, filtered analytically.

Replaces ``dbot/model/observation/occlusion_process_model.h`` (D10): each
pixel carries a latent binary "occluded" flag whose posterior probability is
propagated in closed form (this is the Rao-Blackwellized part of the RBC-PF —
Wüthrich et al., IROS 2013, §IV: the occlusion chain is integrated out
analytically per particle-pixel instead of sampled).

Chain parameters (reference YAML names kept):
  * ``p_occluded_visible``  = p(occluded_t | visible_{t-1})
  * ``p_occluded_occluded`` = p(occluded_t | occluded_{t-1})

The chain mixes geometrically: with stationary probability
``pi = p_ov / (1 - p_oo + p_ov)`` and spectral factor ``g = p_oo - p_ov``,

    p_t = pi + g^t (p_0 - pi)

which gives an exact continuous-dt propagation ``g^dt`` — the closed-form
"propagation over dt" the reference implements by repeated squaring of the
transition matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OcclusionParams:
    """Occlusion chain parameters (per unit frame interval)."""

    p_occluded_visible: jax.Array   # scalar f32
    p_occluded_occluded: jax.Array  # scalar f32
    initial_occlusion_prob: jax.Array  # scalar f32


def make_occlusion_params(p_occluded_visible=0.1,
                          p_occluded_occluded=0.7,
                          initial_occlusion_prob=0.1) -> OcclusionParams:
    f = lambda x: jnp.asarray(x, jnp.float32)
    return OcclusionParams(f(p_occluded_visible), f(p_occluded_occluded),
                           f(initial_occlusion_prob))


def propagate(p_occ, params: OcclusionParams, dt_frames=1.0):
    """Propagate occlusion probabilities over ``dt_frames`` frame intervals.

    Exact for integer steps, smooth geometric interpolation otherwise
    (mirrors the reference's dt-aware ``OcclusionProcessModel::Propagate``).
    """
    pi_num = params.p_occluded_visible
    g = params.p_occluded_occluded - params.p_occluded_visible
    pi_den = 1.0 - g
    pi = pi_num / jnp.maximum(pi_den, 1e-12)
    gdt = jnp.sign(g) * jnp.power(jnp.abs(g), dt_frames)
    return jnp.clip(pi + gdt * (p_occ - pi), 0.0, 1.0)


def stationary(params: OcclusionParams):
    g = params.p_occluded_occluded - params.p_occluded_visible
    return params.p_occluded_visible / jnp.maximum(1.0 - g, 1e-12)
