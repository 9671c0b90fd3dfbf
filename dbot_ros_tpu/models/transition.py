"""Object motion models on SE(3): damped-Wiener pose dynamics.

Replaces the reference's process models (D7/D8):
``dbot/model/state_transition/brownian_object_motion_model.h`` /
``integrated_damped_wiener_process_model.h`` /
``damped_wiener_process_model.h`` and the linear transition built by
``object_transition_model_builder.h`` for the Gaussian tracker.

State: ``(..., 13) = [t(3), q(4), v_lin(3), v_ang(3)]`` (utils/se3).
Dynamics per 3-dof group (translation and so(3) tangent independently):

    v' = a v + xi_v,   a = exp(-damping · dt)      (damped velocity)
    x' = x + v · dt · abar + xi_x,  abar = (1 - a)/(damping · dt) → 1 as damping→0

with integrated-Wiener process noise driven by white acceleration of
standard deviation ``sigma`` (linear_acceleration_sigma /
angular_acceleration_sigma, reference YAML names):

    Cov[xi_v]        = sigma² dt
    Cov[xi_x]        = sigma² dt³/3
    Corr[xi_x, xi_v] = √3/2                   (exact integrated-Wiener coupling)

Rotation applies the tangent displacement via the exp map on the left
(se3.pose_boxplus), diffusing orientation about the object centroid — the
mesh is re-centered at load (utils/mesh), which reproduces the reference's
rotation-about-center behavior (``ObjectModel::center_object``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dbot_ros_tpu.utils import se3

_RHO = 0.8660254037844386  # sqrt(3)/2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TransitionParams:
    linear_acceleration_sigma: jax.Array   # [m/s^1.5] white accel density
    angular_acceleration_sigma: jax.Array  # [rad/s^1.5]
    damping: jax.Array                     # [1/s] velocity damping rate


def make_transition_params(linear_acceleration_sigma=0.02,
                           angular_acceleration_sigma=0.1,
                           damping=4.0) -> TransitionParams:
    f = lambda x: jnp.asarray(x, jnp.float32)
    return TransitionParams(f(linear_acceleration_sigma),
                            f(angular_acceleration_sigma), f(damping))


def _damping_factors(params: TransitionParams, dt):
    gdt = params.damping * dt
    a = jnp.exp(-gdt)
    # (1 - e^-g)/g with series fallback for small g
    abar = jnp.where(gdt > 1e-4, (1.0 - a) / jnp.maximum(gdt, 1e-12),
                     1.0 - 0.5 * gdt)
    return a, abar


def transition_mean(states, dt, params: TransitionParams):
    """Deterministic part of the dynamics (used by the Gaussian filter)."""
    a, abar = _damping_factors(params, dt)
    pose = se3.state_pose(states)
    vel = se3.state_velocity(states)
    disp = jnp.concatenate([vel[..., :3] * (dt * abar),
                            vel[..., 3:6] * (dt * abar)], axis=-1)
    new_pose = se3.pose_boxplus(pose, disp)
    return se3.make_state(new_pose, a * vel)


def sample_transition(key, states, dt, params: TransitionParams):
    """Sample the stochastic transition for a batch of states.

    Args:
      key: PRNG key.
      states: ``[..., 13]``.
      dt: time step in seconds (scalar).
    Returns:
      states' of the same shape.
    """
    mean = transition_mean(states, dt, params)
    batch = states.shape[:-1]
    k1, k2 = jax.random.split(key)
    e1 = jax.random.normal(k1, batch + (6,), states.dtype)  # velocity driver
    e2 = jax.random.normal(k2, batch + (6,), states.dtype)  # extra pos driver

    sig = jnp.concatenate([
        jnp.broadcast_to(params.linear_acceleration_sigma, (3,)),
        jnp.broadcast_to(params.angular_acceleration_sigma, (3,))])
    sd_v = sig * jnp.sqrt(dt)
    sd_x = sig * jnp.sqrt(dt ** 3 / 3.0)

    xi_v = sd_v * e1
    xi_x = sd_x * (_RHO * e1 + jnp.sqrt(1.0 - _RHO * _RHO) * e2)

    pose = se3.pose_boxplus(se3.state_pose(mean), xi_x)
    vel = se3.state_velocity(mean) + xi_v
    return se3.make_state(pose, vel)


def process_noise_cov(dt, params: TransitionParams, dtype=jnp.float32):
    """12×12 tangent-space process covariance, order [dx, dθ, dv, dω].

    Block structure per axis i: the exact integrated-Wiener 2×2
    ``sigma² [[dt³/3, dt²/2], [dt²/2, dt]]`` between position and velocity.
    """
    sl = params.linear_acceleration_sigma ** 2
    sa = params.angular_acceleration_sigma ** 2
    sig2 = jnp.concatenate([jnp.broadcast_to(sl, (3,)),
                            jnp.broadcast_to(sa, (3,))])  # per pose-axis
    qxx = sig2 * dt ** 3 / 3.0
    qxv = sig2 * dt ** 2 / 2.0
    qvv = sig2 * dt
    Q = jnp.zeros((12, 12), dtype)
    idx = jnp.arange(6)
    Q = Q.at[idx, idx].set(qxx)
    Q = Q.at[idx + 6, idx + 6].set(qvv)
    Q = Q.at[idx, idx + 6].set(qxv)
    Q = Q.at[idx + 6, idx].set(qxv)
    return Q
