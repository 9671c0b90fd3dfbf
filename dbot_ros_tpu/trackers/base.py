"""Tracker facade utilities: output smoothing + frame conventions.

Replaces ``dbot/tracker/object_tracker.cpp`` (D18): the thread-safe facade
collapses to a tiny host-side wrapper around a jitted step; what remains
semantically is (a) the exponential moving-average smoothing of the
*reported* pose (``moving_average_update_rate``) and (b) the
center-of-rotation ↔ model-frame transforms: filters work in the
centered-mesh frame (rotation about the centroid, ref ``center_object``),
while users supply and receive poses in the original mesh frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from dbot_ros_tpu.utils import se3


def to_center_frame(pose_model, center):
    """Model-frame pose → centered-frame pose.

    If x_cam = R x_model + t and the centered mesh is x_c = x_model − c,
    then x_cam = R x_c + (t + R c).
    """
    t = se3.pose_trans(pose_model) + se3.quat_rotate(
        se3.pose_quat(pose_model), jnp.broadcast_to(
            center, pose_model.shape[:-1] + (3,)))
    return se3.make_pose(t, se3.pose_quat(pose_model))


def to_model_frame(pose_center, center):
    """Centered-frame pose → model-frame pose (inverse of above)."""
    t = se3.pose_trans(pose_center) - se3.quat_rotate(
        se3.pose_quat(pose_center), jnp.broadcast_to(
            center, pose_center.shape[:-1] + (3,)))
    return se3.make_pose(t, se3.pose_quat(pose_center))


def moving_average_pose(smoothed, new, rate):
    """EMA on SE(3): position lerp, rotation geodesic step (ref D18).

    rate = 1 → no smoothing (output follows the filter exactly).
    """
    rate = jnp.float32(rate)
    xi = se3.pose_boxminus(new, smoothed)
    return se3.pose_boxplus(smoothed, rate * xi)
