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


def describe(tracker) -> str:
    """Human-readable composition of an assembled tracker.

    The ``fl::Descriptor`` analog (ref F10, ``fl/util/descriptor.hpp``:
    every fl filter pretty-prints its model composition): what got
    built from the config — estimator, sensor backend, models with the
    parameters that matter, scene and camera geometry. Useful in logs
    before long runs and in bug reports.
    """
    from dbot_ros_tpu.trackers.gaussian import GaussianTracker
    from dbot_ros_tpu.trackers.particle import ParticleTracker

    cam = tracker.camera
    meshes = list(getattr(tracker, "meshes", []))
    mesh_str = ", ".join(
        f"{m.num_triangles} tris (pad {m.faces.shape[0]})" for m in meshes)
    bp = tracker.beam_params
    tr = tracker.config.transition
    lines = [
        f"camera: {cam.height}x{cam.width} ({cam.num_pixels} px), "
        f"fx={float(cam.camera_matrix[0, 0]):.1f}",
        f"objects[{len(meshes)}]: {mesh_str}",
        f"beam model: sigma={bp.model_sigma:g} + {bp.sigma_factor:g}/m, "
        f"tail={bp.tail_weight:g}, depth=[{bp.min_depth:g}, "
        f"{bp.max_depth:g}] m",
        f"transition: damped Wiener, sigma_lin="
        f"{tr.linear_acceleration_sigma:g}, sigma_ang="
        f"{tr.angular_acceleration_sigma:g}, damping={tr.damping:g}",
    ]
    if isinstance(tracker, ParticleTracker):
        c = tracker.config
        head = (f"ParticleTracker (RBC-PF): {c.evaluation_count} "
                f"particles, backend={c.backend}, "
                f"max_kl={c.max_kl_divergence:g}")
        op = tracker.occ_params
        lines.insert(3, f"occlusion chain: p_v->o={op.p_occluded_visible:g}"
                        f", p_o->o={op.p_occluded_occluded:g}, "
                        f"init={op.initial_occlusion_prob:g}")
    elif isinstance(tracker, GaussianTracker):
        c = tracker.config
        head = (f"GaussianTracker (robust multi-sensor GF): "
                f"iterations={c.update_iterations}, "
                f"trust_sigma={c.trust_sigma:g}, "
                f"pixel_stride={c.pixel_stride}")
    else:
        head = type(tracker).__name__
    if getattr(tracker.config, "moving_average_update_rate", 1.0) != 1.0:
        lines.append(f"output EMA rate="
                     f"{tracker.config.moving_average_update_rate:g}")
    return "\n".join([head] + ["  " + ln for ln in lines])
