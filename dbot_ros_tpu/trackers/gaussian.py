"""Gaussian tracker facade + builder (ref D20 GaussianTracker + D21
GaussianTrackerBuilder).

Single-object robust-Gaussian-filter tracker; same user surface as the
particle tracker (initialize/track, model-frame poses, EMA smoothing).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rgf
from dbot_ros_tpu.models import beam, transition
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.trackers import base
from dbot_ros_tpu.trackers.particle import build_camera, build_meshes
from dbot_ros_tpu.utils.camera import CameraModel, preprocess_depth
from dbot_ros_tpu.utils.mesh import TriangleMesh


class GaussianTracker:
    def __init__(self, config: cfg.GaussianTrackerConfig,
                 mesh: Optional[TriangleMesh] = None,
                 camera: Optional[CameraModel] = None):
        self.config = config
        self.camera = camera if camera is not None else build_camera(
            config.camera)
        if mesh is None:
            meshes = build_meshes(config.object)
            if len(meshes) != 1:
                raise ValueError(
                    "GaussianTracker tracks exactly one object "
                    f"(got {len(meshes)} meshes); use ParticleTracker")
            mesh = meshes[0]
        self.mesh = mesh

        obs = config.observation
        self.beam_params = beam.make_beam_params(
            tail_weight=obs.tail_weight, model_sigma=obs.model_sigma,
            sigma_factor=obs.sigma_factor, min_depth=obs.min_depth,
            max_depth=obs.max_depth, exponential_rate=obs.exponential_rate)
        tr = config.transition
        self.trans_params = transition.make_transition_params(
            tr.linear_acceleration_sigma, tr.angular_acceleration_sigma,
            tr.damping)

        rays = self.camera.rays
        mesh_ = self.mesh

        def render_fn(poses):
            return raycast_depth(mesh_, poses, rays)

        self._dt = 1.0 / config.camera.frame_rate
        self._step = jax.jit(functools.partial(
            rgf.rgf_step, render_fn=render_fn,
            trans_params=self.trans_params, dt=self._dt,
            bp=self.beam_params, iterations=config.update_iterations,
            trust_sigma=config.trust_sigma,
            lin_floor_pos=config.lin_floor_pos,
            lin_floor_rot=config.lin_floor_rot,
            bg_sigma=config.bg_sigma))
        self.belief: Optional[rgf.GaussianBelief] = None
        self._smoothed = None

    def initialize(self, pose_model, first_frame=None):
        pose_model = jnp.asarray(pose_model, jnp.float32).reshape(7)
        pose_center = base.to_center_frame(pose_model, self.mesh.center)
        c = self.config
        if first_frame is not None:
            first_frame = preprocess_depth(
                jnp.asarray(first_frame, jnp.float32).reshape(-1))
        self.belief = rgf.init_belief(
            jax.random.PRNGKey(c.seed), pose_center,
            num_pixels=self.camera.num_pixels, first_frame=first_frame,
            pos_sigma=c.init_pos_sigma, rot_sigma=c.init_rot_sigma,
            vel_sigma=c.init_vel_sigma,
            background_depth=float(self.beam_params.max_depth))
        self._smoothed = pose_center

    def restore(self, belief: rgf.GaussianBelief):
        """Resume from a checkpointed belief (runtime/checkpoint.py)."""
        self.belief = belief
        self._smoothed = belief.mean[:7]

    def track(self, depth_image):
        if self.belief is None:
            raise RuntimeError("call initialize(pose) before track()")
        z = preprocess_depth(jnp.asarray(depth_image,
                                         jnp.float32).reshape(-1))
        self.belief, info = self._step(self.belief, z)
        new_pose = self.belief.mean[:7]
        self._smoothed = base.moving_average_pose(
            self._smoothed, new_pose,
            self.config.moving_average_update_rate)
        return base.to_model_frame(self._smoothed, self.mesh.center), info
