"""Particle tracker facade + builder (ref D19 ParticleTracker + D21
ParticleTrackerBuilder).

Host-side stateful wrapper around the jitted RBC-PF step: owns the belief
pytree, the compiled step, moving-average output smoothing, and the
model↔center frame conversions. Everything device-side lives in
filters/rbcpf.py; this class is the user-facing surface a reference user
would reach for (``tracker.initialize(poses); tracker.track(depth)``).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor
from dbot_ros_tpu.trackers import base
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import (CameraModel, default_kinect_camera,
                                       make_camera, preprocess_depth)
from dbot_ros_tpu.utils.mesh import TriangleMesh, load_obj


def build_camera(camera_cfg: cfg.CameraConfig) -> CameraModel:
    if camera_cfg.camera_matrix is None:
        return default_kinect_camera(camera_cfg.downsampling_factor)
    h, w = camera_cfg.resolution
    return make_camera(np.asarray(camera_cfg.camera_matrix, float),
                       h, w, camera_cfg.downsampling_factor)


def build_meshes(object_cfg: cfg.ObjectConfig) -> List[TriangleMesh]:
    return [load_obj(p, center=object_cfg.center_object,
                     scale=object_cfg.scale)
            for p in object_cfg.mesh_paths()]


class ParticleTracker:
    """User-facing particle tracker (one or more rigid objects).

    Build from a config (like the reference's builder), or pass meshes and
    camera directly for programmatic use.
    """

    def __init__(self, config: cfg.ParticleTrackerConfig,
                 meshes: Optional[List[TriangleMesh]] = None,
                 camera: Optional[CameraModel] = None):
        self.config = config
        self.camera = camera if camera is not None else build_camera(
            config.camera)
        self.meshes = meshes if meshes is not None else build_meshes(
            config.object)
        if not self.meshes:
            raise ValueError("particle tracker needs at least one mesh")

        obs = config.observation
        self.beam_params = beam.make_beam_params(
            tail_weight=obs.tail_weight, model_sigma=obs.model_sigma,
            sigma_factor=obs.sigma_factor, min_depth=obs.min_depth,
            max_depth=obs.max_depth, exponential_rate=obs.exponential_rate)
        self.occ_params = occlusion.make_occlusion_params(
            obs.p_occluded_visible, obs.p_occluded_occluded,
            obs.initial_occlusion_prob)
        tr = config.transition
        self.trans_params = transition.make_transition_params(
            tr.linear_acceleration_sigma, tr.angular_acceleration_sigma,
            tr.damping)
        self.sensor = make_rb_sensor(
            self.meshes, self.camera, self.beam_params, self.occ_params,
            frame_rate=config.camera.frame_rate, backend=config.backend,
            **(config.backend_options or {}))

        self._dt = 1.0 / config.camera.frame_rate
        # Donating the belief lets XLA reuse its buffers (the occlusion
        # map alone is ~P·N·4 bytes) instead of allocating fresh ones
        # every frame. dt is a TRACED argument (VERDICT r4 item 3):
        # drop-heavy streams pass the real frame interval — transition
        # noise and the occlusion chain scale with it (ref D7 dt-aware
        # transitions); distinct dt values do not retrace.
        self._step = jax.jit(functools.partial(
            rbcpf.rbcpf_step,
            loglik_fn=self.sensor,
            trans_params=self.trans_params,
            max_kl_divergence=config.max_kl_divergence),
            donate_argnums=(0,))
        self.belief: Optional[rbcpf.ParticleBelief] = None
        self._smoothed = None  # (K, 7) centered-frame smoothed poses
        # Multi-hypothesis trial support for the fused pallas sensor:
        # its candidate pass references the posterior MEAN, which is a
        # ghost pose for a bimodal hypothesis cloud — the likelihood
        # race then resolves on candidate-coverage noise (measured
        # on-chip: a π-flip won a 10k recovery race the exact XLA
        # sensor resolves correctly, session 33). For the first
        # ``_trial_frames`` frames after a ≥2-hypothesis init, track()
        # uses a step whose sensor renders 4 index-strided reference
        # poses (FusedSensor.reference_poses) so every hypothesis
        # block gets honest candidates; then it returns to the fast
        # single-reference step.
        self._step_multi = None
        self._trial_left = 0
        self._trial_frames = 12

    @property
    def centers(self):
        return jnp.stack([m.center for m in self.meshes])  # (K, 3)

    def initialize(self, poses_model, hypotheses=None,
                   hypothesis_logits=None):
        """Set the initial object pose(s), in the original mesh frame.

        Ref: ObjectTracker::initialize + ParticleTracker::on_initialize.

        ``hypotheses`` (H, K, 7) model-frame poses + ``hypothesis_logits``
        (H,): seed the particle cloud as a score-weighted mixture over
        pose hypotheses (the automatic initializer's refined beam) —
        tracking itself then resolves near-symmetric twins by likelihood.
        ``poses_model`` remains the reported pose until evidence arrives.
        """
        poses_model = jnp.asarray(poses_model, jnp.float32)
        if poses_model.ndim == 1:
            poses_model = poses_model[None]
        poses_center = base.to_center_frame(poses_model, self.centers)
        key = jax.random.PRNGKey(self.config.seed)
        self._trial_left = 0
        if hypotheses is not None and np.asarray(hypotheses).shape[0] >= 2 \
                and self.config.backend == "pallas":
            if self._step_multi is None:
                sensor_multi = make_rb_sensor(
                    self.meshes, self.camera, self.beam_params,
                    self.occ_params,
                    frame_rate=self.config.camera.frame_rate,
                    backend="pallas", reference_poses=4,
                    **(self.config.backend_options or {}))
                self._step_multi = jax.jit(functools.partial(
                    rbcpf.rbcpf_step, loglik_fn=sensor_multi,
                    trans_params=self.trans_params,
                    max_kl_divergence=self.config.max_kl_divergence),
                    donate_argnums=(0,))
            self._trial_left = self._trial_frames
        if hypotheses is not None:
            hyp = jnp.asarray(hypotheses, jnp.float32)
            if hyp.ndim == 2:
                hyp = hyp[:, None]           # (H, 7) → (H, 1, 7)
            hyp_center = jax.vmap(
                lambda p: base.to_center_frame(p, self.centers))(hyp)
            self.belief = rbcpf.init_belief(
                key, hyp_center, self.config.evaluation_count,
                self.camera.num_pixels,
                float(self.occ_params.initial_occlusion_prob),
                sensor=self.sensor, hypothesis_logits=hypothesis_logits)
        else:
            self.belief = rbcpf.init_belief(
                key, poses_center, self.config.evaluation_count,
                self.camera.num_pixels,
                float(self.occ_params.initial_occlusion_prob),
                sensor=self.sensor)
        self._smoothed = poses_center

    def restore(self, belief: rbcpf.ParticleBelief):
        """Resume from a checkpointed belief (runtime/checkpoint.py)."""
        from dbot_ros_tpu.ops import resample as rs
        self.belief = belief
        ln, _ = rs.normalize_log_weights(belief.log_weights)
        w = jnp.exp(ln)
        mean = jax.vmap(lambda s: se3.states_mean(s, w),
                        in_axes=1)(belief.states)
        self._smoothed = mean[:, :7]

    def track(self, depth_image, dt=None):
        """One frame → (poses (K, 7) in model frame, StepInfo).

        Ref: ObjectTrackerRos::track → ObjectTracker::track (D18/R5).

        ``dt``: real interval since the previous frame, in seconds
        (default: the configured 1/frame_rate). Pass the true interval
        when frames are dropped — transition noise and the occlusion
        chain propagate by it (ref D7 dt-aware transitions).
        """
        if self.belief is None:
            raise RuntimeError("call initialize(poses) before track()")
        z = preprocess_depth(jnp.asarray(depth_image,
                                         jnp.float32).reshape(-1))
        dt = jnp.float32(self._dt if dt is None else dt)
        if self._trial_left > 0:
            self._trial_left -= 1
            self.belief, info = self._step_multi(self.belief, z, dt=dt)
        else:
            self.belief, info = self._step(self.belief, z, dt=dt)
        new_poses = info.mean_state[:, :7]
        self._smoothed = base.moving_average_pose(
            self._smoothed, new_poses,
            self.config.moving_average_update_rate)
        return base.to_model_frame(self._smoothed, self.centers), info
