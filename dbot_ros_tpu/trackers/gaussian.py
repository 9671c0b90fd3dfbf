"""Gaussian tracker facade + builder (ref D20 GaussianTracker + D21
GaussianTrackerBuilder).

Robust-Gaussian-filter tracker; same user surface as the particle
tracker (initialize/track, model-frame poses, EMA smoothing). Multi-object
scenes run the joint RGF (state (K, 13), joint 12K-dim tangent covariance,
min-over-objects render — mutual occlusion is geometric, exactly like the
particle sensors). ``pixel_stride`` evaluates the update on a sparse pixel
subset (the ICRA-2016 paper's sparse-sensor trick), cutting render and
update cost by the stride factor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu import config as cfg
from dbot_ros_tpu.filters import rgf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.trackers import base
from dbot_ros_tpu.trackers.particle import build_camera, build_meshes
from dbot_ros_tpu.utils.camera import CameraModel, preprocess_depth
from dbot_ros_tpu.utils.mesh import TriangleMesh


class GaussianTracker:
    def __init__(self, config: cfg.GaussianTrackerConfig,
                 mesh: Optional[TriangleMesh] = None,
                 camera: Optional[CameraModel] = None,
                 meshes=None):
        self.config = config
        self.camera = camera if camera is not None else build_camera(
            config.camera)
        if meshes is None:
            meshes = [mesh] if mesh is not None else build_meshes(
                config.object)
        self.meshes = list(meshes)
        self.mesh = self.meshes[0]
        self.num_objects = len(self.meshes)
        self._single = self.num_objects == 1

        obs = config.observation
        self.beam_params = beam.make_beam_params(
            tail_weight=obs.tail_weight, model_sigma=obs.model_sigma,
            sigma_factor=obs.sigma_factor, min_depth=obs.min_depth,
            max_depth=obs.max_depth, exponential_rate=obs.exponential_rate)
        tr = config.transition
        self.trans_params = transition.make_transition_params(
            tr.linear_acceleration_sigma, tr.angular_acceleration_sigma,
            tr.damping)

        # Sparse-pixel sensor subset (static → jit-friendly gathers).
        # pixel_stride <= 0 → auto degrade-to-budget (ref D14 analog,
        # ops/budget.rgf_pixel_stride): keeps the sigma-point raycast
        # bounded as K objects / full-resolution pixels grow.
        stride = int(config.pixel_stride)
        if stride <= 0:
            from dbot_ros_tpu.ops.budget import rgf_pixel_stride
            stride = rgf_pixel_stride(
                self.camera.num_pixels,
                max(m.padded_triangles for m in self.meshes),
                self.num_objects, config.update_iterations)
        stride = max(stride, 1)
        self._pixel_idx = (None if stride == 1 else
                           jnp.arange(0, self.camera.num_pixels, stride))
        rays = (self.camera.rays if self._pixel_idx is None
                else self.camera.rays[self._pixel_idx])
        meshes_ = self.meshes
        single = self._single

        def render_fn(poses):
            # (S, 7) single-object | (S, K, 7) scene → (S, n_sub)
            if single:
                return raycast_depth(meshes_[0], poses, rays)
            depth = None
            for k, m in enumerate(meshes_):
                d = raycast_depth(m, poses[..., k, :], rays)
                depth = d if depth is None else jnp.minimum(depth, d)
            return depth

        self._dt = 1.0 / config.camera.frame_rate
        self._occ_params = (occlusion.make_occlusion_params(
            obs.p_occluded_visible, obs.p_occluded_occluded,
            obs.initial_occlusion_prob)
            if config.occlusion_memory else None)
        self._step = jax.jit(functools.partial(
            rgf.rgf_step, render_fn=render_fn,
            trans_params=self.trans_params, dt=self._dt,
            bp=self.beam_params, iterations=config.update_iterations,
            trust_sigma=config.trust_sigma,
            lin_floor_pos=config.lin_floor_pos,
            lin_floor_rot=config.lin_floor_rot,
            bg_sigma=config.bg_sigma,
            occ_params=self._occ_params))
        self.belief: Optional[rgf.GaussianBelief] = None
        self._smoothed = None
        self._trial = None

    @property
    def centers(self):
        return jnp.stack([m.center for m in self.meshes])

    def _to_center(self, poses_model):
        if self._single:
            return base.to_center_frame(poses_model.reshape(7),
                                        self.mesh.center)
        return base.to_center_frame(
            poses_model.reshape(self.num_objects, 7), self.centers)

    def _make_belief(self, pose_center, first_frame):
        c = self.config
        num_pixels = (self.camera.num_pixels if self._pixel_idx is None
                      else self._pixel_idx.shape[0])
        return rgf.init_belief(
            jax.random.PRNGKey(c.seed), pose_center,
            num_pixels=num_pixels, first_frame=first_frame,
            pos_sigma=c.init_pos_sigma, rot_sigma=c.init_rot_sigma,
            vel_sigma=c.init_vel_sigma,
            background_depth=float(self.beam_params.max_depth),
            initial_occlusion_prob=(
                float(self.config.observation.initial_occlusion_prob)
                if c.occlusion_memory else None))

    def initialize(self, pose_model, first_frame=None, hypotheses=None,
                   hypothesis_logits=None, trial_frames: int = 6,
                   trial_switch_margin: float = 0.1):
        """Set the initial pose(s); optionally race init hypotheses.

        ``hypotheses`` (H, 7) | (H, K, 7) model-frame poses (the
        automatic initializer's refined beams): a Gaussian is unimodal
        by construction, so near-symmetric init twins — which the PF
        resolves with a score-weighted particle mixture — get a short
        MULTI-HYPOTHESIS TRIAL instead: every hypothesis runs its own
        belief for the next ``trial_frames`` frames; the best
        accumulated inlier rate (mean_beta) wins and the rest are
        dropped. Fixes the flip re-lock observed in watchdog recovery
        (EVAL.md occluder/rgf note).
        """
        pose_model = jnp.asarray(pose_model, jnp.float32)
        pose_center = self._to_center(pose_model)
        if first_frame is not None:
            first_frame = preprocess_depth(
                jnp.asarray(first_frame, jnp.float32).reshape(-1))
            if self._pixel_idx is not None:
                first_frame = first_frame[self._pixel_idx]
        self.belief = self._make_belief(pose_center, first_frame)
        self._smoothed = pose_center
        self._trial = None
        if hypotheses is not None:
            hyp = jnp.asarray(hypotheses, jnp.float32)
            if hyp.ndim == 2:
                hyp = hyp[:, None]
            if hyp.shape[0] >= 2:
                order = (list(np.argsort(-np.asarray(hypothesis_logits)))
                         if hypothesis_logits is not None
                         else list(range(hyp.shape[0])))[:4]
                beliefs = [self._make_belief(
                    self._to_center(hyp[i]), first_frame) for i in order]
                self._trial = {"beliefs": beliefs,
                               "scores": [0.0] * len(beliefs),
                               "left": int(trial_frames),
                               "elapsed": 0,
                               "margin": float(trial_switch_margin)}

    def restore(self, belief: rgf.GaussianBelief):
        """Resume from a checkpointed belief (runtime/checkpoint.py).

        A pre-round-4 checkpoint carries no occlusion-memory leaf; with
        occlusion_memory configured on, re-seed it at the initial prior
        rather than silently degrading to the memoryless filter."""
        if belief.occ_prior is None and self._occ_params is not None:
            import dataclasses as _dc
            belief = _dc.replace(belief, occ_prior=jnp.full_like(
                belief.background,
                jnp.float32(self.config.observation.initial_occlusion_prob)))
        self.belief = belief
        self._smoothed = belief.mean[..., :7]
        self._trial = None

    def track(self, depth_image):
        if self.belief is None:
            raise RuntimeError("call initialize(pose) before track()")
        z = preprocess_depth(jnp.asarray(depth_image,
                                         jnp.float32).reshape(-1))
        if self._pixel_idx is not None:
            z = z[self._pixel_idx]
        trial = self._trial
        if trial:
            infos = []
            for i, b in enumerate(trial["beliefs"]):
                b2, info_i = self._step(b, z)
                trial["beliefs"][i] = b2
                trial["scores"][i] += float(info_i.mean_beta)
                infos.append(info_i)
            trial["left"] -= 1
            trial["elapsed"] += 1
            # the init search's full-likelihood argmax (beliefs[0]) is
            # the prior choice; a challenger must win the inlier-rate
            # race DECISIVELY (margin per trial frame) — a slim beta
            # edge routinely favors a well-fitting symmetric flip over
            # a still-converging correct basin (measured: the flip won
            # 0.80-vs-0.73 beta/frame yet the argmax was right)
            best = int(np.argmax(trial["scores"]))
            if best != 0 and (trial["scores"][best] - trial["scores"][0]
                              < trial["margin"] * trial["elapsed"]):
                best = 0
            self.belief = trial["beliefs"][best]
            info = infos[best]
            if trial["left"] <= 0:
                self._trial = None
            # follow the winning hypothesis directly (EMA blending
            # ACROSS hypotheses would average incompatible orientations)
            self._smoothed = self.belief.mean[..., :7]
        else:
            self.belief, info = self._step(self.belief, z)
        new_pose = self.belief.mean[..., :7]
        self._smoothed = base.moving_average_pose(
            self._smoothed, new_pose,
            self.config.moving_average_update_rate)
        if self._single:
            return (base.to_model_frame(self._smoothed, self.mesh.center),
                    info)
        return base.to_model_frame(self._smoothed, self.centers), info
