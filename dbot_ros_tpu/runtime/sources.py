"""Depth-frame sources: recorded replay and synthetic simulation.

Replaces the reference's camera plumbing and simulation fixtures:
  * ``RosCameraDataProvider`` (R7) → :class:`ReplaySource` over npz/npy
    depth stacks (the rosbag-replay analog — SURVEY.md §4 system tests);
  * ``VirtualCameraDataProvider`` + the ``*_simulation_node`` ground-truth
    renderers (R3/R4, D6) → :class:`SyntheticSource`, which renders a
    scripted ground-truth trajectory through the production raycaster and
    adds sensor noise/dropout — the closed-loop integration fixture.

Sources iterate (frame_index, depth_image, ground_truth_pose | None).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.ops.raycast import render_depth_image
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import CameraModel
from dbot_ros_tpu.utils.mesh import TriangleMesh


@dataclasses.dataclass
class Frame:
    index: int
    depth: np.ndarray                       # (H, W) float32, NaN = invalid
    ground_truth: Optional[np.ndarray] = None  # (K, 7) model-frame poses


class ReplaySource:
    """Replay a recorded depth sequence from .npz/.npy.

    Accepted layouts:
      * .npz with `depth` (T, H, W) and optional `poses` (T, K, 7);
      * .npy with just the (T, H, W) depth stack.
    Depth in meters, NaN/0/negative = invalid.
    """

    def __init__(self, path: str):
        if str(path).endswith(".npz"):
            data = np.load(path)
            self.depth = np.asarray(data["depth"], np.float32)
            self.poses = (np.asarray(data["poses"], np.float32)
                          if "poses" in data else None)
        else:
            self.depth = np.asarray(np.load(path), np.float32)
            self.poses = None
        if self.depth.ndim != 3:
            raise ValueError(f"depth stack must be (T, H, W), "
                             f"got {self.depth.shape}")

    def __len__(self):
        return self.depth.shape[0]

    def __iter__(self) -> Iterator[Frame]:
        for t in range(len(self)):
            gt = self.poses[t] if self.poses is not None else None
            yield Frame(t, self.depth[t], gt)


def record_npz(path: str, depth_stack, poses=None):
    """Write a replay file (the rosbag-record analog)."""
    arrays = {"depth": np.asarray(depth_stack, np.float32)}
    if poses is not None:
        arrays["poses"] = np.asarray(poses, np.float32)
    np.savez_compressed(path, **arrays)


class OracleSource:
    """Independent-renderer evaluation source (no inverse crime).

    Like :class:`SyntheticSource` but renders through
    ``ops.raycast.raycast_oracle`` — an independently-derived textbook
    Möller–Trumbore path that shares no code with the production
    raycaster/kernels the trackers use — so closed-loop RMSE numbers
    measure the tracker against *external* geometry, the way the
    reference is validated against recorded sequences (SURVEY.md §4
    system tier). Adds the papers' stress protocols:

      * ``occluder`` + ``occluder_fn(t) → (7,)``: an untracked occluder
        mesh rendered in front of the scene (min-combined) — the
        moving-occluder sweep of Wüthrich 2013 / Issac 2016;
      * ``dropout_frames=(a, b)``: ``dropout_prob`` applies only inside
        the frame window — sensor-dropout bursts;
      * ``noise_sigma``: Gaussian depth noise.

    The occluder is NOT part of the ground truth — the tracked objects'
    poses are returned unchanged; the latent occlusion chain has to
    absorb it.
    """

    def __init__(self, meshes, camera: CameraModel, trajectory_fn,
                 num_frames: int, noise_sigma: float = 0.003,
                 background_depth: float = 2.0, seed: int = 0,
                 occluder: TriangleMesh = None, occluder_fn=None,
                 dropout_prob: float = 0.0, dropout_frames=None):
        from dbot_ros_tpu.ops.raycast import raycast_oracle
        from dbot_ros_tpu.trackers.base import to_center_frame

        if isinstance(meshes, TriangleMesh):
            meshes = [meshes]
        self.meshes = list(meshes)
        self.camera = camera
        self.trajectory_fn = trajectory_fn
        self.num_frames = num_frames
        self.key = jax.random.PRNGKey(seed)
        self.occluder = occluder
        self.occluder_fn = occluder_fn
        self.dropout_prob = dropout_prob
        self.dropout_frames = dropout_frames

        def render(poses_model, occ_pose, dropout_p, key):
            depth = None
            for k, mesh in enumerate(self.meshes):
                pc = to_center_frame(poses_model[k], mesh.center)
                d = raycast_oracle(mesh, pc, camera.rays)
                depth = d if depth is None else jnp.minimum(depth, d)
            if occluder is not None:
                d = raycast_oracle(occluder, occ_pose, camera.rays)
                depth = jnp.minimum(depth, d)
            z = jnp.where(jnp.isfinite(depth), depth,
                          jnp.float32(background_depth))
            k1, k2 = jax.random.split(key)
            if noise_sigma > 0:
                z = z + noise_sigma * jax.random.normal(k1, z.shape)
            drop = jax.random.bernoulli(k2, dropout_p, z.shape)
            return jnp.where(drop, jnp.nan, z)

        self._render = jax.jit(render)

    def __len__(self):
        return self.num_frames

    def __iter__(self) -> Iterator[Frame]:
        idq = np.array([1.0, 0, 0, 0], np.float32)
        far = jnp.concatenate(
            [jnp.array([0.0, 0.0, -10.0]), jnp.asarray(idq)])
        for t in range(self.num_frames):
            poses = jnp.asarray(self.trajectory_fn(t), jnp.float32)
            if poses.ndim == 1:
                poses = poses[None]
            occ_pose = (jnp.asarray(self.occluder_fn(t), jnp.float32)
                        if self.occluder_fn is not None else far)
            p_drop = self.dropout_prob
            if self.dropout_frames is not None:
                a, b = self.dropout_frames
                p_drop = p_drop if a <= t < b else 0.0
            self.key, k = jax.random.split(self.key)
            z = self._render(poses, occ_pose, jnp.float32(p_drop), k)
            yield Frame(t, np.asarray(z), np.asarray(poses))


class SyntheticSource:
    """Render a scripted ground-truth trajectory into noisy depth frames.

    trajectory_fn(t: int) → (K, 7) model-frame poses (host-side python).
    """

    def __init__(self, meshes, camera: CameraModel, trajectory_fn,
                 num_frames: int, noise_sigma: float = 0.003,
                 dropout_prob: float = 0.0, background_depth: float = 2.0,
                 seed: int = 0):
        if isinstance(meshes, TriangleMesh):
            meshes = [meshes]
        self.meshes = list(meshes)
        self.camera = camera
        self.trajectory_fn = trajectory_fn
        self.num_frames = num_frames
        self.noise_sigma = noise_sigma
        self.dropout_prob = dropout_prob
        self.background_depth = background_depth
        self.key = jax.random.PRNGKey(seed)

        from dbot_ros_tpu.trackers.base import to_center_frame

        def render(poses_model, key):
            depth = None
            for k, mesh in enumerate(self.meshes):
                pc = to_center_frame(poses_model[k], mesh.center)
                d = render_depth_image(mesh, pc, camera)
                depth = d if depth is None else jnp.minimum(depth, d)
            z = jnp.where(jnp.isfinite(depth), depth,
                          jnp.float32(background_depth))
            k1, k2 = jax.random.split(key)
            if noise_sigma > 0:
                z = z + noise_sigma * jax.random.normal(k1, z.shape)
            if dropout_prob > 0:
                drop = jax.random.bernoulli(k2, dropout_prob, z.shape)
                z = jnp.where(drop, jnp.nan, z)
            return z

        self._render = jax.jit(render)

    def __len__(self):
        return self.num_frames

    def __iter__(self) -> Iterator[Frame]:
        for t in range(self.num_frames):
            poses = jnp.asarray(self.trajectory_fn(t), jnp.float32)
            if poses.ndim == 1:
                poses = poses[None]
            self.key, k = jax.random.split(self.key)
            z = self._render(poses, k)
            yield Frame(t, np.asarray(z), np.asarray(poses))
