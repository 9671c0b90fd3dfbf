"""Camera model and immutable camera data snapshots.

Replaces the reference's ``dbot/camera_data.h`` (``CameraData``,
``CameraDataProvider``, ``VirtualCameraDataProvider``): a frozen pytree of the
camera intrinsics + resolution, with precomputed per-pixel unit-free ray
directions so the raycaster never rebuilds ``K^{-1} [u, v, 1]`` per frame.

Depth convention: depth is the z-coordinate in the camera frame (not ray
length), in meters — matching the Kinect/dbot convention where a depth image
pixel stores z.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Pinhole camera: intrinsics + precomputed pixel rays.

    Attributes:
      camera_matrix: (3, 3) float32 intrinsics K (already downsampled).
      rays: (H*W, 3) float32, ray direction per pixel with z = 1 (so that a
        point at depth d along the pixel ray is ``d * rays[i]``).
      height, width: downsampled resolution (static).
    """

    camera_matrix: jax.Array
    rays: jax.Array
    height: int = dataclasses.field(metadata=dict(static=True))
    width: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_pixels(self) -> int:
        return self.height * self.width


def make_camera(camera_matrix, height: int, width: int,
                downsampling: int = 1) -> CameraModel:
    """Build a CameraModel, optionally downsampling the intrinsics.

    Mirrors the reference's downsampling bookkeeping in
    ``RosCameraDataProvider`` / ``CameraData::downsampling_factor``: the
    camera matrix entries fx, fy, cx, cy are divided by the factor and the
    resolution shrinks accordingly.
    """
    K = np.asarray(camera_matrix, np.float64).reshape(3, 3).copy()
    if downsampling != 1:
        K[:2, :] /= float(downsampling)
        height //= downsampling
        width //= downsampling
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    v, u = np.mgrid[0:height, 0:width].astype(np.float64)
    # z=1 rays: x = (u - cx)/fx, y = (v - cy)/fy
    rays = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    return CameraModel(
        camera_matrix=jnp.asarray(K, jnp.float32),
        rays=jnp.asarray(rays.reshape(-1, 3), jnp.float32),
        height=int(height),
        width=int(width),
    )


def default_kinect_camera(downsampling: int = 8) -> CameraModel:
    """Kinect-v1-class VGA intrinsics (the reference's default sensor)."""
    K = np.array([[525.0, 0.0, 319.5],
                  [0.0, 525.0, 239.5],
                  [0.0, 0.0, 1.0]])
    return make_camera(K, 480, 640, downsampling)


def preprocess_depth(depth, invalid_value: float = jnp.nan):
    """Sanitize a raw depth image: nonpositive / NaN / inf → invalid_value.

    The reference does this m↔mm + NaN handling in ``ri::to_eigen`` on the
    host; here it is a jittable array op.
    """
    depth = jnp.asarray(depth, jnp.float32)
    bad = ~jnp.isfinite(depth) | (depth <= 0.0)
    return jnp.where(bad, invalid_value, depth)
