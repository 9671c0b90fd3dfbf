"""Raycast renderer tests (ref: dbot rigid_body_renderer + gpu rasterizer).

The analytic oracles here are closed-form depths of boxes/planes, validating
both the classic Möller–Trumbore path and the matmul-constant production path
against geometry — then against each other on random poses.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dbot_ros_tpu.ops import raycast
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import make_camera
from dbot_ros_tpu.utils.mesh import box_mesh, icosphere_mesh


def small_camera(h=24, w=32):
    # Principal point exactly on pixel (h//2, w//2) so the center ray is
    # axial (0, 0, 1) and closed-form depths are exact.
    K = np.array([[30.0, 0, w // 2], [0, 30.0, h // 2], [0, 0, 1.0]])
    return make_camera(K, h, w)


def pose_at(z=1.0, x=0.0, y=0.0, rotvec=(0, 0, 0)):
    q = se3.so3_exp_quat(jnp.asarray(rotvec, jnp.float32))
    return jnp.concatenate([jnp.array([x, y, z], jnp.float32), q])


def test_box_front_face_depth():
    """A 0.2m box at z=1: front face must read exactly z=0.9 on-center."""
    mesh = box_mesh(0.2, 0.2, 0.2)
    cam = small_camera()
    depth = raycast.render_depth_image(mesh, pose_at(z=1.0), cam)
    center = depth[cam.height // 2, cam.width // 2]
    np.testing.assert_allclose(center, 0.9, atol=1e-5)
    # Pixels far off-axis miss → inf.
    assert jnp.isinf(depth[0, 0])
    # Some pixels hit.
    assert int(jnp.sum(jnp.isfinite(depth))) > 20


def test_box_rotated_45deg_depth():
    """Box rotated 45° about y: center ray hits the edge-on corner at
    z = 1 − (√2/2)·0.1."""
    mesh = box_mesh(0.2, 0.2, 0.2)
    cam = small_camera()
    depth = raycast.render_depth_image(
        mesh, pose_at(z=1.0, rotvec=(0, np.pi / 4, 0)), cam)
    center = depth[cam.height // 2, cam.width // 2]
    np.testing.assert_allclose(center, 1.0 - np.sqrt(2) / 2 * 0.2, atol=1e-4)


def test_sphere_center_depth():
    mesh = icosphere_mesh(radius=0.05, subdivisions=3)
    cam = small_camera()
    depth = raycast.render_depth_image(mesh, pose_at(z=0.8), cam)
    center = depth[cam.height // 2, cam.width // 2]
    # Icosphere at subdivision 3 approximates r=0.05 within ~0.5%.
    np.testing.assert_allclose(center, 0.75, atol=2e-3)


def test_production_matches_oracle_random_poses():
    mesh = icosphere_mesh(radius=0.06, subdivisions=2)
    cam = small_camera(16, 16)
    key = jax.random.PRNGKey(0)
    kq, kt = jax.random.split(key)
    n = 8
    q = se3.quat_normalize(jax.random.normal(kq, (n, 4)))
    t = jax.random.normal(kt, (n, 3)) * jnp.array([0.1, 0.1, 0.05]) \
        + jnp.array([0.0, 0.0, 0.9])
    poses = jnp.concatenate([t, q], -1)
    prod = raycast.raycast_depth(mesh, poses, cam.rays, tri_chunk=128)
    for i in range(n):
        oracle = raycast.raycast_oracle(mesh, poses[i], cam.rays)
        finite = jnp.isfinite(oracle) & jnp.isfinite(prod[i])
        # same hit mask
        assert bool(jnp.all(jnp.isfinite(oracle) == jnp.isfinite(prod[i])))
        np.testing.assert_allclose(prod[i][finite], oracle[finite], atol=1e-4)


def test_batched_pose_shapes():
    mesh = box_mesh()
    cam = small_camera(8, 8)
    poses = jnp.broadcast_to(pose_at(z=1.0), (4, 3, 7))
    z = raycast.raycast_depth(mesh, poses, cam.rays, tri_chunk=128)
    assert z.shape == (4, 3, cam.num_pixels)


def test_nearest_triangle_wins():
    """Two boxes merged: the nearer surface must be returned (z-min)."""
    import dbot_ros_tpu.utils.mesh as meshlib
    m1 = box_mesh(0.2, 0.2, 0.01, center=False)
    v1 = np.asarray(m1.vertices[: m1.num_vertices])
    f1 = np.asarray(m1.faces[: m1.num_triangles])
    v2 = v1 + np.array([0, 0, 0.3])
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f1 + len(v1)])
    mesh = meshlib.make_mesh(v, f, center=False)
    cam = small_camera()
    depth = raycast.render_depth_image(mesh, pose_at(z=1.0), cam)
    center = depth[cam.height // 2, cam.width // 2]
    np.testing.assert_allclose(center, 1.0 - 0.005, atol=1e-5)


def test_mesh_padding_never_hits():
    mesh = box_mesh(pad_to=256)  # 12 real triangles, 244 padding
    cam = small_camera(8, 8)
    z = raycast.raycast_depth(mesh, pose_at(z=-1.0), cam.rays)
    # Object behind the camera: every pixel must miss.
    assert bool(jnp.all(jnp.isinf(z)))
