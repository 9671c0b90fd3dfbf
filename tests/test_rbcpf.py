"""RBC-PF tests: mechanics + synthetic closed-loop tracking (the jitted
analog of the reference's *_tracker_simulation_node integration tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbot_ros_tpu.filters import rbcpf
from dbot_ros_tpu.models import beam, occlusion, transition
from dbot_ros_tpu.models.sensor import make_rb_sensor, render_scene
from dbot_ros_tpu.ops.raycast import raycast_depth
from dbot_ros_tpu.utils import se3
from dbot_ros_tpu.utils.camera import make_camera
from dbot_ros_tpu.utils.mesh import box_mesh


def small_setup(n_particles=128, hw=20):
    K = np.array([[28.0, 0, hw // 2], [0, 28.0, hw // 2], [0, 0, 1.0]])
    cam = make_camera(K, hw, hw)
    mesh = box_mesh(0.08, 0.06, 0.05)
    bp = beam.make_beam_params(model_sigma=0.005, sigma_factor=0.0)
    op = occlusion.make_occlusion_params()
    tp = transition.make_transition_params(
        linear_acceleration_sigma=0.4, angular_acceleration_sigma=1.5,
        damping=8.0)
    sensor = make_rb_sensor(mesh, cam, bp, op, frame_rate=30.0,
                            tri_chunk=128)
    return cam, mesh, bp, op, tp, sensor


def synth_depth(mesh, cam, pose, key=None, sigma=0.003):
    d = raycast_depth(mesh, pose, cam.rays, tri_chunk=128)
    z = jnp.where(jnp.isfinite(d), d, jnp.nan)
    if key is not None:
        z = z + sigma * jax.random.normal(key, z.shape)
    return z


def test_init_belief_shapes():
    cam, mesh, bp, op, tp, sensor = small_setup()
    pose0 = jnp.concatenate([jnp.array([0.0, 0.0, 0.6]),
                             se3.quat_identity()])
    b = rbcpf.init_belief(jax.random.PRNGKey(0), pose0, 64, cam.num_pixels)
    assert b.states.shape == (64, 1, 13)
    assert b.log_weights.shape == (64,)
    assert b.occlusion.shape == (64, cam.num_pixels)


def test_step_runs_jitted_and_shapes():
    cam, mesh, bp, op, tp, sensor = small_setup(64)
    pose0 = jnp.concatenate([jnp.array([0.0, 0.0, 0.6]),
                             se3.quat_identity()])
    b = rbcpf.init_belief(jax.random.PRNGKey(0), pose0, 64, cam.num_pixels)
    z = synth_depth(mesh, cam, pose0)

    step = jax.jit(lambda bel, obs: rbcpf.rbcpf_step(
        bel, obs, sensor, tp, 1.0 / 30.0, max_kl_divergence=1.0))
    b2, info = step(b, z)
    assert b2.states.shape == b.states.shape
    assert info.mean_state.shape == (1, 13)
    assert bool(jnp.isfinite(info.ess))
    assert float(info.ess) > 1.0
    # Weights finite
    assert bool(jnp.all(jnp.isfinite(b2.log_weights)))


def test_likelihood_favours_true_pose():
    cam, mesh, bp, op, tp, sensor = small_setup()
    true_pose = jnp.concatenate([jnp.array([0.01, -0.01, 0.6]),
                                 se3.so3_exp_quat(jnp.array([0.1, 0.2, 0.0]))])
    z = synth_depth(mesh, cam, true_pose)
    # two particles: truth vs 3cm off
    off_pose = true_pose.at[0].add(0.03)
    states = jnp.zeros((2, 1, 13)).at[0, 0, :7].set(true_pose) \
        .at[1, 0, :7].set(off_pose)
    occ = jnp.full((2, cam.num_pixels), 0.1)
    ll, _ = sensor(states, occ, z, 1.0 / 30.0)
    assert float(ll[0]) > float(ll[1])


def test_closed_loop_tracking_static():
    """Static object, noisy depth: posterior mean must stay within 5 mm."""
    cam, mesh, bp, op, tp, sensor = small_setup(128)
    true_pose = jnp.concatenate([jnp.array([0.0, 0.01, 0.55]),
                                 se3.so3_exp_quat(jnp.array([0.0, 0.3, 0.1]))])
    b = rbcpf.init_belief(jax.random.PRNGKey(0), true_pose, 128,
                          cam.num_pixels)
    step = jax.jit(lambda bel, obs: rbcpf.rbcpf_step(
        bel, obs, sensor, tp, 1.0 / 30.0, max_kl_divergence=1.0))
    key = jax.random.PRNGKey(42)
    errs = []
    for t in range(8):
        key, kz = jax.random.split(key)
        z = synth_depth(mesh, cam, true_pose, kz)
        b, info = step(b, z)
        err = jnp.linalg.norm(info.mean_state[0, :3] - true_pose[:3])
        errs.append(float(err))
    assert errs[-1] < 0.005, errs


def test_closed_loop_tracking_moving():
    """Object translating at 6 cm/s: tracker follows within 1.5 cm."""
    cam, mesh, bp, op, tp, sensor = small_setup(256)
    start = jnp.concatenate([jnp.array([-0.02, 0.0, 0.55]),
                             se3.quat_identity()])
    vel = jnp.array([0.06, 0.0, 0.02])
    b = rbcpf.init_belief(jax.random.PRNGKey(1), start, 256, cam.num_pixels)
    step = jax.jit(lambda bel, obs: rbcpf.rbcpf_step(
        bel, obs, sensor, tp, 1.0 / 30.0, max_kl_divergence=1.0))
    key = jax.random.PRNGKey(7)
    dt = 1.0 / 30.0
    errs = []
    for t in range(15):
        pose_t = start.at[:3].add(vel * (t * dt))
        key, kz = jax.random.split(key)
        z = synth_depth(mesh, cam, pose_t, kz)
        b, info = step(b, z)
        errs.append(float(jnp.linalg.norm(
            info.mean_state[0, :3] - pose_t[:3])))
    assert np.mean(errs[5:]) < 0.015, errs


def test_resampling_triggers_on_degenerate_weights():
    cam, mesh, bp, op, tp, sensor = small_setup(64)
    pose0 = jnp.concatenate([jnp.array([0.0, 0.0, 0.6]),
                             se3.quat_identity()])
    b = rbcpf.init_belief(jax.random.PRNGKey(0), pose0, 64, cam.num_pixels)
    # Pre-skew the weights violently: KL >> threshold → must resample.
    b = rbcpf.ParticleBelief(
        states=b.states,
        log_weights=jnp.linspace(0.0, -200.0, 64),
        occlusion=b.occlusion, key=b.key)
    z = synth_depth(mesh, cam, pose0)
    b2, info = rbcpf.rbcpf_step(b, z, sensor, tp, 1.0 / 30.0,
                                max_kl_divergence=0.5)
    assert bool(info.resampled)
    np.testing.assert_allclose(np.asarray(b2.log_weights),
                               np.zeros(64), atol=1e-5)


def test_two_object_blocks():
    cam, mesh, bp, op, tp, _ = small_setup(32)
    mesh2 = box_mesh(0.05, 0.05, 0.05)
    sensor = make_rb_sensor([mesh, mesh2], cam, bp, op, tri_chunk=128)
    poses0 = jnp.stack([
        jnp.concatenate([jnp.array([-0.05, 0.0, 0.6]), se3.quat_identity()]),
        jnp.concatenate([jnp.array([0.06, 0.0, 0.7]), se3.quat_identity()]),
    ])
    b = rbcpf.init_belief(jax.random.PRNGKey(0), poses0, 32, cam.num_pixels)
    assert b.states.shape == (32, 2, 13)
    z = render_scene([mesh, mesh2], poses0[None], cam.rays, 128)[0]
    z = jnp.where(jnp.isfinite(z), z, jnp.nan)
    b2, info = jax.jit(lambda bel, obs: rbcpf.rbcpf_step(
        bel, obs, sensor, tp, 1.0 / 30.0))(b, z)
    assert info.mean_state.shape == (2, 13)
    assert bool(jnp.all(jnp.isfinite(info.mean_state)))
